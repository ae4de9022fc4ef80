package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}

/** Stage decomposition for q_ann_ivfpq_residual (r12). Hypothesis: the
  * interpreted zip_with residual column feeds pqAssign's 32 slice
  * references (4 subspaces × 8 candidates) and CollapseProject inlines
  * it into every call site — higher-order functions never enter
  * whole-stage codegen, so the 64-element lambda re-evaluates ~32× per
  * row. Stages:
  *   assign   — kmeansAssign + probed-cell filter (the scan floor)
  *   residual — + the zip_with residual, materialized once per row
  *   codes    — + pqAssign over the residual (the 32-reference consumer)
  *   full     — the registered query
  *
  * Usage: Test/runMain graft.ops.ResidualServeProbe <sfDir> [reps]
  */
object ResidualServeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val cents = SimilarityQueries.kmeansCentroidsCached(spark, sfDir)
    val resBooks = SimilarityQueries.pqResidualBooksCached(spark, sfDir)
    val queries = graft.tables.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 5).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val probes = queries.map { case (qid, qv) =>
      qid -> cents.map { case (cid, ce) =>
        (SimilarityQueries.dotD(qv, ce) -
          SimilarityQueries.dotD(ce, ce) / 2, cid)
      }.sortBy { case (s, c) => (-s, c) }.take(2).map(_._2).toSeq
    }.toMap
    val allProbed = probes.values.flatten.toSeq.distinct

    def assigned = SimilarityQueries.kmeansAssign(
        graft.tables.Tables.embeddings(spark, sfDir)
          .select("vec_id", "embedding"), cents)
      .filter(col("cent_id").isin(allProbed: _*))
    def withRes = assigned
      .withColumn("residual", SimilarityQueries.residualExpr(cents))

    def t(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    // fan-out + heap applied to a frame whose codes are plain columns
    // (checkpointed outside the timed window) — isolates the fan-out's
    // own cost from any upstream recomputation
    val codesCkpt = SimilarityQueries.pqAssign(withRes, resBooks,
        vecCol = "residual")
      .select("vec_id", "cent_id", "code0", "code1", "code2", "code3")
      .localCheckpoint()
    def cellDot(qv: Array[Float]): org.apache.spark.sql.Column = {
      val table = Array.fill(cents.map(_._1).max.toInt + 1)(Double.NaN)
      cents.foreach { case (cid, ce) =>
        table(cid.toInt) = SimilarityQueries.dotD(qv, ce) }
      element_at(typedLit(table.toSeq), (col("cent_id") + 1).cast("int"))
    }
    def fanout(src: org.apache.spark.sql.DataFrame) = src
      .select(col("vec_id").as("neighbor_id"),
        filter(array(queries.map { case (qid, qv) =>
          when(col("cent_id").isin(probes(qid): _*) &&
              col("vec_id") =!= lit(qid),
            struct(lit(qid).as("q_id"),
              (cellDot(qv) +
                SimilarityQueries.adcScoreExpr(resBooks, qv)).as("score")))
        }: _*), x => x.isNotNull).as("qs"))
      .select(col("neighbor_id"), explode(col("qs")).as("q"))
      .select(col("q.q_id").as("q_id"), col("neighbor_id"),
        col("q.score").as("score"))
      .groupBy("q_id")
      .agg(expr("topk_by(score, neighbor_id, 3)").as("top"))

    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to reps) {
      acc("assign") ::= t { assigned.queryExecution.toRdd.count() }
      acc("residual") ::= t { withRes.queryExecution.toRdd.count() }
      acc("codes") ::= t {
        SimilarityQueries.pqAssign(withRes, resBooks, vecCol = "residual")
          .queryExecution.toRdd.count()
      }
      acc("fanout-ckpt") ::= t {
        fanout(codesCkpt).queryExecution.toRdd.count()
      }
      // composed, but the codes pass through an explicit narrow
      // projection before the fan-out — probing whether the fan-out's
      // 20 code references get the code computation inlined per
      // reference (the suspected duplication) or keep the attributes
      acc("composed-fanout") ::= t {
        fanout(SimilarityQueries.pqAssign(withRes, resBooks,
            vecCol = "residual")
          .select("vec_id", "cent_id", "code0", "code1", "code2", "code3"))
          .queryExecution.toRdd.count()
      }
      acc("full") ::= t {
        SparkEntry.queries("q_ann_ivfpq_residual")(spark, sfDir)
          .queryExecution.toRdd.count()
      }
      // v2: fan out FIRST on a cheap per-query (q_id) array — the array
      // build references only cent_id/vec_id — and compute the score
      // AFTER the Generate, where code0..3 arrive as pass-through
      // attributes. Projections cannot collapse across a Generate, so
      // the code computation is structurally evaluated once per input
      // row no matter how many times the post-Generate score references
      // the codes.
      acc("fanout-first") ::= t {
        val src = SimilarityQueries.pqAssign(withRes, resBooks,
            vecCol = "residual")
          .select("vec_id", "cent_id", "code0", "code1", "code2", "code3")
        val qidArr = filter(array(queries.map { case (qid, _) =>
          when(col("cent_id").isin(probes(qid): _*) &&
              col("vec_id") =!= lit(qid), lit(qid))
        }: _*), x => x.isNotNull)
        val score = queries.foldRight(lit(null).cast("double"): org.apache.spark.sql.Column) {
          case ((qid, qv), els) =>
            when(col("q_id") === lit(qid),
              cellDot(qv) + SimilarityQueries.adcScoreExpr(resBooks, qv))
              .otherwise(els)
        }
        src
          .select(col("vec_id").as("neighbor_id"), col("cent_id"),
            col("code0"), col("code1"), col("code2"), col("code3"),
            explode(qidArr).as("q_id"))
          .select(col("q_id"), col("neighbor_id"), score.as("score"))
          .groupBy("q_id")
          .agg(expr("topk_by(score, neighbor_id, 3)").as("top"))
          .queryExecution.toRdd.count()
      }
    }
    for (name <- Seq("assign", "residual", "codes", "fanout-ckpt",
        "composed-fanout", "full", "fanout-first")) {
      val vs = acc(name).sorted
      println(f"PROBE $name%-8s min=${vs.head}%.3f med=${vs(vs.size / 2)}%.3f")
    }
    spark.stop()
  }
}
