package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}

/** Does the fanout-first lesson from q_ann_ivfpq_residual (r12,
  * ResidualServeProbe) transfer to the RAW-PQ searches? Their fan-outs
  * carry adcScoreExpr inside the array build too, so the code derivation
  * inlines per reference — but unlike the residual chain it is pure
  * codegen'd vector_dot work, so the duplication may be absorbed by
  * codegen subexpression elimination (or not, if the HOF projection
  * runs interpreted). Measured, not argued.
  *
  * Usage: Test/runMain graft.ops.AnnPqShapeProbe <sfDir> [reps]
  */
object AnnPqShapeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val books = SimilarityQueries.pqCodebooksCached(spark, sfDir)
    val queries = graft.tables.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 5).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

    def t(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    def fanoutFirst() = {
      val codes = SimilarityQueries.pqAssign(
          graft.tables.Tables.embeddings(spark, sfDir)
            .select("vec_id", "embedding"), books)
        .select("vec_id", "code0", "code1", "code2", "code3")
      val qidArr = filter(array(queries.map { case (qid, _) =>
        when(col("vec_id") =!= lit(qid), lit(qid))
      }: _*), x => x.isNotNull)
      val score = queries.foldRight(lit(null).cast("double"): Column) {
        case ((qid, qv), els) =>
          when(col("q_id") === lit(qid),
            SimilarityQueries.adcScoreExpr(books, qv)).otherwise(els)
      }
      codes
        .select(col("vec_id").as("neighbor_id"),
          col("code0"), col("code1"), col("code2"), col("code3"),
          explode(qidArr).as("q_id"))
        .select(col("q_id"), col("neighbor_id"), score.as("score"))
        .groupBy("q_id")
        .agg(expr("topk_by(score, neighbor_id, 3)").as("top"))
    }

    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to reps) {
      acc("registered") ::= t {
        SparkEntry.queries("q_ann_pq")(spark, sfDir)
          .queryExecution.toRdd.count()
      }
      acc("fanout-first") ::= t {
        fanoutFirst().queryExecution.toRdd.count()
      }
    }
    for (name <- Seq("registered", "fanout-first")) {
      val vs = acc(name).sorted
      println(f"PROBE $name%-12s min=${vs.head}%.3f med=${vs(vs.size / 2)}%.3f")
    }
    spark.stop()
  }
}
