package graft.ops

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Current-round floor decomposition for q_ann_ivf (VERDICT r11 #6: its
  * twin crossed the 0.15 s floor upward, putting the r8 account — "auto-
  * nprobe, one distributed job" — in need of a re-measure rather than a
  * re-cite).
  *
  * The registered plan is ONE distributed job: scan → per-row argmax over
  * 16 broadcast centroid literals (ivfAssigned) → broadcast join with the
  * driver-built probe table → per-candidate dot → bounded topk_by heap
  * (partials → one exchange on q_id → final + posexplode). Stages:
  *   count   — bare embeddings scan floor
  *   assign  — + the per-row 16-centroid argmax (the dominant per-row
  *             arithmetic: 16 vector_dots/row)
  *   full    — the registered query (adds broadcast build, join, score,
  *             heap exchange, explode)
  *
  * Usage: Test/runMain graft.ops.AnnIvfProbe <sfDir> [reps]
  */
object AnnIvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def emb = graft.tables.Tables.embeddings(spark, sfDir)

    def t(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to reps) {
      acc("count") ::= t { emb.queryExecution.toRdd.count() }
      acc("assign") ::= t {
        SimilarityQueries.ivfAssigned(spark, sfDir)
          .queryExecution.toRdd.count()
      }
      acc("full") ::= t {
        SparkEntry.queries("q_ann_ivf")(spark, sfDir)
          .queryExecution.toRdd.count()
      }
    }
    for (name <- Seq("count", "assign", "full")) {
      val vs = acc(name).sorted
      println(f"PROBE $name%-7s min=${vs.head}%.3f med=${vs(vs.size / 2)}%.3f")
    }
    spark.stop()
  }
}
