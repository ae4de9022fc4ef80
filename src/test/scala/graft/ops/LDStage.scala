package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q_line_dedup stage decomposition + old-vs-fused A/B (r10): the old
  * registered shape joined the synthetic 5-word groups into one
  * document-sized string only for lineDedup to re-split it; the fused
  * shape feeds lineDedupFromLines directly. Interleaved one-JVM.
  * Measured (sf0.1, min/med of 7): old 0.750/0.818, fused 0.730/0.779 —
  * only ~3-5%: the standalone stage decomposition suggested ~0.17 s of
  * string churn, but whole-stage codegen already pipelines the join +
  * re-split inside the scan stage, so the fusion's end-to-end win is
  * marginal. Kept anyway: not slower, and lineDedupFromLines is a real
  * API for corpora whose lines arrive pre-split.
  * Run: sbt "Test/runMain graft.ops.LDStage [sfDir] [reps]"
  */
object LDStage {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 7
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def base = graft.tables.Tables.documents(spark, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
    def old = CorpusQueries.lineDedup(base
      .select(col("doc_id"), concat_ws("\n", expr(
        "transform(sequence(0, CAST(ceil(size(w) / 5.0) AS INT) - 1)," +
          " i -> concat(concat_ws(' ', slice(w, i * 5 + 1, 5)), '.'))"))
        .as("text")))
    def fused = graft.SparkEntry.queries("q_line_dedup")(spark, d)
    def t(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to reps) {
      acc("old") ::= t { old.queryExecution.toRdd.count() }
      acc("fused") ::= t { fused.queryExecution.toRdd.count() }
    }
    for (n <- Seq("old", "fused")) {
      val vs = acc(n).sorted
      println(f"PROBE $n%-6s min=${vs.head}%.3f med=${vs(vs.size / 2)}%.3f")
    }
    spark.stop()
  }
}
