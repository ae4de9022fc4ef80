package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}
import graft.tables.Tables

/** Stage-by-stage floor decomposition for q_ngram_stats (r15 weak-sweep
  * member — 1.45/1.51/1.56 floor-normalized across the three scripted
  * windows, at but not over the decompose threshold; probed anyway so
  * the account is measured, not inferred from the shingle-pass analogy).
  *
  * The registered plan: tokenize (split on whitespace) → per-row
  * adjacent-pair transform → explode → hash aggregate on the bigram
  * string (partial per partition, so only distinct bigrams cross the
  * exchange) → TakeOrderedAndProject(20).
  *
  *   count  — bare documents scan floor
  *   tok    — the lower+trim+split projection alone
  *   big    — tok + the adjacent-pair transform + explode (no agg)
  *   agg    — big + the bigram count aggregate (no cut)
  *   full   — the registered q_ngram_stats
  *
  * Usage: Test/runMain graft.ops.NgramFloorProbe <sfDir> [reps]
  */
object NgramFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = Tables.documents(spark, sfDir)
    def tok = docs.filter(col("text").isNotNull)
      .select(split(trim(lower(col("text"))), "\\s+").as("w"))
      .filter(size(col("w")) >= 2)
    def big = tok.select(explode(expr(
      "transform(sequence(1, size(w) - 1)," +
        " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
      .as("bigram"))
    def agg = big.groupBy("bigram").agg(count(lit(1)).as("cnt"))

    def t(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to reps) {
      acc("count") ::= t { docs.queryExecution.toRdd.count() }
      acc("tok") ::= t { tok.queryExecution.toRdd.count() }
      acc("big") ::= t { big.queryExecution.toRdd.count() }
      acc("agg") ::= t { agg.queryExecution.toRdd.count() }
      acc("full") ::= t {
        SparkEntry.queries("q_ngram_stats")(spark, sfDir)
          .queryExecution.toRdd.count()
      }
    }
    for (name <- Seq("count", "tok", "big", "agg", "full")) {
      val vs = acc(name).sorted
      println(f"PROBE $name%-6s min=${vs.head}%.3f med=${vs(vs.size / 2)}%.3f")
    }
    spark.stop()
  }
}
