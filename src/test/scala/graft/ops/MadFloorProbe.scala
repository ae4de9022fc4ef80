package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}
import graft.tables.Tables

/** Stage-by-stage floor decomposition for q_anomaly_mad (late-r15
  * addition — 9.0× raw / 3.9× floor-normalized min in its first scripted
  * window, on a 0.146 s twin that sits below the 0.15 s weak cut; probed
  * at birth so the account is measured, not inferred).
  *
  * The registered plan: quantize cents inside the scan → (type, cents)
  * histogram (map-side combined) → two cumulative windows over the
  * bounded histogram picking the lower median → deviation histogram
  * regrouped from the value histogram → same window pair for MAD → one
  * broadcast (med, mad) lookup over a SECOND fact scan + pure-BIGINT
  * gate.
  *
  *   scan   — bare quantized-events scan floor (one fact pass)
  *   hist   — scan + the (type, cents) histogram aggregate
  *   stats  — madStats: hist + both lower-median window passes (med+MAD)
  *   full   — the registered q_anomaly_mad (stats + the gate fact pass)
  *
  * `full − stats − scan` ≈ the gate pass's own cost over its broadcast;
  * `stats − hist` isolates the two tiny-window chains (pure local job
  * floors — the histogram is ≤ types × distinct-cents rows).
  *
  * Usage: Test/runMain graft.ops.MadFloorProbe <sfDir> [reps]
  */
object MadFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def ev = RelationalQueries.anomalyQuantized(Tables.events(spark, sfDir))
    def hist = ev.groupBy(col("event_type"), col("q"))
      .agg(count(lit(1)).as("c"))
    def stats = RelationalQueries.madStats(ev)

    def t(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to reps) {
      acc("scan") ::= t { ev.queryExecution.toRdd.count() }
      acc("hist") ::= t { hist.queryExecution.toRdd.count() }
      acc("stats") ::= t { stats.queryExecution.toRdd.count() }
      acc("full") ::= t {
        SparkEntry.queries("q_anomaly_mad")(spark, sfDir)
          .queryExecution.toRdd.count()
      }
    }
    for (name <- Seq("scan", "hist", "stats", "full")) {
      val vs = acc(name).sorted
      println(f"PROBE $name%-6s min=${vs.head}%.3f med=${vs(vs.size / 2)}%.3f")
    }
    spark.stop()
  }
}
