package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Scale-growth harness for the closing-r15 operators: times the
  * REGISTERED builders (EventQueries.cdcMergeOf/concurrencyPeakOf,
  * TextQueries.skylineOf, DedupQueries.triangleStatsOf over lshPairsOf —
  * the same code the registered queries execute) over replicated inputs
  * at 1×/4×/16×.
  *
  * Replication: events id-offset per copy (the EventGrowth scheme —
  * copies never group across themselves); documents id-offset AND
  * per-copy word-prefixed (the ScaleGrowth scheme — disjoint shingle
  * spaces, so the candidate graph at n× is n disjoint copies of the 1×
  * graph and triangle growth measures volume, not engineered bucket
  * skew). Expectations: cdc (one fold exchange) and concurrency (delta
  * collapse + day windows) near-linear; skyline near-linear with a
  * CONSTANT frontier stage (the collapse table is bounded by the value
  * domain, which replication does not grow); triangles near-linear in
  * edges (wedge work is per-source-bounded by the degree orientation).
  *
  * Run: sbt "Test/runMain graft.ops.R15cGrowth". Results in PERF.md.
  */
object R15cGrowth {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val ev = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "event_type", "ts", "value")
    val maxUser = ev.agg(max("user_id")).head.getLong(0) + 1L
    val maxEvent = ev.agg(max("event_id")).head.getLong(0) + 1L
    def evTimes(n: Int): DataFrame =
      (0 until n).map { c =>
        ev.select((col("user_id") + lit(c * maxUser)).as("user_id"),
          (col("event_id") + lit(c * maxEvent)).as("event_id"),
          col("event_type"), col("ts"), col("value"))
      }.reduce(_ union _)

    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val maxDoc = docs.agg(max("doc_id")).head.getLong(0) + 1L
    def docsTimes(n: Int): DataFrame =
      (0 until n).map { c =>
        docs.select((col("doc_id") + lit(c * maxDoc)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"c${c}_$$1").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ union _)

    def t(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      s
    }

    // interval-join replication must offset TIME, not ids: copies at the
    // same instants genuinely overlap each other (the op is keyless), so
    // id-offset copies would measure the real n² cross-copy output, not
    // volume growth; +35 days per copy keeps copies disjoint in time
    def evTimesShifted(n: Int): DataFrame =
      (0 until n).map { c =>
        ev.select((col("user_id") + lit(c * maxUser)).as("user_id"),
          (col("event_id") + lit(c * maxEvent)).as("event_id"),
          col("event_type"),
          (col("ts") + expr(s"INTERVAL ${c * 35} DAYS")).as("ts"),
          col("value"))
      }.reduce(_ union _)

    def sketchOf(e: DataFrame): DataFrame = e
      .groupBy(col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000")
          .as("day_idx"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_users"))

    // warm-up (JIT + codegen), untimed
    EventQueries.cdcMergeOf(evTimes(1)).queryExecution.toRdd.count()
    EventQueries.concurrencyPeakOf(evTimes(1)).queryExecution.toRdd.count()
    EventQueries.pitJoinOf(evTimes(1)).queryExecution.toRdd.count()
    EventQueries.intervalJoinOf(evTimesShifted(1))
      .queryExecution.toRdd.count()
    sketchOf(evTimes(1)).queryExecution.toRdd.count()
    TextQueries.skylineOf(docsTimes(1)).queryExecution.toRdd.count()
    CorpusQueries.ppsSampleOf(docsTimes(1)).queryExecution.toRdd.count()
    DedupQueries.triangleStatsOf(DedupQueries.lshPairsOf(docsTimes(1)))
      .queryExecution.toRdd.count()
    DedupQueries.pageRankOf(DedupQueries.lshPairsOf(docsTimes(1)))
      .queryExecution.toRdd.count()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))

    println(f"${"scale"}%-6s ${"events"}%9s ${"cdc_s"}%7s ${"conc_s"}%7s " +
      f"${"pit_s"}%7s ${"ivj_s"}%7s ${"sketch_s"}%9s " +
      f"${"docs"}%7s ${"skyline_s"}%10s ${"pps_s"}%7s " +
      f"${"triangle_s"}%11s ${"pagerank_s"}%11s")
    for (n <- Seq(1, 4, 16)) {
      val e = evTimes(n)
      val nEv = e.count()
      val tC = t { EventQueries.cdcMergeOf(e).queryExecution.toRdd.count() }
      val tP = t {
        EventQueries.concurrencyPeakOf(e).queryExecution.toRdd.count()
      }
      val tJ = t { EventQueries.pitJoinOf(e).queryExecution.toRdd.count() }
      val eSh = evTimesShifted(n)
      val tV = t {
        EventQueries.intervalJoinOf(eSh).queryExecution.toRdd.count()
      }
      val tK = t { sketchOf(e).queryExecution.toRdd.count() }
      val d = docsTimes(n)
      val nD = d.count()
      val tS = t { TextQueries.skylineOf(d).queryExecution.toRdd.count() }
      val tW = t { CorpusQueries.ppsSampleOf(d).queryExecution.toRdd.count() }
      val tT = t {
        DedupQueries.triangleStatsOf(DedupQueries.lshPairsOf(d))
          .queryExecution.toRdd.count()
      }
      val tR = t {
        DedupQueries.pageRankOf(DedupQueries.lshPairsOf(d))
          .queryExecution.toRdd.count()
      }
      println(f"${n}%-6d ${nEv}%9d ${tC}%7.3f ${tP}%7.3f " +
        f"${tJ}%7.3f ${tV}%7.3f ${tK}%9.3f " +
        f"${nD}%7d ${tS}%10.3f ${tW}%7.3f ${tT}%11.3f ${tR}%11.3f")
    }
    spark.stop()
  }
}
