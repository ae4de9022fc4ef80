package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** r17 growth harness (VERDICT r16 #4): the 64× octave for the two
  * newest heavy families — q_substr_dedup (its r16 table stopped at 16×,
  * and the hot-gram bound landed this round, so the curve must measure
  * the BOUNDED plan) and q_resample_locf — plus the engineered
  * boilerplate-gram fixture VERDICT r16 #1 demands: ONE 60-token span
  * (license-header shaped) planted at the head of 30% of docs at 16×,
  * timed against the natural 16× fixture. At gram 50 the plant creates
  * 11 gram hashes whose occurrence lists concentrate on 24k docs — the
  * hot key that put 24k structs in one aggregation buffer under the r16
  * collect_list plan and costs the bounded plan a counter + min-struct.
  *
  * Replication: documents id-offset AND per-copy word-prefixed (the
  * ScaleGrowth scheme — disjoint gram spaces across copies, so growth
  * measures VOLUME, not engineered duplication). The boilerplate is
  * planted AFTER replication, identical across copies — that identity
  * IS the hot key.
  *
  * Run: sbt "Test/runMain graft.ops.R17Growth". Results in PERF.md.
  */
object R17Growth {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val maxDoc = docs.agg(max("doc_id")).head.getLong(0) + 1L
    def docsTimes(n: Int): DataFrame =
      (0 until n).map { c =>
        docs.select((col("doc_id") + lit(c * maxDoc)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"c${c}_$$1").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ union _)

    val boiler = (1 to 60).map(i => s"lic$i").mkString(" ")
    def planted(d: DataFrame): DataFrame =
      d.withColumn("text",
        when(col("doc_id") % 10 < 3, concat(lit(boiler + " "), col("text")))
          .otherwise(col("text")))

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

    def t(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      s
    }

    // warm-up (JIT + codegen), untimed
    CorpusQueries.substrDedupOf(docsTimes(1)).queryExecution.toRdd.count()
    EventQueries.resampleLocfOf(evTimes(1)).queryExecution.toRdd.count()

    println(f"${"scale"}%-8s ${"docs"}%7s ${"substr_s"}%9s " +
      f"${"events"}%8s ${"resample_s"}%11s")
    for (n <- Seq(1, 16, 64)) {
      val d = docsTimes(n)
      val nD = d.count()
      val tS = t {
        CorpusQueries.substrDedupOf(d).queryExecution.toRdd.count() }
      val e = evTimes(n)
      val nE = e.count()
      val tR = t {
        EventQueries.resampleLocfOf(e).queryExecution.toRdd.count() }
      println(f"${n}%-8d ${nD}%7d ${tS}%9.3f ${nE}%8d ${tR}%11.3f")
    }
    // the hub-gram dress rehearsal: natural vs 30%-planted at 16× AND
    // 64× (VERDICT r16 #4's "the substr curve read against the
    // hub-gram fixture too")
    for (n <- Seq(16, 64)) {
      val d = docsTimes(n)
      val tNat = t {
        CorpusQueries.substrDedupOf(d).queryExecution.toRdd.count() }
      val dHub = planted(d)
      val nPlanted = dHub.filter(col("text").startsWith(boiler)).count()
      val tHub = t {
        CorpusQueries.substrDedupOf(dHub).queryExecution.toRdd.count() }
      println(f"hub${n}x: natural ${tNat}%.3f s, planted ${tHub}%.3f s " +
        f"(${nPlanted} docs share the boilerplate span; ratio " +
        f"${tHub / tNat}%.2f)")
    }
    spark.stop()
  }
}

/** r17 simjoin growth: q_simjoin_prefix at 1×/4×/16× (born-with-growth
  * convention). Replication id-offsets AND word-prefixes per copy, so
  * shingle spaces are disjoint across copies — the n× corpus is n
  * disjoint 1× similarity problems and the curve measures VOLUME. The
  * brute-force twin is quadratic in any shared-shingle df; the prefix
  * plan's candidate stream is what actually grows — both printed.
  *
  * Run: sbt "Test/runMain graft.ops.R17SimjoinGrowth". Results in PERF.md.
  */
object R17SimjoinGrowth {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val maxDoc = docs.agg(max("doc_id")).head.getLong(0) + 1L
    def docsTimes(n: Int): DataFrame =
      (0 until n).map { c =>
        docs.select((col("doc_id") + lit(c * maxDoc)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"c${c}_$$1").as("text"))
      }.reduce(_ union _)
    def t(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    DedupQueries.simjoinPrefixOf(spark, docsTimes(1))
      .queryExecution.toRdd.count() // warm-up
    println(f"${"scale"}%-6s ${"docs"}%7s ${"pairs"}%7s ${"simjoin_s"}%10s")
    for (n <- Seq(1, 4, 16)) {
      val d = docsTimes(n)
      val nD = d.count()
      var pairs = 0L
      val tS = t { pairs =
        DedupQueries.simjoinPrefixOf(spark, d).queryExecution.toRdd.count() }
      println(f"${n}%-6d ${nD}%7d ${pairs}%7d ${tS}%10.3f")
    }
    spark.stop()
  }
}
