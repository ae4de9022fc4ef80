package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** One-window adjudication for the r18 substr hot-gram routing (VERDICT
  * r17 #4): cross-run ambient on this host drifts up to 1.7× (the
  * untouched resample control read 33.8 / 44.9 / 75.8 s across three
  * r18 growth runs), so the salt decision must come from ONE
  * interleaved JVM. Arms, all at 64× (hub scale), natural AND planted
  * boilerplate corpus:
  *   - r17: the exact r17 plan (single exchange, no hot branch) inlined
  *     here as the baseline;
  *   - hyb: the shipped hybrid (threshold 50k — the planted grams'
  *     n_occ is 96k at 64×, so the salted path fires on `planted` and
  *     stays pruned on `natural`).
  * Plus the sf0.1 bench corpus (1×) for the clean-corpus overhead of
  * the hot-discovery pass. min-of-reps per arm, arms interleaved so
  * ambient drift hits all of them equally.
  *
  * Run: sbt "Test/runMain graft.ops.R18SubstrHub". Results in PERF.md.
  */
object R18SubstrHub {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
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
    val boiler = (1 to 60).map(i => s"lic$i").mkString(" ")
    def planted(d: DataFrame): DataFrame =
      d.withColumn("text",
        when(col("doc_id") % 10 < 3, concat(lit(boiler + " "), col("text")))
          .otherwise(col("text")))

    /** the r17 plan, inlined verbatim (single gh exchange, no routing) */
    def r17Of(d: DataFrame, gram: Int = 50): DataFrame = {
      val toks = CorpusQueries.substrToks(d, gram)
      val occ = CorpusQueries.substrOcc(toks)
        .filter(col("doc_id").isNotNull).repartition(col("gh"))
      val wins = occ.groupBy("gh")
        .agg(min(struct(col("doc_id"), col("s"))).as("win"),
          count(lit(1)).as("n_occ"))
        .filter(col("n_occ") >= 2)
        .select(col("gh"), col("win"))
      val kills = occ.join(wins, Seq("gh"))
        .filter(struct(col("doc_id"), col("s")) =!= col("win"))
        .select(col("doc_id"), col("s"))
      CorpusQueries.substrReassemble(toks, kills, gram)
    }

    def t(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    val d64 = docsTimes(64)
    val d64p = planted(d64)
    // warm-up both shapes
    r17Of(docs).queryExecution.toRdd.count()
    CorpusQueries.substrDedupOf(docs).queryExecution.toRdd.count()

    val arms = Seq(
      ("r17 nat64", () => r17Of(d64)),
      ("hyb nat64", () => CorpusQueries.substrDedupOf(d64)),
      ("r17 hub64", () => r17Of(d64p)),
      ("hyb hub64", () => CorpusQueries.substrDedupOf(d64p)),
      ("r17 sf0.1", () => r17Of(docs)),
      ("hyb sf0.1", () => CorpusQueries.substrDedupOf(docs)))
    val mins = scala.collection.mutable.Map[String, Double]()
    for (r <- 1 to reps; (name, mk) <- arms) {
      val s = t { mk().queryExecution.toRdd.count() }
      mins(name) = math.min(mins.getOrElse(name, Double.MaxValue), s)
      println(f"rep $r $name%-10s $s%8.3f s (load ${
        java.lang.management.ManagementFactory.getOperatingSystemMXBean
          .getSystemLoadAverage}%.2f)")
    }
    println("== mins ==")
    for ((name, _) <- arms) println(f"$name%-10s ${mins(name)}%8.3f s")
    println(f"hub straggler ratio: r17 ${mins("r17 hub64") / mins("r17 nat64")}%.2f, " +
      f"hyb ${mins("hyb hub64") / mins("hyb nat64")}%.2f")
    spark.stop()
  }
}
