package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** r18 growth harness (VERDICT r17 #3): the 64× octave for the two
  * dieted exact-join operators — q_simjoin_prefix (its r17 table stopped
  * at 16×, and the predicate-dedup + positional-filter diet landed this
  * round, so the curve must measure the DIETED plan) and q_lsh_recall
  * (which had no growth harness at all despite being r17's slowest
  * query). Replication id-offsets AND word-prefixes per copy (the
  * ScaleGrowth scheme — disjoint shingle spaces across copies, so the n×
  * corpus is n disjoint similarity problems and the curve measures
  * VOLUME, not engineered duplication). Candidate/pair counts printed
  * next to wall so super-linear candidate growth cannot hide.
  *
  * Run: sbt "Test/runMain graft.ops.R18Growth". Results in PERF.md.
  */
object R18Growth {
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
    def t(body: => Long): (Double, Long) = {
      System.gc()
      val t0 = System.nanoTime()
      val n = body
      val s = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      (s, n)
    }
    // warm-up (JIT + codegen), untimed
    DedupQueries.simjoinPrefixOf(spark, docsTimes(1))
      .queryExecution.toRdd.count()
    DedupQueries.lshRecallOf(spark, docsTimes(1))
      .queryExecution.toRdd.count()
    println(f"${"scale"}%-6s ${"docs"}%8s ${"pairs"}%8s ${"simjoin_s"}%10s " +
      f"${"recall_s"}%9s")
    // 32× brackets the broadcast→SMJ regime transition AQE makes between
    // 16× and 64× (the array lookups broadcast while small): the claim
    // is linear-in-candidates INSIDE each regime, and candidates/pairs
    // are printed so super-linear candidate growth cannot hide
    for (n <- Seq(1, 16, 32, 64)) {
      val d = docsTimes(n)
      val nD = d.count()
      val (tS, pairs) = t {
        DedupQueries.simjoinPrefixOf(spark, d).queryExecution.toRdd.count() }
      val (tR, _) = t {
        DedupQueries.lshRecallOf(spark, d).queryExecution.toRdd.count() }
      println(f"${n}%-6d ${nD}%8d ${pairs}%8d ${tS}%10.3f ${tR}%9.3f")
    }
    spark.stop()
  }
}
