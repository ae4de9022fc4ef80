package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Scale-growth harness for the r14 semi/anti-join shapes (q_tpch_q4,
  * q_tpch_q21): times the registered compositions rebuilt verbatim (the
  * LateR12Growth convention — the registered entries read from a
  * directory; drift is caught by their oracles, not here) over
  * key-offset replicated orders/lineitem at 1×/4×/16×. Each copy
  * offsets the order key by copy × (max + 1), so copies never correlate
  * across themselves: the semi/anti self-joins see pure volume growth
  * with the per-order supplier-group structure intact — the direction
  * that stresses the order-key exchange, which is the only
  * corpus-scale shuffle either plan owns.
  *
  * The replicated inputs are MATERIALIZED (localCheckpoint) before
  * timing: feeding a bare 16-way Union into a semi join triggers
  * Catalyst's join-through-union pushdown — 16 separate SMJs each
  * probing the full replicated right side, a quadratic blow-up that is
  * an artifact of the replication scheme, not of the audited plan (real
  * data arrives as ONE relation; the registered q_tpch_q4 plans a
  * single SMJ). First measured here: un-materialized q4 read 34× wall
  * at 16× rows; materialized it reads as the single-join plan.
  *
  * Run: sbt "Test/runMain graft.ops.TpchAntiGrowth". Results in PERF.md.
  */
object TpchAntiGrowth {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ord = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority",
        "o_orderstatus")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val maxOrd = ord.agg(max("o_orderkey")).head.getLong(0) + 1L
    def ordTimes(n: Int): DataFrame =
      (0 until n).map(c => ord.select(
        (col("o_orderkey") + lit(c * maxOrd)).as("o_orderkey"),
        col("o_orderdate"), col("o_orderpriority"), col("o_orderstatus")))
        .reduce(_ union _)
    def liTimes(n: Int): DataFrame =
      (0 until n).map(c => li.select(
        (col("l_orderkey") + lit(c * maxOrd)).as("l_orderkey"),
        col("l_suppkey"), col("l_shipdate"))).reduce(_ union _)

    def q4(o: DataFrame, l: DataFrame): DataFrame =
      o.filter(col("o_orderdate") >= "1996-07-01" &&
          col("o_orderdate") < "1996-10-01")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(l.select(col("l_orderkey"), col("l_shipdate")),
          col("o_orderkey") === col("l_orderkey") &&
            expr("datediff(CAST(l_shipdate AS DATE), " +
              "CAST(o_orderdate AS DATE)) > 60"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))

    def q21(o: DataFrame, l: DataFrame): DataFrame = {
      val sup = Tables.supplier(spark, sfDir)
        .join(broadcast(Tables.nation(spark, sfDir)
          .filter(col("n_name") === "NATION_1")
          .select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
      val l1 = l
        .join(o.filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(expr("datediff(CAST(l_shipdate AS DATE), " +
          "CAST(o_orderdate AS DATE)) > 60"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .select("l_orderkey", "l_suppkey", "o_orderdate", "s_name")
      val l2 = l.select(col("l_orderkey").as("lo2"),
        col("l_suppkey").as("ls2"))
      val l3 = l.select(col("l_orderkey").as("lo3"),
        col("l_suppkey").as("ls3"), col("l_shipdate").as("lsd3"))
      l1
        .join(l2, col("l_orderkey") === col("lo2") &&
          col("l_suppkey") =!= col("ls2"), "left_semi")
        .join(l3, col("l_orderkey") === col("lo3") &&
          col("l_suppkey") =!= col("ls3") &&
          expr("datediff(CAST(lsd3 AS DATE), " +
            "CAST(o_orderdate AS DATE)) > 60"),
          "left_anti")
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }

    def t(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up (JIT + codegen), untimed
    q4(ordTimes(1), liTimes(1)).queryExecution.toRdd.count()
    q21(ordTimes(1), liTimes(1)).queryExecution.toRdd.count()

    println(f"${"scale"}%-6s ${"li_rows"}%10s ${"q4_s"}%8s ${"q21_s"}%8s")
    for (n <- Seq(1, 4, 16)) {
      val o = ordTimes(n).localCheckpoint(true)
      val l = liTimes(n).localCheckpoint(true)
      val nLi = l.count()
      val t4 = t { q4(o, l).queryExecution.toRdd.count() }
      val t21 = t { q21(o, l).queryExecution.toRdd.count() }
      println(f"${n}%-6d ${nLi}%10d ${t4}%8.3f ${t21}%8.3f")
    }
    spark.stop()
  }
}
