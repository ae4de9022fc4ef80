package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Scale-growth harness for the r15 derived-partsupp TPC-H shapes
  * (q_tpch_q2 / q_tpch_q9 / q_tpch_q11 / q_tpch_q20): times the
  * registered compositions rebuilt verbatim (the TpchAntiGrowth
  * convention) at 1×/4×/16×, each family grown along its OWN
  * corpus-scale axis:
  *
  *  - Q2/Q11 are partsupp-bound: `part` replicates by partkey offset,
  *    so the derived partsupp (4·|part| rows) and its min-cost /
  *    share-of-total aggregates grow proportionally while the supplier
  *    dim stays fixed — the direction that stresses the partkey
  *    exchange the aggregate+rejoin shares.
  *  - Q9/Q20 are lineitem-bound: orders+lineitem replicate by order-key
  *    offset (partkey/suppkey untouched, so the two-key partsupp join
  *    and the part-family filter see n× probes over the SAME derived
  *    dimension) — the direction that stresses the orderkey fact-fact
  *    shuffle (Q9) and the per-(part, supp) shipped aggregate (Q20).
  *
  * Replicated inputs are MATERIALIZED (localCheckpoint) before timing —
  * the TpchAntiGrowth lesson: a bare n-way Union feeding a join trips
  * Catalyst's join-through-union pushdown into n separate joins, a
  * replication artifact the registered single-relation plans never pay.
  *
  * Run: sbt "Test/runMain graft.ops.TpchPartsuppGrowth". Results in
  * PERF.md.
  */
object TpchPartsuppGrowth {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val part = Tables.part(spark, sfDir)
      .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
    val ord = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderdate")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_shipdate")
    val maxPart = part.agg(max("p_partkey")).head.getLong(0) + 1L
    val maxOrd = ord.agg(max("o_orderkey")).head.getLong(0) + 1L

    def partTimes(n: Int): DataFrame =
      (0 until n).map(c => part.select(
        (col("p_partkey") + lit(c * maxPart)).as("p_partkey"),
        col("p_name"), col("p_brand"), col("p_type"), col("p_size")))
        .reduce(_ union _)
    def ordTimes(n: Int): DataFrame =
      (0 until n).map(c => ord.select(
        (col("o_orderkey") + lit(c * maxOrd)).as("o_orderkey"),
        col("o_orderdate"))).reduce(_ union _)
    def liTimes(n: Int): DataFrame =
      (0 until n).map(c => li.select(
        (col("l_orderkey") + lit(c * maxOrd)).as("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_shipdate")))
        .reduce(_ union _)

    // the registered derivation over an arbitrary part frame
    def psOf(p: DataFrame): DataFrame =
      p.select(col("p_partkey").as("ps_partkey"))
        .crossJoin(broadcast(
          Tables.supplier(spark, sfDir).agg(count(lit(1)).as("s_cnt"))))
        .select(col("ps_partkey"), col("s_cnt"),
          explode(expr("sequence(0L, 3L)")).as("i"))
        .select(col("ps_partkey"),
          expr("(ps_partkey + i * ((s_cnt div 4) + " +
            "((ps_partkey - 1) div s_cnt))) % s_cnt + 1").as("ps_suppkey"))
        .select(col("ps_partkey"), col("ps_suppkey"),
          expr("(ps_partkey * 31 + ps_suppkey * 17) % 100000 + 100")
            .as("ps_supplycost_c"),
          expr("(ps_partkey * 13 + ps_suppkey * 7) % 9999 + 1")
            .as("ps_availqty"))

    val eur = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
        .join(broadcast(Tables.region(spark, sfDir)
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")

    def q2(p: DataFrame): DataFrame = {
      val psEur = psOf(p)
        .join(broadcast(eur), col("ps_suppkey") === col("s_suppkey"))
      val mc = psEur.groupBy(col("ps_partkey").as("mc_partkey"))
        .agg(min(col("ps_supplycost_c")).as("min_cost_c"))
      psEur
        .join(broadcast(p
          .filter(col("p_size") === 15 && col("p_type") === "PROMO")
          .select("p_partkey", "p_brand")),
          col("ps_partkey") === col("p_partkey"))
        .join(mc, col("ps_partkey") === col("mc_partkey") &&
          col("ps_supplycost_c") === col("min_cost_c"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_brand"),
          (col("ps_supplycost_c").cast("double") / 100.0)
            .as("ps_supplycost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }

    def q11(p: DataFrame): DataFrame = {
      val natSup = Tables.supplier(spark, sfDir)
        .join(broadcast(Tables.nation(spark, sfDir)
          .filter(col("n_name") === "NATION_3")
          .select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val natps = psOf(p)
        .join(broadcast(natSup), col("ps_suppkey") === col("s_suppkey"))
        .select(col("ps_partkey"),
          (col("ps_supplycost_c") * col("ps_availqty")).as("v_c"))
      val totalC = natps.agg(sum(col("v_c")).as("t")).scalar()
      val pCnt = p.agg(count(lit(1)).as("c")).scalar()
      natps.groupBy("ps_partkey")
        .agg(sum(col("v_c")).as("sv_c"))
        .filter(col("sv_c") * pCnt > totalC * lit(10L))
        .select(col("ps_partkey"),
          (col("sv_c").cast("double") / 100.0).as("value"))
    }

    val bolts = part.filter(col("p_name").like("%bolt%"))
      .select("p_partkey")
    val ps1 = psOf(part)

    def q9(l: DataFrame, o: DataFrame): DataFrame = {
      val lf = l
        .join(broadcast(bolts), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          expr("CAST(floor(CAST(l_extendedprice AS DOUBLE) * " +
            "(1.0 - CAST(l_discount AS DOUBLE)) * 100) AS BIGINT)")
            .as("rev_c"),
          col("l_quantity").cast("long").as("qty"))
      val ps = ps1
        .join(broadcast(bolts.select(col("p_partkey").as("bp"))),
          col("ps_partkey") === col("bp"))
        .select("ps_partkey", "ps_suppkey", "ps_supplycost_c")
      lf.join(ps, col("l_partkey") === col("ps_partkey") &&
          col("l_suppkey") === col("ps_suppkey"))
        .join(broadcast(Tables.supplier(spark, sfDir)
          .select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.nation(spark, sfDir)
          .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg((sum(col("rev_c") - col("ps_supplycost_c") * col("qty"))
          .cast("double") / 100.0).as("sum_profit"))
    }

    def q20(l: DataFrame): DataFrame = {
      val shipped = l
        .filter(col("l_shipdate") >= "1997-01-01" &&
          col("l_shipdate") < "1998-01-01")
        .join(broadcast(bolts), col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("l_quantity").cast("long")).as("sq"))
      val excess = ps1
        .join(broadcast(bolts.select(col("p_partkey").as("bp"))),
          col("ps_partkey") === col("bp"))
        .join(shipped, col("ps_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey"))
        .filter(col("ps_availqty") * 2 > col("sq"))
        .select("ps_suppkey")
      Tables.supplier(spark, sfDir)
        .join(broadcast(Tables.nation(spark, sfDir)
          .filter(col("n_name").isin("NATION_2", "NATION_7", "NATION_12"))
          .select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .join(excess, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    }

    def t(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up (JIT + codegen), untimed
    q2(partTimes(1)).queryExecution.toRdd.count()
    q11(partTimes(1)).queryExecution.toRdd.count()
    q9(liTimes(1), ordTimes(1)).queryExecution.toRdd.count()
    q20(liTimes(1)).queryExecution.toRdd.count()

    println(f"${"scale"}%-6s ${"parts"}%9s ${"li_rows"}%10s " +
      f"${"q2_s"}%8s ${"q11_s"}%8s ${"q9_s"}%8s ${"q20_s"}%8s")
    for (n <- Seq(1, 4, 16)) {
      val p = partTimes(n).localCheckpoint(true)
      val o = ordTimes(n).localCheckpoint(true)
      val l = liTimes(n).localCheckpoint(true)
      val nP = p.count(); val nL = l.count()
      val t2 = t { q2(p).queryExecution.toRdd.count() }
      val t11 = t { q11(p).queryExecution.toRdd.count() }
      val t9 = t { q9(l, o).queryExecution.toRdd.count() }
      val t20 = t { q20(l).queryExecution.toRdd.count() }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      println(f"${n}%-6d ${nP}%9d ${nL}%10d ${t2}%8.3f ${t11}%8.3f " +
        f"${t9}%8.3f ${t20}%8.3f")
    }
    spark.stop()
  }
}
