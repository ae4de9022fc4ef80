package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Scale-growth harness for the late-r12 operators (test scope — a
  * measurement main, not library surface): replicates the sf0.1 inputs
  * 1x/4x/16x and times
  *
  *  - the q_ann_hamming pipeline (sign-bit pack + xor/popcount scoring +
  *    bounded topk heap) over an id-offset replicated `embeddings` table
  *    — the codes-only corpus pass whose cost should grow linearly in
  *    rows (8 B of code per row is the whole per-row state);
  *  - the q_tpch_q5 join composition over key-offset replicated
  *    customer/orders/lineitem (copies join only within themselves, so
  *    the experiment measures pure volume growth of the 6-table plan,
  *    not engineered key skew).
  *
  * The plans are rebuilt here verbatim from the registered queries'
  * shapes (the registered entries read from a directory; the harness
  * needs DataFrame inputs) — any drift between the two is caught by the
  * registered queries' own oracles, not by this harness.
  *
  * Run: sbt "Test/runMain graft.ops.LateR12Growth". Results in PERF.md.
  */
object LateR12Growth {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    // ---- hamming over replicated embeddings -------------------------
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val maxVec = emb.agg(max("vec_id")).head.getLong(0) + 1L
    def embTimes(n: Int): DataFrame =
      (0 until n).map { c =>
        emb.select((col("vec_id") + lit(c * maxVec)).as("vec_id"),
          col("embedding"))
      }.reduce(_ union _)

    def hamming(e: DataFrame): DataFrame = {
      def half(lo: Int) = expr(
        s"aggregate(sequence($lo, ${lo + 31}), 0L, " +
          s"(acc, i) -> acc + IF(embedding[i] > 0, shiftleft(1L, i - $lo), 0L))")
      val codes = e.select(col("vec_id"), half(0).as("lo"), half(32).as("hi"))
      val q = codes.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("lo").as("qlo"),
          col("hi").as("qhi"))
      codes.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("nid"),
          expr("bit_count(lo ^ qlo) + bit_count(hi ^ qhi)").as("hd"))
        .groupBy("q_id")
        .agg(expr("topk_by(-CAST(hd AS DOUBLE), nid, 10)").as("top"))
    }

    // ---- q5 over replicated facts ------------------------------------
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey")
    val ord = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val maxCust = cust.agg(max("c_custkey")).head.getLong(0) + 1L
    val maxOrd = ord.agg(max("o_orderkey")).head.getLong(0) + 1L
    def factTimes(n: Int): (DataFrame, DataFrame, DataFrame) = (
      (0 until n).map(c => cust.select(
        (col("c_custkey") + lit(c * maxCust)).as("c_custkey"),
        col("c_nationkey"))).reduce(_ union _),
      (0 until n).map(c => ord.select(
        (col("o_orderkey") + lit(c * maxOrd)).as("o_orderkey"),
        (col("o_custkey") + lit(c * maxCust)).as("o_custkey"),
        col("o_orderdate"))).reduce(_ union _),
      (0 until n).map(c => li.select(
        (col("l_orderkey") + lit(c * maxOrd)).as("l_orderkey"),
        col("l_suppkey"), col("l_extendedprice"), col("l_discount")))
        .reduce(_ union _))

    def q5(c: DataFrame, o: DataFrame, l: DataFrame): DataFrame = {
      val nr = Tables.nation(spark, sfDir)
        .join(broadcast(Tables.region(spark, sfDir)),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .select("n_nationkey", "n_name")
      c.join(o.filter(col("o_orderdate") >= "1997-01-01" &&
            col("o_orderdate") < "1998-01-01"),
          col("c_custkey") === col("o_custkey"))
        .join(l.select(col("l_orderkey"), col("l_suppkey"),
          expr("CAST(floor(CAST(l_extendedprice AS DOUBLE) * " +
            "(1.0 - CAST(l_discount AS DOUBLE)) * 100) AS BIGINT)")
            .as("rev_c")), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg((sum(col("rev_c")).cast("double") / 100.0).as("revenue"))
    }

    // warm-up (JIT + codegen), untimed
    hamming(embTimes(1)).queryExecution.toRdd.count()
    val (wc, wo, wl) = factTimes(1)
    q5(wc, wo, wl).queryExecution.toRdd.count()

    println(f"${"scale"}%-6s ${"vecs"}%9s ${"hamming_s"}%10s " +
      f"${"li_rows"}%10s ${"q5_s"}%8s")
    for (n <- Seq(1, 4, 16)) {
      val e = embTimes(n)
      val nVecs = e.count()
      val t0 = System.nanoTime()
      hamming(e).queryExecution.toRdd.count()
      val tH = (System.nanoTime() - t0) / 1e9

      val (cc, oo, ll) = factTimes(n)
      val nLi = ll.count()
      val t1 = System.nanoTime()
      q5(cc, oo, ll).queryExecution.toRdd.count()
      val tQ = (System.nanoTime() - t1) / 1e9
      println(f"${n}%-6d ${nVecs}%9d ${tH}%10.3f ${nLi}%10d ${tQ}%8.3f")
    }
    spark.stop()
  }
}
