package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantics pins for the r13 additions (cross-engine values are pinned by
  * the DuckDB twins; these tests pin behavior on inputs the fixture does
  * not exercise — boundary gaps, multi-click purchases, split determinism,
  * threshold edges). */
class R13OpsSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def microEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r13ev").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q_sessionize: breaks strictly above the 30-min gap, numbered from 1") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(sec: Long) = new java.sql.Timestamp(ts0.getTime + sec * 1000L)
    // user 1: gap of EXACTLY 30 min (no break — strictly greater), then
    //         30 min + 1 s (break); user 2: single event
    val dir = microEvents(Seq(
      (1L, t(0), 1L, "click", 0.0),
      (2L, t(1800), 1L, "click", 0.0),
      (3L, t(1800 + 1801), 1L, "click", 0.0),
      (4L, t(0), 2L, "signup", 0.0)))
    val out = EventQueries.queries("q_sessionize")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("q_sessionize: labels every event; session numbers start at 1 and never jump") {
    val ev = graft.tables.Tables.events(spark, sfDir)
    val out = EventQueries.queries("q_sessionize")(spark, sfDir)
    assert(out.count() === ev.count())
    // per user: min session = 1, max session = number of distinct sessions
    val bad = out.groupBy("user_id")
      .agg(min("session_no").as("lo"), max("session_no").as("hi"),
        countDistinct("session_no").as("k"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("k"))
      .count()
    assert(bad === 0L)
  }

  test("q_attribution_last: picks min gap then min click_id per purchase") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(sec: Long) = new java.sql.Timestamp(ts0.getTime + sec * 1000L)
    // purchase 10 has clicks at -10 min (id 2) and -5 min (id 3): last
    // touch is id 3 (smaller gap). purchase 20 has two clicks at the SAME
    // instant (-60 s): tie breaks to the smaller click_id 5.
    val dir = microEvents(Seq(
      (2L, t(0), 1L, "click", 0.0),
      (3L, t(300), 1L, "click", 0.0),
      (10L, t(600), 1L, "purchase", 9.5),
      (5L, t(0), 2L, "click", 0.0),
      (6L, t(0), 2L, "click", 0.0),
      (20L, t(60), 2L, "purchase", 3.25)))
    val out = EventQueries.queries("q_attribution_last")(spark, dir)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out === Map(10L -> (3L, 300000000L), 20L -> (5L, 60000000L)))
  }

  test("q_attribution_last: exactly one row per attributed purchase") {
    val attr = EventQueries.queries("q_click_attribution")(spark, sfDir)
    val last = EventQueries.queries("q_attribution_last")(spark, sfDir)
    assert(last.count() === attr.select("purchase_id").distinct().count())
    // and each picked gap is that purchase's minimum
    val mins = attr.groupBy("purchase_id").agg(min("gap_us").as("mg"))
    val bad = last.join(mins, "purchase_id")
      .filter(col("gap_us") =!= col("mg")).count()
    assert(bad === 0L)
  }

  test("q_split_assign: partitions the corpus, deterministic, ~80/10/10") {
    val out = CorpusQueries.queries("q_split_assign")(spark, sfDir).collect()
    val nDocs = graft.tables.Tables.documents(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === nDocs)
    assert(out.map(_.getAs[String]("split")).toSet.subsetOf(
      Set("train", "val", "test")))
    val bySplit = out.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val train = bySplit.getOrElse("train", 0L).toDouble / nDocs
    assert(train > 0.6 && train < 0.95, s"train share $train")
    // determinism: a second run is row-identical
    val again = CorpusQueries.queries("q_split_assign")(spark, sfDir).collect()
    assert(out.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }

  test("q_hard_negatives: all below the positive cut, top-5 per query, ordered") {
    val out = SimilarityQueries.queries("q_hard_negatives")(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Double]("score") < 0.25))
    val perQ = out.groupBy(_.getAs[Long]("q_id"))
    for ((q, rows) <- perQ) {
      assert(rows.length <= 5, s"q=$q has ${rows.length} rows")
      val byRnk = rows.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("score"))
      assert(byRnk.zip(byRnk.tail).forall { case (a, b) => a >= b },
        s"q=$q scores not descending in rank")
    }
  }

  test("q_tpch_q1: aggregates reconcile (count, avg x count = sum)") {
    val out = RelationalQueries.queries("q_tpch_q1")(spark, sfDir).collect()
    val filtered = graft.tables.Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= "2001-09-01").count()
    assert(out.map(_.getAs[Long]("count_order")).sum === filtered)
    for (r <- out) {
      val n = r.getAs[Long]("count_order").toDouble
      assert(math.abs(r.getAs[Double]("avg_qty") * n -
        r.getAs[Double]("sum_qty")) < 1e-6 * n)
      // charge >= disc price >= 0 (tax and discount are non-negative)
      assert(r.getAs[Double]("sum_charge") >= r.getAs[Double]("sum_disc_price"))
    }
  }

  test("q_tpch_q16: denylisted suppliers never counted; bounds hold") {
    val out = RelationalQueries.queries("q_tpch_q16")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val nGood = graft.tables.Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") >= 0).count()
    assert(out.forall(_.getAs[Long]("supplier_cnt") <= nGood))
    assert(out.forall(r => !r.getAs[String]("p_type").startsWith("PROMO")
      && r.getAs[String]("p_brand") != "Brand#3"))
  }

  test("q_tpch_q15: the reported revenue IS the per-supplier maximum") {
    val out = RelationalQueries.queries("q_tpch_q15")(spark, sfDir).collect()
    assert(out.nonEmpty)
    // driver recompute of the quarter's per-supplier cents revenue
    val best = graft.tables.Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= "1997-01-01" &&
        col("l_shipdate") < "1997-04-01")
      .groupBy("l_suppkey")
      .agg(sum(expr("CAST(floor(CAST(l_extendedprice AS DOUBLE) * " +
        "(1.0 - CAST(l_discount AS DOUBLE)) * 100) AS BIGINT)")).as("rc"))
      .agg(max("rc")).collect()(0).getLong(0)
    assert(out.forall(r =>
      math.abs(r.getAs[Double]("total_revenue") - best / 100.0) < 1e-9))
  }

  test("q_tpch_q17: one row; value matches the threshold-filtered recompute") {
    val out = RelationalQueries.queries("q_tpch_q17")(spark, sfDir).collect()
    assert(out.length === 1)
    val got = out(0).getAs[Double]("avg_yearly")
    // driver recompute: per-part avg qty over Brand#1 rows, then the sum of
    // prices of rows strictly below 0.2x their part's average
    val rows = graft.tables.Tables.lineitem(spark, sfDir)
      .join(graft.tables.Tables.part(spark, sfDir)
        .filter(col("p_brand") === "Brand#1").select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val avg = rows.groupBy(_._1).view.mapValues(v =>
      v.map(x => BigDecimal(x._2).setScale(2).toDouble).sum / v.length).toMap
    val expect = rows.filter { case (p, q, _) => q < 0.2 * avg(p) }
      .map(x => BigDecimal(x._3).setScale(2)).sum.toDouble / 7.0
    assert(math.abs(got - expect) < 1e-6 * math.max(1.0, math.abs(expect)),
      s"got $got expect $expect")
  }

  test("q_tpch_q10: at most 20 rows, ordered by revenue desc then custkey") {
    val out = RelationalQueries.queries("q_tpch_q10")(spark,
      "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty && out.length <= 20)
    val keys = out.map(r => (-r.getAs[Double]("revenue"),
      r.getAs[Long]("c_custkey"))).toSeq
    assert(keys === keys.sorted, "not in (revenue DESC, custkey) order")
  }

  test("q_tpch_q6: revenue equals the driver recompute of the filtered scan") {
    val out = RelationalQueries.queries("q_tpch_q6")(spark, sfDir).collect()
    assert(out.length === 1)
    val rows = graft.tables.Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= "1997-01-01" &&
        col("l_shipdate") < "1998-01-01" &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .select("l_extendedprice", "l_discount").collect()
    val cents = rows.map(r =>
      math.floor(r.getDouble(0) * r.getDouble(1) * 100).toLong).sum
    assert(out(0).getAs[Double]("revenue") === cents / 100.0)
  }

  test("q_tpch_q14: promo share in [0, 100]") {
    val out = RelationalQueries.queries("q_tpch_q14")(spark, sfDir).collect()
    assert(out.length === 1)
    val pct = out(0).getAs[Double]("promo_revenue_pct")
    assert(pct >= 0.0 && pct <= 100.0, s"pct $pct")
  }

  test("q_tpch_q19: OR-of-bands revenue is a subset of the quantity envelope") {
    val out = RelationalQueries.queries("q_tpch_q19")(spark, sfDir).collect()
    assert(out.length === 1)
    val rev = out(0).getAs[Double]("revenue")
    assert(rev >= 0.0)
    // envelope: dropping the per-brand band (keeping only qty 1..30 and
    // the part-side filter) can only ADD revenue
    val envelope = graft.tables.Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
      .join(graft.tables.Tables.part(spark, sfDir)
        .filter((col("p_brand") === "Brand#1" && col("p_size").between(1, 5))
          || (col("p_brand") === "Brand#2" && col("p_size").between(1, 10))
          || (col("p_brand") === "Brand#3" && col("p_size").between(1, 15)))
        .select("p_partkey"), col("l_partkey") === col("p_partkey"))
      .agg(sum(expr("CAST(floor(CAST(l_extendedprice AS DOUBLE) * " +
        "(1.0 - CAST(l_discount AS DOUBLE)) * 100) AS BIGINT)")))
      .collect()(0).getLong(0) / 100.0
    assert(rev <= envelope + 1e-9, s"$rev > envelope $envelope")
  }

  test("q_group_sample: exactly 5 per source, deterministic, ranks 1..5") {
    val out = CorpusQueries.queries("q_group_sample")(spark, sfDir).collect()
    val bySrc = out.groupBy(_.getAs[String]("source"))
    val nSrc = graft.tables.Tables.documents(spark, sfDir)
      .select("source").distinct().count()
    assert(bySrc.size === nSrc)
    for ((src, rows) <- bySrc) {
      assert(rows.map(_.getAs[Int]("rnk")).sorted.toSeq === Seq(1, 2, 3, 4, 5),
        s"$src ranks")
    }
    val again = CorpusQueries.queries("q_group_sample")(spark, sfDir).collect()
    assert(out.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }

  test("q_tpch_q8: market share is a proper fraction per year") {
    val out = RelationalQueries.queries("q_tpch_q8")(spark,
      "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val s = r.getAs[Double]("mkt_share"); s >= 0.0 && s <= 1.0 })
  }

  test("q_tpch_q12: late + ontime counts partition the joined lineitems") {
    val out = RelationalQueries.queries("q_tpch_q12")(spark, sfDir).collect()
    val total = out.map(r => r.getAs[Long]("late_count") +
      r.getAs[Long]("ontime_count")).sum
    // every lineitem has an order row in the fixture, so the join is
    // lossless and the two buckets partition it
    assert(total === graft.tables.Tables.lineitem(spark, sfDir).count())
    assert(out.forall(_.getAs[Long]("ontime_count") >= 0L))
  }

  test("q_tpch_q22: every reported group holds above-average dormant balances") {
    val out = RelationalQueries.queries("q_tpch_q22")(spark,
      "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty)
    val cust = graft.tables.Tables.customer(spark, "/root/testdata/sf0.01")
      .select(col("c_custkey"), col("c_nationkey"),
        expr("CAST(floor(CAST(c_acctbal AS DOUBLE) * 100) AS BIGINT)")
          .as("b")).collect()
    val pos = cust.map(_.getAs[Long]("b")).filter(_ > 0)
    val avg = pos.sum.toDouble / pos.length
    // group minimum balance must exceed the positive average:
    // totacctbal > numcust·avg/100 is implied; check the group average
    assert(out.forall(r => r.getAs[Double]("totacctbal") * 100.0 >
      r.getAs[Long]("numcust") * avg - 1e-6))
  }

  test("q_tpch_q7: symmetric nation pairs, exact year domain") {
    // sf0.001 has no cross-trade between the two fixed nations (4 customers
    // per nation); sf0.01 does — the oracle gate runs there anyway
    val out = RelationalQueries.queries("q_tpch_q7")(spark,
      "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty)
    val pairs = out.map(r => (r.getAs[String]("supp_nation"),
      r.getAs[String]("cust_nation"))).toSet
    assert(pairs.subsetOf(Set(("NATION_1", "NATION_2"), ("NATION_2", "NATION_1"))))
    assert(out.forall { r =>
      val y = r.getAs[Long]("l_year"); y >= 1995L && y <= 2001L })
  }
}
