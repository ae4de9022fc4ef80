package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantics pins for the r15 closing additions. Cross-engine values are
  * pinned by the DuckDB twins at sf0.01; these tests pin the branches the
  * fixture does NOT exercise — at sf0.01 every user has changelog rows, so
  * q_cdc_merge's 'unchanged'/'inserted' actions and the no-op-tombstone
  * drop never fire there; the fixture has no midnight-straddling peak, so
  * q_concurrency_peak's carry-at-day-start branch never wins; and the
  * triangle census needs a hand-countable graph (including a hub-skew one
  * that exercises the degree orientation) plus a known Pareto plane. */
class R15cOpsSpec extends SparkTestBase {

  import spark.implicits._

  private val dayUs = 86400000000L

  // --- q_cdc_merge -------------------------------------------------------

  private val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private def t(sec: Long) = new java.sql.Timestamp(ts0.getTime + sec * 1000L)
  private def us(sec: Long) = (ts0.getTime + sec * 1000L) * 1000L

  test("cdcMerge: all four actions, the no-op tombstone, and latest-wins ties") {
    // max event_id = 100 → split k = 80; ids < 80 are the snapshot,
    // ids >= 80 the changelog; 'error' rows play the tombstones
    val ev = Seq(
      // u1: snapshot only → unchanged
      (1L, t(0), 1L, "A", 1.0),
      // u2: snapshot + one changelog upsert → updated
      (2L, t(0), 2L, "A", 1.0), (81L, t(10), 2L, "B", 2.0),
      // u3: changelog only (id 80 IS delta — boundary inclusive) → inserted
      (80L, t(5), 3L, "C", 3.0),
      // u4: snapshot + tombstone → deleted (NULL state, tombstone time)
      (3L, t(0), 4L, "D", 4.0), (100L, t(20), 4L, "error", 0.0),
      // u5: tombstone for a key the snapshot never had → emits NOTHING
      (90L, t(10), 5L, "error", 0.0),
      // u6: two changelog rows at the SAME ts → higher event_id wins
      (4L, t(0), 6L, "A", 1.0),
      (85L, t(10), 6L, "B", 5.0), (86L, t(10), 6L, "C", 6.0),
      // u7: tombstone then a LATER upsert → the upsert wins → updated
      (5L, t(0), 7L, "A", 1.0),
      (87L, t(10), 7L, "error", 0.0), (88L, t(20), 7L, "B", 7.0),
      // u8: upsert then a LATER tombstone → deleted
      (6L, t(0), 8L, "A", 1.0),
      (89L, t(10), 8L, "B", 8.0), (91L, t(20), 8L, "error", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventQueries.cdcMergeOf(ev).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) "-" else r.getString(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3),
        r.getLong(4)))
      .sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, "unchanged", "A", 1.0, us(0)),
      (2L, "updated", "B", 2.0, us(10)),
      (3L, "inserted", "C", 3.0, us(5)),
      (4L, "deleted", "-", -1.0, us(20)),
      (6L, "updated", "C", 6.0, us(10)),
      (7L, "updated", "B", 7.0, us(20)),
      (8L, "deleted", "-", -1.0, us(20))))
  }

  // --- q_concurrency_peak ------------------------------------------------

  test("concurrencyPeak: equal-instant open/close nets out; overnight carry wins a delta-negative day") {
    // all times relative to a computed midnight so the day split is exact
    // regardless of the JVM/session timezone
    val day1Start = (us(0) / dayUs + 1L) * dayUs
    def at(relSec: Long) = // relSec relative to that midnight (may be < 0)
      new java.sql.Timestamp((day1Start / 1000L) + relSec * 1000L)
    // intervals (100 s each): A=[-3600,-3500) B=[-3550,-3450) C=[-3500,-3400)
    // — A closes EXACTLY when C opens, so the -3500 instant nets to 0 and
    // concurrency stays 2 (a +1-before-−1 tie order would claim 3) —
    // and D=[-10, 90) straddles midnight: day 1's only delta is D's close,
    // so its true peak is the CARRY level standing at 00:00.
    val ev = Seq(
      (1L, at(-3600), 1L, "view", 100.0), (2L, at(-3550), 1L, "view", 100.0),
      (3L, at(-3500), 1L, "view", 100.0), (4L, at(-10), 1L, "view", 100.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventQueries.concurrencyPeakOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val d0 = day1Start / dayUs - 1L
    assert(out.toSeq === Seq(
      (d0, 2L, day1Start - 3550L * 1000000L), // first reaches 2 when B opens
      (d0 + 1L, 1L, day1Start))) // carry=1 at 00:00; in-day runs are 0
  }

  // --- q_triangle_count ---------------------------------------------------

  test("triangleStats: hand-countable graph (triangle + tail)") {
    // K3 on {1,2,3} plus the tail 3-4-5: deg = (2,2,3,2,1),
    // wedges = 1+1+3+1+0 = 6, triangles = 1, clustering = 3·1/6 = 0.5
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("doc_a", "doc_b")
    val r = DedupQueries.triangleStatsOf(pairs).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)) === ((5L, 5L, 6L, 1L, 0.5)))
  }

  test("triangleStats: hub star — orientation points INTO the hub, count still exact") {
    // star 1-{2,3,4,5} plus closing edge 2-3: the hub (deg 4) receives
    // every oriented edge and mints no wedges itself; the one triangle is
    // still found from its minimum-ORDER vertex (4 or 5 mint nothing
    // either — deg 1). wedges = C(4,2) + 1 + 1 = 8, clustering = 3/8.
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (2L, 3L))
      .toDF("doc_a", "doc_b")
    val r = DedupQueries.triangleStatsOf(pairs).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)) === ((5L, 5L, 8L, 1L, 0.375)))
  }

  // --- q_pit_join ----------------------------------------------------------

  test("pitJoin: boundary instants take the NEW state; pre-history and no-history purchases keep NULL") {
    // u1 history: A [t0, t20) then B [t20, open); purchases at t5 (A),
    // t20 (exactly the transition — belongs to B), t25 (B), and t(-10)
    // (before any observation — NULL). u2 has purchases only — NULL.
    val ev = Seq(
      (1L, t(0), 1L, "A", 0.0), (2L, t(20), 1L, "B", 0.0),
      (10L, t(5), 1L, "purchase", 1.0), (11L, t(20), 1L, "purchase", 2.0),
      (12L, t(25), 1L, "purchase", 3.0), (13L, t(-10), 1L, "purchase", 4.0),
      (14L, t(0), 2L, "purchase", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventQueries.pitJoinOf(ev).collect()
      .map(r => (r.getLong(1),
        if (r.isNullAt(3)) "-" else r.getString(3))).sortBy(_._1)
    assert(out.toSeq === Seq((10L, "A"), (11L, "B"), (12L, "B"),
      (13L, "-"), (14L, "-")))
  }

  test("pitJoin: every fixture purchase appears exactly once (validity tiles)") {
    val sfDir = "/root/testdata/sf0.001"
    val ev = graft.tables.Tables.events(spark, sfDir)
    val nPurch = ev.filter(col("event_type") === "purchase").count()
    val out = EventQueries.pitJoinOf(ev)
    assert(out.count() === nPurch) // LEFT + one-valid-run-per-instant
    assert(out.groupBy("purchase_id").count()
      .filter(col("count") > 1).count() === 0L)
  }

  // --- q_sketch_union ------------------------------------------------------

  test("sketchUnion: daily-sketch union is exact at micro cardinality") {
    // 30 users spread over 3 days with overlap: HLL is exact in its
    // small-cardinality regime, so the union's estimate must equal the
    // straight distinct — this pins the union actually merging sketches
    // (a lost day would under-count by the day's unique users)
    val rows = (1L to 20L).map(u => (u, t(u), u, "view", 0.0)) ++ // day 0: users 1..20
      (21L to 40L).map(u => (u + 100L, t(86400 + u), (u % 30L) + 1L,
        "view", 0.0)) ++ // day 1: users 1..11 and 22..30 (overlaps day 0)
      (41L to 50L).map(u => (u + 200L, t(2 * 86400 + u), u - 20L,
        "view", 0.0)) // day 2: users 21..30
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val exact = ev.select("user_id").distinct().count()
    val res = ev
      .groupBy(col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000")
          .as("day_idx"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_users"))
      .collect().head
    assert(res.getLong(1) === 3L)
    assert(res.getLong(2) === exact)
  }

  // --- q_pps_sample --------------------------------------------------------

  test("ppsSample: grid multiplicities, boundary inclusion, heavy-doc multi-draw") {
    // weights 10/10/35/5/40 → total 100, step = 100/50 = 2, grid at every
    // even cum unit; hand-counted multiplicities per (cum−w, cum] span —
    // doc 2 ends EXACTLY on a grid point (cum 20 ∈ its span, not doc 3's)
    val docs = Seq((1L, 10L), (2L, 10L), (3L, 35L), (4L, 5L), (5L, 40L))
      .toDF("doc_id", "n_chars")
    val out = CorpusQueries.ppsSampleOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.toSeq === Seq((1L, 10L, 10L, 5L), (2L, 10L, 20L, 5L),
      (3L, 35L, 55L, 17L), (4L, 5L, 60L, 3L), (5L, 40L, 100L, 20L)))
    assert(out.map(_._4).sum === 50L) // multiplicities partition the grid
  }

  test("ppsSample: cross-shard offsets reproduce the global cumsum") {
    // ids straddle three id-range shards (div 1024); total 12 < k so
    // step floors to 1 and every weight unit draws — cum must be the
    // GLOBAL running sum, i.e. the shard offsets actually added
    val docs = Seq((10L, 3L), (1500L, 4L), (3000L, 5L))
      .toDF("doc_id", "n_chars")
    val out = CorpusQueries.ppsSampleOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(out.toSeq === Seq((10L, 3L, 3L), (1500L, 7L, 4L),
      (3000L, 12L, 5L)))
  }

  // --- q_interval_join -------------------------------------------------------

  test("intervalJoin: cross-grain pairs emit ONCE; touching endpoints do not overlap") {
    // grain 600 s. Incident A spans a grain boundary (covers 2 buckets);
    // session S1 overlaps it across that boundary — the pair shares TWO
    // buckets and must emit exactly once. S2 starts exactly at A's end
    // (touching, half-open → NO row). S3 is strictly inside A
    // (containment). S4 is far away (no shared bucket at all).
    val ev = Seq(
      (1L, t(500), 1L, "error", 200.0), //  A = [500, 700)
      (10L, t(550), 1L, "view", 100.0), // S1 = [550, 650) → overlap 100 s
      (11L, t(700), 1L, "view", 50.0), //  S2 = [700, 750) → touching: none
      (12L, t(600), 1L, "view", 50.0), //  S3 = [600, 650) → contained, 50 s
      (13L, t(5000), 1L, "view", 50.0)) // S4: disjoint
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventQueries.intervalJoinOf(ev).collect()
      .map(r => (r.getLong(1), r.getLong(4))).sortBy(_._1)
    assert(out.toSeq === Seq((10L, 100000000L), (12L, 50000000L)))
  }

  test("intervalJoin: bucketed pair set equals the definitional quadratic join on the fixture") {
    val sfDir = "/root/testdata/sf0.001"
    val ev = graft.tables.Tables.events(spark, sfDir)
    def iv(t: String, p: String) = ev.filter(col("event_type") === t)
      .select(col("event_id").as(s"${p}_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as(s"${p}_s"),
        (expr("unix_micros(CAST(ts AS TIMESTAMP))") +
          greatest(lit(1L), floor(col("value") * lit(1000000.0))
            .cast("long"))).as(s"${p}_e"))
    val naive = iv("error", "a").crossJoin(iv("view", "b"))
      .filter(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val bucketed = EventQueries.intervalJoinOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(naive.nonEmpty)
    assert(bucketed === naive)
  }

  // --- q_mode --------------------------------------------------------------

  test("mode: count ties break toward the smallest value") {
    // type A: cents 100 ×2 vs 200 ×2 (tie) → 100 wins; B: 300 ×2 vs
    // 100 ×1 → 300 wins on count alone
    val ev = Seq(
      (1L, t(0), 1L, "A", 1.0), (2L, t(1), 1L, "A", 1.0),
      (3L, t(2), 1L, "A", 2.0), (4L, t(3), 1L, "A", 2.0),
      (5L, t(4), 1L, "B", 3.0), (6L, t(5), 1L, "B", 3.0),
      (7L, t(6), 1L, "B", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("mode").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = RelationalQueries.queries("q_mode")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq === Seq(("A", 100L, 2L), ("B", 300L, 2L)))
  }

  // --- q_zorder ------------------------------------------------------------

  test("zorder: every top-5-bit bucket bounds BOTH dims by construction") {
    // the skipping guarantee: the top 5 z bits pin the user dim's top 3
    // scaled bits (range ≤ domain/8) and the day dim's top 2 (≤ domain/4)
    val sfDir = "/root/testdata/sf0.001"
    val ev = graft.tables.Tables.events(spark, sfDir)
    val out = RelationalQueries.zorderOf(ev).collect()
    val maxU = ev.agg(max("user_id")).head.getLong(0)
    val span = ev
      .selectExpr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000 AS d")
      .agg(max("d") - min("d")).head.getLong(0)
    assert(out.length === 32)
    assert(out.map(_.getAs[Long]("n")).sum === ev.count())
    for (r <- out) {
      assert(r.getAs[Long]("u_max") - r.getAs[Long]("u_min") <=
        maxU / 8 + 1, s"user range leak in bucket ${r.getLong(0)}")
      assert(r.getAs[Long]("d_max") - r.getAs[Long]("d_min") <=
        span / 4 + 1, s"day range leak in bucket ${r.getLong(0)}")
    }
  }

  test("zorderSql: the generated interleave is a bijection (roundtrip)") {
    // evaluate the generated Spark expression over edge/random 16-bit
    // pairs, invert it in plain Scala (odd bits → a, even bits → b)
    val vals = Seq(0L, 1L, 2L, 255L, 256L, 4095L, 12345L, 32768L, 65535L)
    val pairs = for (a <- vals; b <- vals) yield (a, b)
    val z = RelationalQueries.zorderSql("a16", "b16",
      (e, n) => if (n == 0) e else s"shiftleft($e, $n)",
      (e, n) => if (n == 0) e else s"shiftright($e, $n)")
    val out = pairs.toDF("a16", "b16").withColumn("z", expr(z))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for ((a, b, zv) <- out) {
      val aBack = (0 until 16).map(i => ((zv >> (2 * i + 1)) & 1L) << i).sum
      val bBack = (0 until 16).map(i => ((zv >> (2 * i)) & 1L) << i).sum
      assert((aBack, bBack) === ((a, b)), s"roundtrip failed at z=$zv")
    }
    assert(out.map(_._3).distinct.length === out.length) // injective
  }

  // --- q_pagerank ----------------------------------------------------------

  test("pageRank: path-graph symmetry, hub centrality, unit mass") {
    // path 1-2-3: ends are symmetric, the middle is the most central;
    // total rank mass stays 1 (no dangling nodes in a pair graph)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val pr = DedupQueries.pageRankOf(path).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(1L) === pr(3L)) // exact: identical arithmetic on both ends
    assert(pr(2L) > pr(1L))
    assert(math.abs(pr.values.sum - 1.0) < 1e-12)
    // driver-side reference fold of the same five rounds, same doubles
    var (e, m) = (1.0 / 3, 1.0 / 3)
    for (_ <- 1 to 5) {
      val t = (1.0 - 0.85) / 3 // the builder's exact teleport constant
      val (e2, m2) = (t + 0.85 * (m / 2), t + 0.85 * (e + e))
      e = e2; m = m2
    }
    assert(math.abs(pr(1L) - e) < 1e-12 && math.abs(pr(2L) - m) < 1e-12)
    // star 1-{2..5}: the hub concentrates rank
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
      .toDF("doc_a", "doc_b")
    val ps = DedupQueries.pageRankOf(star).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(Seq(2L, 3L, 4L, 5L).forall(l => ps(1L) > 2 * ps(l)))
  }

  // --- q_skyline -----------------------------------------------------------

  test("skyline: dominance drops, both-axes ties keep both") {
    // stopwords counted by the builder: the/a/an/of/to/and
    val docs = Seq(
      (1L, "the the the", "en", "s", 10L), // frontier (10, 3)
      (2L, "the the", "en", "s", 20L), //     frontier (20, 2)
      (3L, "x y", "en", "s", 20L), //         (20, 0): dominated by d2
      (4L, "the", "en", "s", 30L), //         frontier (30, 1)
      (5L, "the the the", "en", "s", 5L), //  (5, 3): dominated by d1
      (6L, "of and to", "en", "s", 10L)) //   (10, 3): TIE with d1 — kept
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextQueries.skylineOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, 10L, 3L), (2L, 20L, 2L), (4L, 30L, 1L), (6L, 10L, 3L)))
  }
}
