package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantics pins for the late-r15 additions (cross-engine values are
  * pinned by the DuckDB twins; these tests pin behavior on inputs the
  * fixture does not exercise — equal-timestamp run ties, the MAD = 0
  * degenerate group, the shard-sum identity against Spark's own
  * count(distinct)). */
class R15bOpsSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def microEvents(
      rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r15b").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private def t(sec: Long) = new java.sql.Timestamp(ts0.getTime + sec * 1000L)
  private def us(sec: Long) = (ts0.getTime + sec * 1000L) * 1000L

  test("q_scd2_history: runs, re-entry, and open current state on a micro corpus") {
    // user 1: A,A,B,A — the A run collapses, B supersedes, A RE-ENTERS
    //         (a new version, not a merge with the first A run)
    // user 2: single observation → one open row
    val dir = microEvents(Seq(
      (1L, t(0), 1L, "A", 0.0), (2L, t(10), 1L, "A", 0.0),
      (3L, t(20), 1L, "B", 0.0), (4L, t(30), 1L, "A", 0.0),
      (5L, t(0), 2L, "X", 0.0)))
    val out = EventQueries.queries("q_scd2_history")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .sortBy(x => (x._1, x._3, x._4))
    assert(out.toSeq === Seq(
      (1L, "A", us(0), us(20)),
      (1L, "B", us(20), us(30)),
      (1L, "A", us(30), -1L),
      (2L, "X", us(0), -1L)).sortBy(x => (x._1, x._3, x._4)))
  }

  test("q_scd2_history: equal-timestamp tie breaks on event_id (deterministic run order)") {
    // both observations share ts; event_id 6 sorts first, so B is the
    // instantaneously-superseded first version (empty half-open interval)
    val dir = microEvents(Seq(
      (6L, t(0), 3L, "B", 0.0), (7L, t(0), 3L, "A", 0.0)))
    val out = EventQueries.queries("q_scd2_history")(spark, dir)
      .collect()
      .map(r => (r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).sortBy(_._3)
    assert(out.toSeq === Seq(("A", us(0), -1L), ("B", us(0), us(0))))
  }

  test("q_scd2_history: intervals tile each user's history on the fixture") {
    // structural invariants at sf0.001: per user, exactly one open row;
    // sorted by valid_from, every valid_to equals the NEXT valid_from
    // (half-open tiling — no gaps, no overlaps); adjacent states differ
    // open rows sort LAST via a max-sentinel valid_to (plain NULL would
    // sort first and break the adjacency walk on empty-interval ties)
    val out = EventQueries.queries("q_scd2_history")(spark, sfDir)
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(
        col("valid_from_us").as("vf"),
        coalesce(col("valid_to_us"),
          lit(Long.MaxValue)).as("vt"),
        col("event_type").as("ty")))).as("h"))
    val bad = out.filter(!expr(
      s"""size(filter(h, x -> x.vt = ${Long.MaxValue}L)) = 1
          AND h[size(h) - 1].vt = ${Long.MaxValue}L
          AND (size(h) < 2 OR aggregate(sequence(0, size(h) - 2), true,
                (ok, i) -> ok AND h[i].vt = h[i + 1].vf
                              AND h[i].ty != h[i + 1].ty))"""))
      .count()
    assert(bad === 0L)
  }

  test("q_anomaly_mad: hand-computed lower median / MAD; MAD = 0 group drops") {
    // type 'e' cents [1,2,2,3,100]: lower median 2 (cum≥3), deviation
    // hist {0:2, 1:2, 98:1} → MAD 1 → only the 100-cent event exceeds
    // 3·MAD. type 'z' cents [5,5,5,999]: MAD 0 → the whole group (even
    // the obvious 999 outlier) drops — the documented degenerate case.
    val dir = microEvents(Seq(
      (1L, t(0), 1L, "e", 0.01), (2L, t(1), 1L, "e", 0.02),
      (3L, t(2), 1L, "e", 0.02), (4L, t(3), 1L, "e", 0.03),
      (5L, t(4), 1L, "e", 1.00),
      (6L, t(0), 2L, "z", 0.05), (7L, t(1), 2L, "z", 0.05),
      (8L, t(2), 2L, "z", 0.05), (9L, t(3), 2L, "z", 9.99)))
    val out = RelationalQueries.queries("q_anomaly_mad")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq((5L, "e", 98L, 1L)))
  }

  test("q_anomaly_mad: flagged rows satisfy the gate against a brute-force recompute") {
    val flagged = RelationalQueries.queries("q_anomaly_mad")(spark, sfDir)
      .collect()
    assert(flagged.nonEmpty, "fixture should contain MAD outliers")
    // brute-force per-type lower median / MAD on the driver
    val ev = graft.tables.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("CAST(floor(CAST(value AS DOUBLE) * 100) AS BIGINT)").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted; s(((s.size + 1) / 2) - 1)
    }
    val med = ev.groupBy(_._1).map { case (k, v) =>
      k -> lowerMedian(v.map(_._2).toSeq) }
    val mad = ev.groupBy(_._1).map { case (k, v) =>
      k -> lowerMedian(v.map(x => math.abs(x._2 - med(k))).toSeq) }
    for (r <- flagged) {
      val et = r.getString(1)
      assert(r.getLong(4) === mad(et), s"$et mad")
      assert(r.getLong(3) > 3 * mad(et) && mad(et) > 0, s"$et gate")
    }
    // and the flagged COUNT matches the brute-force gate exactly
    val expect = ev.count { case (k, q) =>
      mad(k) > 0 && math.abs(q - med(k)) > 3 * mad(k) }
    assert(flagged.length === expect)
  }

  test("q_count_distinct_salted: shard-sum identity equals the direct distinct") {
    val direct = graft.tables.Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("users"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val sharded = RelationalQueries
      .queries("q_count_distinct_salted")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(sharded === direct)
  }
}
