package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Event-stream analytics over the `events` table — the telemetry side of
  * a large-scale pipeline (ingest/processing event logs get exactly these
  * three questions asked of them: did users/jobs progress through the
  * expected stages, what transitions happen, does a cohort keep coming
  * back). All three share ONE scalable plan shape: a single exchange on
  * `user_id`, then bounded per-user work — no windows, no sorts, no
  * self-joins.
  *
  * - `q_funnel`: ordered 3-step funnel (signup → click → purchase, each
  *   step strictly after the previous step's FIRST completion). Per user
  *   the events fold in time order through a 3-slot state; the fold input
  *   is `sort_array(collect_list(struct(ts, event_id, type)))` — per-user
  *   event counts are bounded by user activity, the same group-and-expand
  *   budget q_embed_neardup runs on. Strictly-after (`>`) semantics make
  *   the equal-timestamp tiebreak irrelevant (both engines exclude ties),
  *   but event_id still rides in the sort struct so the fold order itself
  *   is a deterministic total order.
  * - `q_event_transitions`: event-type bigram counts per user in
  *   (ts, event_id) order — the Markov-transition table. Adjacent pairs
  *   come from a row-local `transform(slice(...))` over the same sorted
  *   array (0-based `evs[i + 1]` bracket indexing), then one narrow
  *   (prev, next) count aggregate: 25 output rows regardless of corpus.
  * - `q_retention`: weekly cohort retention. cohort = Monday-truncated
  *   week of the user's FIRST event; each (user, active week) pair counts
  *   once. ONE pass: `min(week)` and `collect_set(week)` in the same
  *   user aggregate — the set is bounded by the CALENDAR (weeks in the
  *   observation window), not by event count, so the explode after it is
  *   corpus-size-independent per user. Offsets are exact integer date
  *   arithmetic (weeks are Mondays, so datediff is a multiple of 7).
  *
  * At 100 TB: all three shuffle each event row exactly once (to its
  * user's partition, map-side-combined collect partials), and everything
  * after the per-user fold is bounded (3 counters / 25 pairs / weeks ×
  * cohorts). The alternative window-function forms pay the same exchange
  * PLUS a sort per partition; the fold forms sort only within each user's
  * collected array.
  */
object EventQueries {

  // DataFrame-input builders (private[ops]): the registered queries call
  // them with Tables.events; EventGrowth times the SAME builders over
  // replicated inputs, so the growth harness cannot drift from the
  // registered shapes.
  private[ops] def scd2Of(ev: DataFrame): DataFrame =
    ev.filter(col("event_type").isNotNull && col("ts").isNotNull)
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tsu"),
        col("event_id"), col("event_type")))).as("evs"))
      // Run starts: position 0, or the state changed vs the previous
      // observation (0-based bracket indexing into the sorted array).
      .withColumn("starts", expr(
        """filter(sequence(0, size(evs) - 1),
             p -> p = 0 OR evs[p].event_type != evs[p - 1].event_type)"""))
      // Each run start becomes one history row; valid_to is the NEXT
      // run's start (half-open), NULL for the still-current state.
      .select(col("user_id"), explode(expr(
        """transform(sequence(0, size(starts) - 1),
             j -> named_struct(
               'event_type',    evs[starts[j]].event_type,
               'valid_from_us', evs[starts[j]].tsu,
               'valid_to_us',   IF(j = size(starts) - 1,
                                   CAST(NULL AS BIGINT),
                                   evs[starts[j + 1]].tsu)))""")).as("h"))
      .select(col("user_id"), col("h.event_type"),
        col("h.valid_from_us"), col("h.valid_to_us"))

  private def sortedEvents(ev: DataFrame): DataFrame =
    ev.groupBy("user_id")
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))

  private[ops] def funnelOf(ev: DataFrame): DataFrame =
    sortedEvents(ev)
      .select(expr(
        """aggregate(evs,
           named_struct('t1', CAST(NULL AS TIMESTAMP),
                        't2', CAST(NULL AS TIMESTAMP),
                        't3', CAST(NULL AS TIMESTAMP)),
           (a, e) -> named_struct(
             't1', IF(a.t1 IS NULL AND e.event_type = 'signup',
                      e.ts, a.t1),
             't2', IF(a.t2 IS NULL AND a.t1 IS NOT NULL
                      AND e.event_type = 'click' AND e.ts > a.t1,
                      e.ts, a.t2),
             't3', IF(a.t3 IS NULL AND a.t2 IS NOT NULL
                      AND e.event_type = 'purchase' AND e.ts > a.t2,
                      e.ts, a.t3)))""").as("f"))
      .agg(
        sum(when(col("f.t1").isNotNull, 1L).otherwise(0L)).as("s1"),
        sum(when(col("f.t2").isNotNull, 1L).otherwise(0L)).as("s2"),
        sum(when(col("f.t3").isNotNull, 1L).otherwise(0L)).as("s3"))
      .selectExpr(
        """stack(3, 1L, 'signup', s1,
                    2L, 'click_after_signup', s2,
                    3L, 'purchase_after_click', s3)
           AS (step_no, step, users)""")

  private[ops] def transitionsOf(ev: DataFrame): DataFrame =
    sortedEvents(ev)
      .select(explode(expr(
        """transform(slice(evs, 1, size(evs) - 1), (e, i) ->
             named_struct('prev_type', e.event_type,
                          'next_type', evs[i + 1].event_type))"""))
        .as("t"))
      .groupBy(col("t.prev_type").as("prev_type"),
        col("t.next_type").as("next_type"))
      .agg(count(lit(1)).as("n"))

  private[ops] def retentionOf(ev: DataFrame): DataFrame =
    ev.select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("w"))
      .groupBy("user_id")
      .agg(min(col("w")).as("cohort_week"), collect_set(col("w")).as("ws"))
      .select(col("cohort_week"), explode(col("ws")).as("w"))
      .select(col("cohort_week"),
        expr("datediff(w, cohort_week) DIV 7").as("week_no"))
      .groupBy("cohort_week", "week_no")
      .agg(count(lit(1)).as("users"))

  private[ops] def sessionizeOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    val run = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.select(col("user_id"), col("event_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tsu"))
      .withColumn("brk",
        when(col("tsu") - lag("tsu", 1).over(w) > lit(1800000000L)
          || lag("tsu", 1).over(w).isNull, 1L).otherwise(0L))
      .select(col("user_id"), col("event_id"),
        sum(col("brk")).over(run).as("session_no"))
  }

  private[ops] def heavyHittersOf(ev: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(ev.sparkSession)
    val counts = ev.groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // bounded (one row per key); two consumers
    val total = counts.agg(sum(col("cnt")).as("t")).select(col("t")).scalar()
    counts
      .groupBy()
      .agg(expr("topk_by(CAST(cnt AS DOUBLE), user_id, 10)").as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("t.id").as("user_id"), (col("pos") + 1).as("rnk"),
        col("t.score").cast("long").as("cnt"))
      .withColumn("share", col("cnt").cast("double") / total)
  }

  private[ops] def attributionLastOf(ev: DataFrame): DataFrame =
    attributionOf(ev)
      .groupBy("user_id", "purchase_id", "amount")
      .agg(min(struct(col("gap_us"), col("click_id"))).as("b"))
      .select(col("user_id"), col("purchase_id"),
        col("b.click_id").as("click_id"), col("b.gap_us").as("gap_us"),
        col("amount"))

  private[ops] def attributionOf(ev: DataFrame): DataFrame = {
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("click_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("purchase_us"),
        col("value").as("amount"))
    c.join(p, col("cu") === col("pu") &&
        col("click_us") < col("purchase_us") &&
        col("click_us") >= col("purchase_us") - lit(3600000000L))
      .select(col("pu").as("user_id"), col("purchase_id"),
        col("click_id"),
        (col("purchase_us") - col("click_us")).as("gap_us"),
        col("amount"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel" -> ((s, d) => funnelOf(Tables.events(s, d))),

    "q_event_transitions" -> ((s, d) => transitionsOf(Tables.events(s, d))),

    "q_retention" -> ((s, d) => retentionOf(Tables.events(s, d))),

    // Click→purchase attribution — the interval self-join: every
    // purchase pairs with the SAME user's clicks in the strictly
    // preceding hour (all of them — last-touch/first-touch are sink-side
    // picks over gap_us). Times compare as epoch MICROSECOND integers
    // (unix_micros ↔ epoch_us — the q_window_range discipline; raw
    // TIMESTAMP output would hash-diverge on the fixture's nanos
    // physical type). Plan: both sides filter to one event type at the
    // scan, equi-join on user_id with the time band as a residual — one
    // shuffle per side keyed on users, and the band bounds per-user
    // match counts, so no pair blow-up at any scale. The streaming twin
    // is [[graft.streaming.BeaconStreaming.clickAttributionStream]]
    // (watermarked stream-stream join, spec-pinned equal on a sliced
    // replay).
    // The other half of attribution — ABANDONMENT: clicks with NO
    // same-user purchase in the following hour (the funnel-drop list).
    // Left ANTI join on the user key with the time band as residual —
    // same scale shape as q_click_attribution, existence-probe semantics
    // (never multiplies rows). Streaming twin:
    // [[graft.streaming.BeaconStreaming.clickAbandonmentStream]] — the
    // LEFT OUTER stream-stream join whose unmatched rows emit on
    // watermark expiry, spec-pinned equal on a flushed replay.
    "q_click_abandonment" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("event_id").as("click_id"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("click_us"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("purchase_us"))
      c.join(p, col("cu") === col("pu") &&
          col("purchase_us") > col("click_us") &&
          col("purchase_us") <= col("click_us") + lit(3600000000L),
          "left_anti")
        .select(col("cu").as("user_id"), col("click_id"), col("click_us"))
    }),

    "q_click_attribution" -> ((s, d) => attributionOf(Tables.events(s, d))),

    // Gap-based sessionization (r13) — assign every event a per-user
    // session number: a session breaks when >30 min passes since the
    // user's previous event. The classic LAG + running-sum-of-breaks
    // window composition (complementing q_session_window's aggregate
    // form: that one yields per-SESSION rows via the session_window
    // aggregate; this one labels every EVENT row, the shape feature
    // pipelines need when session_id becomes a join/group key
    // downstream). Times compare as epoch-microsecond integers
    // (unix_micros ↔ epoch_us — the q_window_range discipline; gap
    // membership is a difference, so any session-tz shift cancels and
    // tsu itself never leaves the plan). Scale: ONE exchange on
    // user_id + per-partition sort shared by both window functions —
    // the same single-window plan q_window_lag runs; nothing
    // corpus-sized leaves its partition.
    "q_sessionize" -> ((s, d) => sessionizeOf(Tables.events(s, d))),

    // Heavy-hitter keys (r13) — the skew diagnostic run BEFORE every
    // large join/groupBy at scale: the top-10 keys by row count and each
    // one's share of the table (the salting decision input — PERF.md's
    // dedup salt hatch triggers off exactly this measurement). ONE
    // map-side-combined count aggregate, the bounded topk_by heap over
    // the per-key counts (never a sort of the key distribution), and the
    // grand total rides a scalar subquery off the SAME aggregate —
    // integer counts end-to-end, one double division for the share.
    "q_heavy_hitters" -> ((s, d) => heavyHittersOf(Tables.events(s, d))),

    // Last-touch attribution (r13) — the sink-side pick the
    // q_click_attribution scaladoc promises: per purchase, the single
    // click with the smallest gap (ties → smallest click_id), via
    // min(struct(gap_us, click_id)) — an order-free integer argmin, so
    // any partitioning agrees. One bounded aggregate on top of the
    // attribution join (purchase_id keys — exchange width = purchases
    // with ≥1 click, already bounded by the hour band).
    "q_attribution_last" -> ((s, d) =>
      attributionLastOf(Tables.events(s, d))),

    // SCD2 history reconstruction (r15) — the reference keeps only a
    // continuously-overwritten "latest" snapshot per entity (SURVEY §2-A
    // A10/D6); this is the inverse analytic: rebuild the TYPE-2 history
    // (entity, state, valid_from, valid_to) from the append-only
    // observation log, one row per maximal run of consecutive equal
    // states in (ts, event_id) order, half-open validity [from, next
    // run's from), NULL-to for the current state. Same one-exchange fold
    // shape as the rest of this file: collect each user's observations
    // sorted (struct order (tsu, event_id, type) is a deterministic
    // total order — equal-timestamp runs cannot flap), find run starts
    // row-locally (position 0 or state ≠ previous state), and pair each
    // run start with its successor for valid_to — no fact-side window,
    // no self-join, per-user arrays bounded by user activity exactly as
    // q_funnel/q_event_transitions budget. Times leave as epoch
    // MICROSECONDS (the q_window_range discipline).
    "q_scd2_history" -> ((s, d) => scd2Of(Tables.events(s, d)))
  )

  val oracle: Map[String, String] = Map(
    // min-chained CTEs: t2's min is over clicks strictly after the user's
    // FIRST signup, which equals the Spark fold's "first click after t1"
    "q_funnel" ->
      """WITH t1 AS (SELECT user_id, MIN(ts) AS t FROM events
                     WHERE event_type = 'signup' GROUP BY 1),
              t2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
                     JOIN t1 ON e.user_id = t1.user_id
                     WHERE e.event_type = 'click' AND e.ts > t1.t GROUP BY 1),
              t3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
                     JOIN t2 ON e.user_id = t2.user_id
                     WHERE e.event_type = 'purchase' AND e.ts > t2.t GROUP BY 1)
         SELECT * FROM (VALUES
           (CAST(1 AS BIGINT), 'signup',
            (SELECT COUNT(*) FROM t1)),
           (CAST(2 AS BIGINT), 'click_after_signup',
            (SELECT COUNT(*) FROM t2)),
           (CAST(3 AS BIGINT), 'purchase_after_click',
            (SELECT COUNT(*) FROM t3))) AS v(step_no, step, users)""",

    "q_event_transitions" ->
      """WITH o AS (SELECT user_id, event_type,
                           LAG(event_type) OVER
                             (PARTITION BY user_id ORDER BY ts, event_id)
                             AS prev_type
                    FROM events)
         SELECT prev_type, event_type AS next_type, COUNT(*) AS n
         FROM o WHERE prev_type IS NOT NULL GROUP BY 1, 2""",

    "q_retention" ->
      """WITH f AS (SELECT user_id,
                           CAST(MIN(date_trunc('week', ts)) AS DATE)
                             AS cohort_week
                    FROM events GROUP BY 1),
              e AS (SELECT DISTINCT user_id,
                           CAST(date_trunc('week', ts) AS DATE) AS w
                    FROM events)
         SELECT f.cohort_week,
                CAST(datediff('day', f.cohort_week, e.w) // 7 AS BIGINT)
                  AS week_no,
                COUNT(*) AS users
         FROM e JOIN f ON e.user_id = f.user_id
         GROUP BY 1, 2""",
    "q_click_abandonment" ->
      """WITH c AS (SELECT user_id AS cu, event_id AS click_id,
                           epoch_us(ts) AS click_us
                    FROM events WHERE event_type = 'click'),
              p AS (SELECT user_id AS pu, epoch_us(ts) AS purchase_us
                    FROM events WHERE event_type = 'purchase')
         SELECT cu AS user_id, click_id, click_us
         FROM c
         WHERE NOT EXISTS (SELECT 1 FROM p
                           WHERE pu = cu AND purchase_us > click_us
                             AND purchase_us <= click_us + 3600000000)""",
    "q_click_attribution" ->
      """WITH c AS (SELECT user_id AS cu, event_id AS click_id,
                           epoch_us(ts) AS click_us
                    FROM events WHERE event_type = 'click'),
              p AS (SELECT user_id AS pu, event_id AS purchase_id,
                           epoch_us(ts) AS purchase_us, value AS amount
                    FROM events WHERE event_type = 'purchase')
         SELECT pu AS user_id, purchase_id, click_id,
                purchase_us - click_us AS gap_us, amount
         FROM c JOIN p ON cu = pu AND click_us < purchase_us
                       AND click_us >= purchase_us - 3600000000""",

    "q_heavy_hitters" ->
      """WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1),
              t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c),
              r AS (SELECT user_id, cnt,
                           ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id)
                             AS rnk
                    FROM c)
         SELECT user_id, rnk, cnt,
                CAST(cnt AS DOUBLE) / (SELECT total FROM t) AS share
         FROM r WHERE rnk <= 10""",

    "q_sessionize" ->
      """WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS tsu
                    FROM events),
              g AS (SELECT user_id, event_id, tsu,
                           CASE WHEN tsu - LAG(tsu) OVER
                                  (PARTITION BY user_id
                                   ORDER BY tsu, event_id) > 1800000000
                                  OR LAG(tsu) OVER
                                  (PARTITION BY user_id
                                   ORDER BY tsu, event_id) IS NULL
                                THEN 1 ELSE 0 END AS brk
                    FROM x)
         SELECT user_id, event_id,
                CAST(SUM(brk) OVER (PARTITION BY user_id
                  ORDER BY tsu, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_no
         FROM g""",

    "q_attribution_last" ->
      """WITH c AS (SELECT user_id AS cu, event_id AS click_id,
                           epoch_us(ts) AS click_us
                    FROM events WHERE event_type = 'click'),
              p AS (SELECT user_id AS pu, event_id AS purchase_id,
                           epoch_us(ts) AS purchase_us, value AS amount
                    FROM events WHERE event_type = 'purchase'),
              j AS (SELECT pu AS user_id, purchase_id, click_id,
                           purchase_us - click_us AS gap_us, amount,
                           ROW_NUMBER() OVER (PARTITION BY purchase_id
                             ORDER BY purchase_us - click_us, click_id)
                             AS rn
                    FROM c JOIN p ON cu = pu AND click_us < purchase_us
                                  AND click_us >= purchase_us - 3600000000)
         SELECT user_id, purchase_id, click_id, gap_us, amount
         FROM j WHERE rn = 1""",

    // Same total order as the Spark fold's sorted struct (tsu, event_id,
    // event_type); run start = first row or state change vs LAG; valid_to
    // = LEAD over the run starts (array order ≡ this window order).
    "q_scd2_history" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, event_id, event_type,
                           LAG(event_type) OVER (PARTITION BY user_id
                             ORDER BY epoch_us(ts), event_id, event_type)
                             AS prev
                    FROM events
                    WHERE event_type IS NOT NULL AND ts IS NOT NULL),
              s AS (SELECT user_id, tsu, event_id, event_type FROM e
                    WHERE prev IS NULL OR prev <> event_type)
         SELECT user_id, event_type, tsu AS valid_from_us,
                LEAD(tsu) OVER (PARTITION BY user_id
                  ORDER BY tsu, event_id, event_type) AS valid_to_us
         FROM s"""
  )
}
