package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Scale-growth harness for the r12 event/stream family (VERDICT r12 #4 —
  * the only registered families with no measured growth curve): times the
  * REGISTERED builders (EventQueries.funnelOf/transitionsOf/retentionOf/
  * attributionOf, MultimodalQueries.phashNeardupOf — the same code the
  * registered queries execute; no rebuilt copies to drift) over id-offset
  * replicated inputs at 1×/4×/16×.
  *
  * Replication scheme (the LateR12Growth mold): each copy offsets
  * `user_id`/`event_id` (events) or `doc_id` (documents) by
  * copy × (max + 1), so copies never join/group across themselves — the
  * experiment measures pure volume growth, not engineered key skew. The
  * funnel/retention/transitions shape (ONE user_id exchange + bounded
  * per-user folds) should be near-linear in rows with flat per-row cost;
  * attribution (two filtered scans + one equi-join keyed on users with
  * the hour band as residual) likewise; phash_neardup (decode + pack +
  * ONE band-key exchange) grows with media count and within-bucket pair
  * counts.
  *
  * Run: sbt "Test/runMain graft.ops.EventGrowth". Results in PERF.md.
  */
object EventGrowth {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

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

    // replicated media in Multimodal.fromDocuments' exact shape
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val maxDoc = docs.agg(max("doc_id")).head.getLong(0) + 1L
    def mediaTimes(n: Int): DataFrame =
      (0 until n).map { c =>
        docs.select(
          (col("doc_id") + lit(c * maxDoc)).as("media_id"),
          encode(col("text"), "UTF-8").as("payload"),
          struct(
            lit("image").as("media_type"), lit("fake").as("format"),
            lit(64).cast("int").as("width"), lit(64).cast("int").as("height"),
            lit(null).cast("long").as("duration_ms")).as("meta"))
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
    EventQueries.funnelOf(evTimes(1)).queryExecution.toRdd.count()
    EventQueries.transitionsOf(evTimes(1)).queryExecution.toRdd.count()
    EventQueries.retentionOf(evTimes(1)).queryExecution.toRdd.count()
    EventQueries.attributionOf(evTimes(1)).queryExecution.toRdd.count()
    EventQueries.sessionizeOf(evTimes(1)).queryExecution.toRdd.count()
    EventQueries.attributionLastOf(evTimes(1)).queryExecution.toRdd.count()
    EventQueries.heavyHittersOf(evTimes(1)).queryExecution.toRdd.count()
    MultimodalQueries.phashNeardupOf(mediaTimes(1))
      .queryExecution.toRdd.count()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))

    println(f"${"scale"}%-6s ${"events"}%9s ${"funnel_s"}%9s " +
      f"${"trans_s"}%8s ${"reten_s"}%8s ${"attrib_s"}%9s " +
      f"${"sess_s"}%7s ${"last_s"}%7s ${"hh_s"}%7s " +
      f"${"media"}%8s ${"phash_s"}%8s")
    for (n <- Seq(1, 4, 16)) {
      val e = evTimes(n)
      val nEv = e.count()
      val tF = t { EventQueries.funnelOf(e).queryExecution.toRdd.count() }
      val tT = t { EventQueries.transitionsOf(e).queryExecution.toRdd.count() }
      val tR = t { EventQueries.retentionOf(e).queryExecution.toRdd.count() }
      val tA = t { EventQueries.attributionOf(e).queryExecution.toRdd.count() }
      val tS = t { EventQueries.sessionizeOf(e).queryExecution.toRdd.count() }
      val tL = t {
        EventQueries.attributionLastOf(e).queryExecution.toRdd.count()
      }
      val tH = t {
        EventQueries.heavyHittersOf(e).queryExecution.toRdd.count()
      }
      val m = mediaTimes(n)
      val nM = m.count()
      val tP = t {
        MultimodalQueries.phashNeardupOf(m).queryExecution.toRdd.count()
      }
      println(f"${n}%-6d ${nEv}%9d ${tF}%9.3f ${tT}%8.3f ${tR}%8.3f " +
        f"${tA}%9.3f ${tS}%7.3f ${tL}%7.3f ${tH}%7.3f ${nM}%8d ${tP}%8.3f")
    }
    spark.stop()
  }
}
