package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}

/** Turns VERDICT r9 #4's q_dedup_delta hypothesis into a measurement.
  *
  * The hypothesis: "the two scalar-subquery stages (k-scalar's two jobs)
  * look mergeable into the band aggregate's pass" — i.e. deleting the
  * in-plan `0.8·max(doc_id)` watermark scalar should recover ~2 of the 6
  * decomposed job floors (~0.24 s) and bring the query under 2× its twin.
  *
  * This probe interleaves, in ONE JVM (PERF.md methodology rule 1):
  *   count     — bare `docs.count()` scan floor
  *   sig-scan  — the 64-perm signature projection alone
  *   k-scalar  — the watermark subquery run standalone as its own action
  *   body(lit) — the FULL dedup body with k hardcoded as a literal
  *               (the "merged" endpoint: zero subquery stages in the plan)
  *   full      — the registered q_dedup_delta, in-plan scalar and all
  *
  * Measured r10 (sf0.1, min-of-7): count 0.10, sig-scan 0.23,
  * k-scalar 0.18 standalone, body(lit) 0.65, full 0.63 — body(lit) and
  * full are equal within noise, so the scalar costs ~0 IN CONTEXT (its
  * standalone 0.18 s is almost entirely the per-action floor, which the
  * main query pays anyway) and the hypothesized diet is a measured
  * NEGATIVE. The residual over the twin lives in the irreducible
  * 3-stage/2-exchange body: signature scan (0.23) + band exchange +
  * bucket-agg/expand + doc_id exchange + final agg (~0.42 across the
  * remaining stages at the ~0.12–0.2 s local per-stage floor). See
  * PERF.md "r10 q_dedup_delta floor decomposition".
  *
  * Usage: Test/runMain graft.ops.DeltaFloorProbe <sfDir> [reps]
  */
object DeltaFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def t(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    val kLit: Long = docs.select((max("doc_id") * lit(0.8)).cast("long"))
      .head().getLong(0)

    def bodyLiteral(): DataFrame =
      DedupQueries.dedupDeltaFromTagged(docs
        .withColumn("side", (col("doc_id") >= kLit).cast("int"))
        .select(col("doc_id"), expr("shingle_sig(text)").as("g"), col("side"))
        .select(col("doc_id"), col("g.mh0"), col("g.mh1"), col("g.mh2"),
          col("g.mh3"), col("g").isNotNull.as("hs"), col("side")))

    // interleaved: variant-major drift would mis-rank the variants
    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to reps) {
      acc("count") ::= t { docs.queryExecution.toRdd.count() }
      acc("sig-scan") ::= t {
        docs.select(col("doc_id"), expr("shingle_sig(text)").as("g"))
          .queryExecution.toRdd.count()
      }
      acc("k-scalar") ::= t {
        docs.select((max("doc_id") * lit(0.8)).cast("long")).head()
      }
      acc("body(lit)") ::= t { bodyLiteral().queryExecution.toRdd.count() }
      acc("full") ::= t {
        SparkEntry.queries("q_dedup_delta")(spark, sfDir)
          .queryExecution.toRdd.count()
      }
    }
    for (name <- Seq("count", "sig-scan", "k-scalar", "body(lit)", "full")) {
      val vs = acc(name).sorted
      println(f"PROBE $name%-10s min=${vs.head}%.3f med=${vs(vs.size / 2)}%.3f")
    }
    spark.stop()
  }
}
