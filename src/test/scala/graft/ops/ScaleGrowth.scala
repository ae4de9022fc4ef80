package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Scale-growth experiment main (test scope — a measurement harness, not
  * library surface): replicates the sf0.1 `documents` corpus 1x/2x/4x/8x and
  * times the dedup-family heavy path (MinHash signatures -> banded-LSH pairs
  * -> connected-component clustering) at each scale.
  *
  * Replication is id-offset AND per-copy word-prefixed
  * (`regexp_replace(text, '(\S+)', 'c<i>_$1')`), so every copy occupies a
  * DISJOINT shingle space: buckets don't grow with the copy count and the
  * experiment measures pure data-volume scaling of the real plans — the
  * "would this survive 10x/100x?" question — rather than engineered skew
  * (cross-copy duplicate text would inflate every LSH bucket by the copy
  * count and pair expansion quadratically, which is a different, already
  * salting-guarded failure mode).
  *
  * Run: sbt "Test/runMain graft.ops.ScaleGrowth"   (SPARK_GRAFT_SF_DIR to
  * override the base corpus). Results recorded in PERF.md.
  */
object ScaleGrowth {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.documents(spark, sfDir).select("doc_id", "text", "source")
    val maxId = base.agg(max("doc_id")).head.getLong(0) + 1L

    def corpusTimes(n: Int): DataFrame =
      (0 until n).map { c =>
        base.select(
          (col("doc_id") + lit(c * maxId)).as("doc_id"),
          // distinct shingle space per copy: prefix every token
          regexp_replace(col("text"), "(\\S+)", s"c${c}_$$1").as("text"),
          col("source"))
      }.reduce(_ union _)

    // untimed warm-up: JIT + codegen infra on the 1x shapes
    DedupQueries.lshPairsOf(corpusTimes(1)).queryExecution.toRdd.count()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

    println(f"${"scale"}%-6s ${"docs"}%8s ${"pairs_s"}%8s ${"pairs_n"}%9s " +
      f"${"cc_s"}%8s ${"clusters"}%9s")
    for (n <- Seq(1, 2, 4, 8)) {
      val docs = corpusTimes(n)
      val nDocs = docs.count()

      val t0 = System.nanoTime()
      val nPairs = DedupQueries.lshPairsOf(docs).queryExecution.toRdd.count()
      val tPairs = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

      val t1 = System.nanoTime()
      val labels = DedupQueries.clusterLabels(
        docs.select("doc_id"),
        DedupQueries.lshPairsOf(docs).select("doc_a", "doc_b"))
      val nClusters = labels.select("cluster").distinct().count()
      val tCc = (System.nanoTime() - t1) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

      println(f"${n}%-6d ${nDocs}%8d ${tPairs}%8.2f ${nPairs}%9d " +
        f"${tCc}%8.2f ${nClusters}%9d")
    }

    // ---- decontamination: corpus side grows, benchmark side constant ----
    // Only copy 0 holds ids < 50, so the broadcast bench gram set is
    // IDENTICAL at every scale and the measurement isolates the corpus
    // side: scan + per-row word_grams + broadcast probe should grow
    // linearly with docs, and the hit count stays constant (the word
    // prefix keeps copies in disjoint gram spaces).
    println(f"\n${"scale"}%-6s ${"docs"}%8s ${"decon_s"}%8s ${"hits"}%6s")
    CorpusQueries.decontaminate(corpusTimes(1), 50L)
      .queryExecution.toRdd.count() // warm-up
    for (n <- Seq(1, 2, 4, 8)) {
      val docs = corpusTimes(n)
      val nDocs = docs.count()
      val t0 = System.nanoTime()
      val hits = CorpusQueries.decontaminate(docs, 50L)
        .queryExecution.toRdd.count()
      val tD = (System.nanoTime() - t0) / 1e9
      println(f"${n}%-6d ${nDocs}%8d ${tD}%8.2f ${hits}%6d")
    }

    // ---- chunk -> pack -> tfidf: the r6 pre-tokenization chain ----
    // chunk/tfidf are scan-bound by design (per-row explode; counts with
    // map-side combine) and must grow linearly. pack's window sorts within
    // (source, md5-shard) partitions whose COUNT is fixed while their SIZE
    // grows with the corpus — the in-shard n log n is the predicted
    // super-linear term, and this measures how much of it shows at 8x
    // (in production the shard count would scale with the corpus, holding
    // shard size roughly constant).
    println(f"\n${"scale"}%-6s ${"docs"}%8s ${"chunk_s"}%8s ${"chunks"}%9s " +
      f"${"pack_s"}%8s ${"tfidf_s"}%8s")
    // warm up ALL THREE pipelines (same discipline as the other sections:
    // a cold 1x iteration pays codegen and reads as an inverted curve)
    CorpusQueries.chunks(corpusTimes(1)).queryExecution.toRdd.count()
    CorpusQueries.pack(corpusTimes(1)).queryExecution.toRdd.count()
    TextQueries.docTfidf(corpusTimes(1)).queryExecution.toRdd.count()
    for (n <- Seq(1, 2, 4, 8)) {
      val docs = corpusTimes(n)
      val nDocs = docs.count()
      val t0 = System.nanoTime()
      val nChunks = CorpusQueries.chunks(docs).queryExecution.toRdd.count()
      val tCh = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      CorpusQueries.pack(docs).queryExecution.toRdd.count()
      val tPk = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      TextQueries.docTfidf(docs).queryExecution.toRdd.count()
      val tTf = (System.nanoTime() - t2) / 1e9
      println(f"${n}%-6d ${nDocs}%8d ${tCh}%8.2f ${nChunks}%9d " +
        f"${tPk}%8.2f ${tTf}%8.2f")
    }

    // ---- similarity family: synthetic embedding corpus, 25k -> 400k ----
    // Vectors are deterministic per-element hashes (no fixture dependency,
    // no RNG — reproducible on any layout). The hyperplane count RISES with
    // the corpus so per-bucket density stays ~constant: that is the
    // documented LSH scale argument ("more corpus means more buckets at the
    // same density"), and this measures it instead of asserting it.
    graft.functions.GraftFunctions.register(spark)
    // corpus + neardup pipeline shared with BucketProbe/AnnRecall via
    // SimCorpus — PERF.md cites all three as one experiment (ADVICE r5)
    def emb(n: Long): DataFrame = SimCorpus.emb(spark, n)

    // (A byte-targeted-AQE-coalescing hypothesis for an apparent 100k
    // anomaly was REFUTED by BucketProbe's interleaved advisory A/B —
    // 64m vs 8m med 1.45 vs 1.40 s at 100k, 4.15 vs 4.31 s at 400k. The
    // anomaly was cold-codegen + cross-JVM host drift; warm times track
    // candidate mass near-linearly with no conf change needed.)
    println(f"\n${"vecs"}%8s ${"planes"}%6s ${"neardup_s"}%9s ${"pairs"}%9s " +
      f"${"ivf_s"}%8s")
    // same warm-up discipline as the dedup section: the first similarity
    // iteration otherwise pays the synthetic-corpus + hplane codegen cold
    for ((n, planes) <- Seq((25000L, 0), (25000L, 10), (100000L, 12),
                            (400000L, 14))) {
      val warmup = planes == 0
      val nPlanes = if (warmup) 10 else planes
      val t0 = System.nanoTime()
      val nPairs = SimCorpus.neardupPairs(emb(n), nPlanes)
        .queryExecution.toRdd.count()
      val tNd = (System.nanoTime() - t0) / 1e9

      // IVF assignment: per-row argmax over 16 broadcast centroid literals
      // (the r5 zero-shuffle form q_ann_ivf/q_ivf_kmeans use)
      val cents = emb(16).collect().map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]](1).toArray))
      val cand = cents.map { case (cid, ce) =>
        struct(
          (call_function("vector_dot", col("embedding"), typedLit(ce)) -
            lit(SimilarityQueries.dotLocal(ce, ce)) / 2).as("s"),
          lit(-cid).as("n"))
      }
      val t1 = System.nanoTime()
      emb(n).select(col("vec_id"),
          negate(greatest(cand: _*).getField("n")).as("cell"))
        .queryExecution.toRdd.count()
      val tIvf = (System.nanoTime() - t1) / 1e9
      if (!warmup)
        println(f"${n}%8d ${nPlanes}%6d ${tNd}%9.2f ${nPairs}%9d ${tIvf}%8.2f")
    }
    spark.stop()
  }
}
