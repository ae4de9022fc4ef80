package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Scale-growth experiment for the retrieval family (test scope — a
  * measurement harness, not library surface): replicates the sf0.1
  * `documents` (and, for the hybrid, `embeddings`) tables 1x/2x/4x/8x by id
  * offset and times q_bm25 / q_hybrid_rrf end-to-end at each scale.
  *
  * Unlike the dedup-family [[ScaleGrowth]], replication here keeps the TEXT
  * unchanged: BM25 has no pairwise path for duplicate content to inflate —
  * df/N grow proportionally and the scoring stays per-row — so plain volume
  * replication measures exactly the claim under test (scan + one stats
  * aggregate + heap partials scale linearly; the top-k cut is k rows per
  * partition regardless of corpus size).
  *
  * Run: sbt "Test/runMain graft.ops.RetrievalGrowth"   (SPARK_GRAFT_SF_DIR
  * to override the base corpus). Results recorded in PERF.md.
  */
object RetrievalGrowth {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val docs = Tables.documents(spark, sfDir).select("doc_id", "source", "text")
    val emb = Tables.embeddings(spark, sfDir)
    val maxDoc = docs.agg(max("doc_id")).head.getLong(0) + 1L
    val maxVec = emb.agg(max("vec_id")).head.getLong(0) + 1L

    def docsTimes(n: Int): DataFrame =
      (0 until n).map(c => docs.select(
        (col("doc_id") + lit(c * maxDoc)).as("doc_id"),
        col("source"), col("text"))).reduce(_ union _)
    def embTimes(n: Int): DataFrame =
      (0 until n).map(c => emb.select(
        (col("vec_id") + lit(c * maxVec)).as("vec_id"),
        col("embedding"), col("label"))).reduce(_ union _)

    def bm25(n: Int): DataFrame = {
      val scored = RetrievalQueries.bm25Scored(docsTimes(n))
      scored.groupBy().agg(expr("topk_by(score, doc_id, 10)").as("top"))
        .select(posexplode(col("top")).as(Seq("pos", "t")))
    }

    // r15 (VERDICT r14 #6): the full retrieval trio at 1x/4x/16x with the
    // frozen-stats SERVING tier exercised at every scale — the index
    // stats (n_docs/total_tokens/df per term) are built from the
    // replicated corpus UNTIMED (production builds them once at index
    // time) and the timed body is the serve: one feature pass + literal
    // stats + heap(s). q_bm25 stays the build-payer (stats subquery +
    // scoring pass, both timed).
    def frozenStats(docsN: DataFrame, terms: Seq[String]): Array[Long] = {
      val feats = RetrievalQueries.bm25Feats(docsN, terms)
      val aggs = RetrievalQueries.bm25StatsAggs(
        col("dl"), i => col(s"tf$i"), terms.size)
      val r = feats.agg(aggs.head, aggs.tail: _*).head()
      (Array(r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens")) ++
        terms.indices.map(i => r.getAs[Long](s"df$i"))).toArray
    }

    def bm25Multi(n: Int, st: Array[Long]): DataFrame = {
      val stackArgs = RetrievalQueries.MultiQueries.indices
        .map(q => s"${q}L, (${RetrievalQueries.multiScoreSql(q)})")
        .mkString(", ")
      RetrievalQueries.bm25Prep(docsTimes(n),
          RetrievalQueries.MultiTerms, frozen = Some(st))
        .selectExpr("doc_id",
          s"stack(${RetrievalQueries.MultiQueries.size}, $stackArgs) " +
            "AS (q_id, score)")
        .filter(col("score") > 0)
        .groupBy("q_id")
        .agg(expr("topk_by(score, doc_id, 5)").as("top"))
        .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
    }

    def hybrid(n: Int, st: Array[Long]): DataFrame = {
      val bm = RetrievalQueries.topK(
          RetrievalQueries.bm25Scored(docsTimes(n), frozen = Some(st)), 20)
        .select(col("doc_id"), RetrievalQueries.rrfContrib.as("contrib"))
      val (qv, qn) = RetrievalQueries.queryVecCached(spark, sfDir)
      val cos = embTimes(n).filter(col("vec_id") =!= 0)
        .select(col("vec_id").as("doc_id"),
          (call_function("vector_dot", col("embedding"), lit(qv)) /
            (sqrt(expr("vector_dot(embedding, embedding)")) * lit(qn)))
            .as("score"))
      val cosTop = RetrievalQueries.topK(cos, 20)
        .select(col("doc_id"), RetrievalQueries.rrfContrib.as("contrib"))
      bm.unionByName(cosTop)
        .groupBy("doc_id")
        .agg(sum("contrib").as("rrf"), count(lit(1)).as("n_lists"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(20)
    }

    // warm-up: JIT + codegen on the 1x shapes, untimed
    bm25(1).queryExecution.toRdd.count()
    TextQueries.bpeMerges(docsTimes(1)).queryExecution.toRdd.count()
    TextQueries.lmFluency(docsTimes(1)).queryExecution.toRdd.count()
    locally {
      val stM = frozenStats(docsTimes(1), RetrievalQueries.MultiTerms)
      val stQ = frozenStats(docsTimes(1), RetrievalQueries.QueryTerms)
      bm25Multi(1, stM).queryExecution.toRdd.count()
      hybrid(1, stQ).queryExecution.toRdd.count()
    }
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

    println(f"${"scale"}%-6s ${"docs"}%9s ${"bm25_s"}%8s ${"multi_s"}%8s ${"rrf_s"}%8s")
    for (n <- Seq(1, 4, 16)) {
      val nDocs = docsTimes(n).count()
      val stM = frozenStats(docsTimes(n), RetrievalQueries.MultiTerms)
      val stQ = frozenStats(docsTimes(n), RetrievalQueries.QueryTerms)
      val t0 = System.nanoTime()
      bm25(n).queryExecution.toRdd.count()
      val tB = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      bm25Multi(n, stM).queryExecution.toRdd.count()
      val tM = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      hybrid(n, stQ).queryExecution.toRdd.count()
      val tR = (System.nanoTime() - t2) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      println(f"${n.toString + "x"}%-6s $nDocs%9d $tB%8.2f $tM%8.2f $tR%8.2f")
    }

    // bpe with UNPREFIXED replication: the vocabulary is constant while
    // the corpus grows, so the vocab-bound rounds should stay flat and
    // only the single v0 token-aggregate scan should grow — measuring the
    // "BPE training is vocab-bound, not corpus-bound" claim directly
    // lm_fluency with unprefixed replication: every count scales ×n so
    // the fixed-point RATIOS (weights, cm) are invariant — growth
    // measures exactly the two linear scans + the bounded fit aggregate
    // (r8 numbers stand in PERF.md; pass "legacy" to re-run)
    if (args.contains("legacy")) {
    println(f"${"scale"}%-6s ${"docs"}%9s ${"bm25_s"}%8s ${"rows"}%5s ${"bpe_s"}%8s ${"lm_s"}%8s")
    for (n <- Seq(1, 2, 4, 8)) {
      val nDocs = docsTimes(n).count()
      val t0 = System.nanoTime()
      val rows = bm25(n).queryExecution.toRdd.count()
      val t = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      TextQueries.bpeMerges(docsTimes(n)).queryExecution.toRdd.count()
      val tb = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      TextQueries.lmFluency(docsTimes(n)).queryExecution.toRdd.count()
      val tl = (System.nanoTime() - t2) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      println(f"${n.toString + "x"}%-6s $nDocs%9d $t%8.2f $rows%5d $tb%8.2f $tl%8.2f")
    }
    }
    spark.stop()
  }
}
