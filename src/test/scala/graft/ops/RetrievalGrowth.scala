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

    // warm-up: JIT + codegen on the 1x shapes, untimed
    bm25(1).queryExecution.toRdd.count()
    TextQueries.bpeMerges(docsTimes(1)).queryExecution.toRdd.count()
    TextQueries.lmFluency(docsTimes(1)).queryExecution.toRdd.count()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

    // bpe with UNPREFIXED replication: the vocabulary is constant while
    // the corpus grows, so the vocab-bound rounds should stay flat and
    // only the single v0 token-aggregate scan should grow — measuring the
    // "BPE training is vocab-bound, not corpus-bound" claim directly
    // lm_fluency with unprefixed replication: every count scales ×n so
    // the fixed-point RATIOS (weights, cm) are invariant — growth
    // measures exactly the two linear scans + the bounded fit aggregate
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
    spark.stop()
  }
}
