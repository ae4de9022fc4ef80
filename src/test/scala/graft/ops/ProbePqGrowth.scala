package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Scale-growth harness for the r10 operators (test scope): replicates the
  * sf0.1 corpora 1x/2x/4x and times (a) the quality probe's fit pass
  * (probe_gram sufficient statistics — the corpus-sized side of
  * q_probe_fit; the driver solve is scale-constant) and (b) PQ code
  * assignment over the trained codebooks (the per-row scan that is the
  * whole corpus-side cost of q_pq_codes and the ingest path of
  * pqCodesStream). Both are single-pass bounded-state aggregations /
  * pure scans, so the expectation is ~linear wall growth — the harness
  * exists to measure that claim, not assume it.
  *
  * Documents replicate with per-copy token prefixes (disjoint vocabulary —
  * the probe's B-bucket tables are bounded regardless, but the label
  * distribution stays realistic); embeddings replicate by id offset (PQ
  * assignment cost is per-row, content-independent).
  *
  * Run: sbt "Test/runMain graft.ops.ProbePqGrowth". Results in PERF.md.
  */
object ProbePqGrowth {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val docsBase = Tables.documents(spark, sfDir).select("doc_id", "text")
    val docsMax = docsBase.agg(max("doc_id")).head.getLong(0) + 1L
    def docsTimes(n: Int): DataFrame =
      (0 until n).map { c =>
        docsBase.select((col("doc_id") + lit(c * docsMax)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"c${c}_$$1").as("text"))
      }.reduce(_ union _)

    val embBase = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val embMax = embBase.agg(max("vec_id")).head.getLong(0) + 1L
    def embTimes(n: Int): DataFrame =
      (0 until n).map { c =>
        embBase.select((col("vec_id") + lit(c * embMax)).as("vec_id"),
          col("embedding"))
      }.reduce(_ union _)

    val books = SimilarityQueries.pqCodebooks(spark, sfDir)

    def t(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up
    TextQueries.probeFit(docsTimes(1)).queryExecution.toRdd.count()
    SimilarityQueries.pqAssign(embTimes(1), books)
      .queryExecution.toRdd.count()

    println(f"${"scale"}%-6s ${"docs"}%8s ${"fit_s"}%8s " +
      f"${"vecs"}%8s ${"pq_s"}%8s")
    for (n <- Seq(1, 2, 4)) {
      val docs = docsTimes(n)
      val nDocs = docs.count()
      val tFit = t {
        TextQueries.probeFit(docs).queryExecution.toRdd.count()
      }
      val emb = embTimes(n)
      val nVecs = emb.count()
      val tPq = t {
        SimilarityQueries.pqAssign(emb, books).queryExecution.toRdd.count()
      }
      println(f"${n}x$nDocs%9s $tFit%8.2f $nVecs%8s $tPq%8.2f")
    }
    spark.stop()
  }
}
