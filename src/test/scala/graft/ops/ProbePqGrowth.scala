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
    val cents = SimilarityQueries.kmeansCentroidsCached(spark, sfDir)
    val resBooks = SimilarityQueries.pqCodebooksResidual(spark, sfDir)
    val queries = graft.tables.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 5).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

    def t(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    /** The residual-PQ TRAIN's corpus side at scale: residual projection →
      * assignment → the ONE narrow (m, cell, subpos) scaled-integer
      * aggregate (its ≤ M·K·sub output rows are the part the real op
      * collects — bounded, excluded here). */
    def residualTrain(e: DataFrame): DataFrame = {
      val sub = 64 / 4
      SimilarityQueries.pqAssign(
          SimilarityQueries.pqResiduals(e, cents), resBooks,
          vecCol = "residual")
        .select(Seq(col("code0"), col("code1"), col("code2"), col("code3"),
          posexplode(col("residual")).as(Seq("pos", "x"))): _*)
        .select(
          expr(s"CAST(pos DIV $sub AS INT)").as("m"),
          expr(s"element_at(array(code0, code1, code2, code3)," +
            s" CAST(pos DIV $sub AS INT) + 1)").as("cell"),
          expr(s"pos % $sub").as("subpos"),
          col("x"))
        .groupBy("m", "cell", "subpos")
        .agg((sum(expr("CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)"))
          .cast("double") / (count(lit(1)) * 1000000.0)).as("c"))
    }

    /** The two-stage shortlist + exact re-rank over a given corpus — the
      * registered q_ann_pq_rerank body parameterized by the embeddings
      * frame (standing-index codebooks + fixture queries, like the real
      * serving path). */
    def rerank(e: DataFrame): DataFrame = {
      val codes = SimilarityQueries.pqAssign(e, books).drop("embedding")
      val r = SimilarityQueries.RerankShortlist
      val shortlist = codes
        .select(col("vec_id"), filter(array(queries.map { case (qid, qv) =>
          when(col("vec_id") =!= lit(qid),
            struct(lit(qid).as("q_id"),
              SimilarityQueries.adcScoreExpr(books, qv).as("score")))
        }: _*), x => x.isNotNull).as("qs"))
        .select(col("vec_id").as("neighbor_id"), explode(col("qs")).as("q"))
        .select(col("q.q_id").as("q_id"), col("neighbor_id"),
          col("q.score").as("score"))
        .groupBy("q_id")
        .agg(expr(s"topk_by(score, neighbor_id, $r)").as("top"))
        .select(col("q_id"), explode(col("top.id")).as("neighbor_id"))
      e.join(broadcast(shortlist), e("vec_id") === shortlist("neighbor_id"))
        .select(col("q_id"), col("neighbor_id"),
          coalesce(queries.map { case (qid, qv) =>
            when(col("q_id") === lit(qid),
              call_function("vector_dot", col("embedding"),
                typedLit(qv.toSeq)))
          }: _*).as("score"))
        .groupBy("q_id")
        .agg(expr("topk_by(score, neighbor_id, 3)").as("top"))
    }

    // warm-up
    TextQueries.probeFit(docsTimes(1)).queryExecution.toRdd.count()
    SimilarityQueries.pqAssign(embTimes(1), books)
      .queryExecution.toRdd.count()
    residualTrain(embTimes(1)).queryExecution.toRdd.count()
    rerank(embTimes(1)).queryExecution.toRdd.count()

    println(f"${"scale"}%-6s ${"docs"}%8s ${"fit_s"}%8s " +
      f"${"vecs"}%8s ${"pq_s"}%8s ${"restrain_s"}%10s ${"rerank_s"}%9s")
    for (n <- Seq(1, 2, 4, 8, 16)) {
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
      val tRes = t { residualTrain(emb).queryExecution.toRdd.count() }
      val tRr = t { rerank(emb).queryExecution.toRdd.count() }
      println(f"${n}x$nDocs%9s $tFit%8.2f $nVecs%8s $tPq%8.2f " +
        f"$tRes%10.2f $tRr%9.2f")
    }
    spark.stop()
  }
}
