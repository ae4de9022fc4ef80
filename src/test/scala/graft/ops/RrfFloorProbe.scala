package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}

/** Stage-by-stage floor decomposition for q_hybrid_rrf (VERDICT r11 #2 —
  * 7.8× median vs its twin after the twin fell; the r8 "two composed
  * scoring pipelines + stage floors" account predates the BM25 diet and
  * needs re-measuring, not re-citing).
  *
  * The registered plan runs, per execution:
  *   [subquery job 1] BM25 corpus stats (tokenize documents, 1-row agg)
  *   [subquery job 2] query-vector probe (scan embeddings for vec_id=0)
  *   [main job]       documents scored → ungrouped topk heap (EXCHANGE to
  *                    1) → posexplode → contrib   UNION   embeddings
  *                    scored → second ungrouped heap (EXCHANGE to 1) →
  *                    posexplode → contrib → EXCHANGE by doc_id → agg →
  *                    TakeOrderedAndProject
  *
  * Interleaved variants, one JVM:
  *   count      — bare documents scan floor
  *   bm-top     — the BM25 side alone: topK(bm25Scored, 20)
  *   cos-top    — the cosine side alone (query-vector subquery included)
  *   full       — the registered q_hybrid_rrf
  *   fused      — ONE grouped heap for both sides: tag each scored stream
  *                with a side id, union BEFORE the heap, groupBy(side)
  *                topk_by — replaces the two single-partition exchanges
  *                with one hash exchange (2 groups), same subqueries
  *   fused-qlit — fused + the query vector/norm as plan LITERALS (the
  *                headVecs frozen-model argument: a production hybrid
  *                serving path holds the query embedding in hand — it
  *                arrives with the request; scanning the corpus for it
  *                per execution is a fixture artifact). Kills subquery
  *                job 2 and its embeddings scan.
  *   all-lit    — fused-qlit + BM25 stats as literals: the zero-subquery
  *                endpoint (stats are INDEX-build state in a production
  *                BM25 — precomputed once, not per query). Bounds what a
  *                fully frozen serving path could reach.
  *
  * Usage: Test/runMain graft.ops.RrfFloorProbe <sfDir> [reps]
  */
object RrfFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.tables.Tables

    def docs = Tables.documents(spark, sfDir)
    def emb = Tables.embeddings(spark, sfDir)

    def t(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    // ---- shared pieces -------------------------------------------------
    def cosScored(q: Column): DataFrame =
      emb.filter(col("vec_id") =!= 0)
        .select(col("vec_id").as("doc_id"),
          (call_function("vector_dot", col("embedding"), q.getField("qe")) /
            (sqrt(expr("vector_dot(embedding, embedding)")) * q.getField("nq")))
            .as("score"))

    def qSubquery: Column = emb.filter(col("vec_id") === 0)
      .select(struct(col("embedding").as("qe"),
        sqrt(expr("vector_dot(embedding, embedding)")).as("nq")).as("s"))
      .scalar()

    // the literal query vector — collected ONCE outside the timed loop
    // (the frozen-model read a production path does at session start)
    val qRow = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head()
    val qVec = qRow.getAs[scala.collection.Seq[Float]]("embedding").toArray
    val qNorm = math.sqrt(SimilarityQueries.dotLocal(qVec, qVec))
    def qLiteral: Column = struct(
      lit(qVec).as("qe"), lit(qNorm).as("nq"))

    def contribOf(df: DataFrame): DataFrame =
      df.select(col("doc_id"), RetrievalQueries.rrfContrib.as("contrib"))

    def fuse(parts: DataFrame): DataFrame =
      parts
        .groupBy("doc_id")
        .agg(sum("contrib").as("rrf"), count(lit(1)).as("n_lists"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(20)

    // one grouped heap over both sides' scored streams
    def fusedBody(cosSrc: Column, bmSide: DataFrame): DataFrame = {
      val tagged = bmSide.select(lit(0L).as("side"), col("doc_id"), col("score"))
        .unionByName(cosScored(cosSrc)
          .select(lit(1L).as("side"), col("doc_id"), col("score")))
      val tops = tagged
        .groupBy("side")
        .agg(expr("topk_by(score, doc_id, 20)").as("top"))
        .select(col("side"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("t.id").as("doc_id"),
          (lit(1.0) / (lit(60L) + col("pos") + 1L)).as("contrib"))
      fuse(tops)
    }

    // BM25 stats as literals (collected once outside the timed loop)
    val statsRow = {
      val feats = docs.filter(col("text").isNotNull)
        .select(expr("query_term_stats(text, 'spark', 'window', 'merge', 'customer')").as("q"))
        .select(col("q.dl").as("dl") ::
          (0 until 4).map(i => col(s"q.tf$i").as(s"tf$i")).toList: _*)
      val aggs = RetrievalQueries.bm25StatsAggs(col("dl"), i => col(s"tf$i"))
      feats.agg(aggs.head, aggs.tail: _*).head()
    }
    def bmScoredLit: DataFrame = {
      val nDocs = statsRow.getAs[Long]("n_docs")
      val totTok = statsRow.getAs[Long]("total_tokens")
      docs.filter(col("text").isNotNull)
        .select(col("doc_id"),
          expr("query_term_stats(text, 'spark', 'window', 'merge', 'customer')").as("q"))
        .select(col("doc_id") :: col("q.dl").as("dl") ::
          (0 until 4).map(i => col(s"q.tf$i").as(s"tf$i")).toList: _*)
        .withColumn("n_docs", lit(nDocs))
        .withColumn("avgdl", lit(totTok).cast("double") / lit(nDocs))
        .withColumns((0 until 4).map(i =>
          s"df$i" -> lit(statsRow.getAs[Long](s"df$i"))).toMap)
        .withColumn("score", expr(RetrievalQueries.scoreSql))
        .filter(col("score") > 0)
        .select(col("doc_id"), col("score"))
    }

    def bmScoredSub: DataFrame = RetrievalQueries.bm25Scored(docs)

    // ---- the interleaved loop ------------------------------------------
    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to reps) {
      acc("count") ::= t { docs.queryExecution.toRdd.count() }
      acc("bm-top") ::= t {
        RetrievalQueries.topK(bmScoredSub, 20).queryExecution.toRdd.count()
      }
      acc("cos-top") ::= t {
        RetrievalQueries.topK(cosScored(qSubquery), 20)
          .queryExecution.toRdd.count()
      }
      acc("full") ::= t {
        SparkEntry.queries("q_hybrid_rrf")(spark, sfDir)
          .queryExecution.toRdd.count()
      }
      acc("fused") ::= t {
        fusedBody(qSubquery, bmScoredSub).queryExecution.toRdd.count()
      }
      acc("fused-qlit") ::= t {
        fusedBody(qLiteral, bmScoredSub).queryExecution.toRdd.count()
      }
      acc("all-lit") ::= t {
        fusedBody(qLiteral, bmScoredLit).queryExecution.toRdd.count()
      }
      // the registered two-heap shape, both frozen-model literals — the
      // candidate promotion: does the one-heap fusion still matter once
      // the subqueries are gone?
      acc("2heap-lit") ::= t {
        contribOf(RetrievalQueries.topK(bmScoredLit, 20))
          .unionByName(contribOf(RetrievalQueries.topK(cosScored(qLiteral), 20)))
          .transform(fuse)
          .queryExecution.toRdd.count()
      }
    }
    for (name <- Seq("count", "bm-top", "cos-top", "full", "fused",
        "fused-qlit", "all-lit", "2heap-lit")) {
      val vs = acc(name).sorted
      println(f"PROBE $name%-10s min=${vs.head}%.3f med=${vs(vs.size / 2)}%.3f")
    }
    spark.stop()
  }
}
