package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Similarity search over the `embeddings` table (`Array[Float]` vectors).
  *
  * Two paths, matching the LLM-pipeline brief:
  * - **brute-force top-k** (`q_cosine_topk`): the query set is broadcast and
  *   scores stream over the corpus — correct baseline; linear in corpus
  *   size, never materializes the corpus×corpus product;
  * - **LSH-bucketed ANN** (`q_ann_lsh`): random-hyperplane signatures bucket
  *   the corpus; candidates come from an equi-join on the bucket key, then
  *   exact cosine re-ranks. At 100 TB the bucket join is the only shape that
  *   survives — the per-bucket fan-out replaces the corpus scan per query.
  *
  * All arithmetic is float-multiply / double-accumulate **in element order**
  * (the native codegen'd [[graft.functions.FloatVectorDot]] expression),
  * which is bit-identical to the
  * DuckDB oracle's `SUM(CAST(x*y AS DOUBLE))` over zipped UNNESTs — so even
  * the floating-point scores hash-match.
  */
object SimilarityQueries {

  /** dot(a,b): float products, double accumulation, element order — via the
    * native codegen'd [[graft.functions.FloatVectorDot]] (bit-identical to
    * the `aggregate(zip_with(...))` HOF form it replaced, minus the
    * per-element lambda interpretation). */
  private def dotCol(a: String, b: String) = expr(s"vector_dot($a, $b)")

  private def cosineScored(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s) // driver-owned sessions too
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    e.select(col("vec_id").as("neighbor_id"), col("embedding").as("emb"))
      .join(broadcast(q), col("neighbor_id") =!= col("q_id"))
      .select(col("q_id"), col("neighbor_id"),
        (dotCol("emb", "qe") /
          (sqrt(dotCol("emb", "emb")) * sqrt(dotCol("qe", "qe")))).as("score"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-10 for 5 broadcast query vectors.
    "q_cosine_topk" -> ((s, d) => {
      val w = Window.partitionBy("q_id")
        .orderBy(col("score").desc, col("neighbor_id").asc)
      cosineScored(s, d)
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 10)
        .select("q_id", "neighbor_id", "rnk", "score")
    }),

    // Per-vector L2 norm + dimension — the cheap full-corpus feature pass.
    "q_vector_norms" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      Tables.embeddings(s, d).select(
        col("vec_id"), col("label"),
        sqrt(dotCol("embedding", "embedding")).as("l2_norm"),
        size(col("embedding")).as("dim"))
    }),

    // ANN via 8-bit random-hyperplane LSH: deterministic hyperplane signs
    // from md5(plane:dim) — precomputed ONCE on the driver and shipped as a
    // literal matrix (they are row-independent; evaluating 8×dim md5s per
    // row would burn hashing on constants). Bucket join, exact re-rank,
    // top-3 per query within its bucket. No oracle (the bucketing is an
    // engine-side design choice; driver records rows-only) — correctness of
    // the underlying scoring is covered by q_cosine_topk.
    "q_ann_lsh" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val e = Tables.embeddings(s, d)
      // sign_p(v) = sign(Σ_i v[i] * h(p, i)), h ∈ {+1, -1} from md5 parity.
      val md = java.security.MessageDigest.getInstance("MD5")
      def hSign(p: Int, i: Int): Double = {
        val hex = md.digest(s"$p:$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (("0123456789abcdef".indexOf(hex.charAt(0))) % 2) * 2.0 - 1.0
      }
      val planes: Seq[Seq[Double]] =
        (0 until 8).map(p => (1 to 512).map(i => hSign(p, i)))
      val sigExpr = expr(
        """aggregate(sequence(0, 7), CAST(0 AS INT), (acc, p) ->
             acc + CAST(shiftleft(
               CASE WHEN aggregate(zip_with(embedding,
                      slice(element_at(hplanes, p + 1), 1, size(embedding)),
                      (x, h) -> CAST(x AS DOUBLE) * h),
                    CAST(0 AS DOUBLE), (acc2, t) -> acc2 + t) >= 0
               THEN 1 ELSE 0 END, p) AS INT))""")
      val bucketed = e
        .withColumn("hplanes", typedLit(planes))
        .select(col("vec_id"), col("embedding"), sigExpr.as("bucket"))
      val q = bucketed.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
          col("bucket"))
      val cand = bucketed
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("emb"),
          col("bucket"))
        .join(broadcast(q), Seq("bucket"))
        .filter(col("neighbor_id") =!= col("q_id"))
      val w = Window.partitionBy("q_id")
        .orderBy(col("score").desc, col("neighbor_id").asc)
      cand
        .select(col("q_id"), col("neighbor_id"), col("bucket"),
          (dotCol("emb", "qe") /
            (sqrt(dotCol("emb", "emb")) * sqrt(dotCol("qe", "qe")))).as("score"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("q_id", "neighbor_id", "bucket", "rnk", "score")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings
                    WHERE vec_id < 5),
          p AS (SELECT q.q_id, e.vec_id AS neighbor_id, e.embedding AS emb, q.qe
                FROM embeddings e, q WHERE e.vec_id <> q.q_id),
          t AS (SELECT q_id, neighbor_id, UNNEST(emb) AS x, UNNEST(qe) AS y
                FROM p),
          sc AS (SELECT q_id, neighbor_id,
                        SUM(CAST(x * y AS DOUBLE)) AS dot,
                        SUM(CAST(x * x AS DOUBLE)) AS nx,
                        SUM(CAST(y * y AS DOUBLE)) AS ny
                 FROM t GROUP BY 1, 2),
          r AS (SELECT q_id, neighbor_id,
                       dot / (sqrt(nx) * sqrt(ny)) AS score,
                       ROW_NUMBER() OVER (PARTITION BY q_id
                         ORDER BY dot / (sqrt(nx) * sqrt(ny)) DESC,
                                  neighbor_id) AS rnk
                FROM sc)
          SELECT q_id, neighbor_id, rnk, score FROM r WHERE rnk <= 10""",
    "q_vector_norms" ->
      """SELECT vec_id, label, sqrt(nx) AS l2_norm, dim FROM (
           SELECT vec_id, label, SUM(CAST(x * x AS DOUBLE)) AS nx,
                  COUNT(*) AS dim
           FROM (SELECT vec_id, label, UNNEST(embedding) AS x FROM embeddings) t
           GROUP BY vec_id, label) s"""
  )
}
