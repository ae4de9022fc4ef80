package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared synthetic embedding corpus + bucketed-neardup pipeline for the
  * measurement harnesses (ScaleGrowth, BucketProbe, AnnRecall). PERF.md
  * cross-references their numbers as one experiment, so the corpus and the
  * pipeline must be ONE definition (ADVICE r5) — vectors are deterministic
  * per-element hashes: no fixture dependency, no RNG, reproducible on any
  * partition layout. */
object SimCorpus {

  /** n deterministic 64-dim float vectors in [-1, 1): element i of row id is
    * `(hash(id, i) mod 2000 - 1000) / 1000`. */
  def emb(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      expr("""transform(sequence(1, 64),
               i -> CAST((pmod(hash(id, i), 2000) - 1000) / 1000.0 AS FLOAT))""")
        .as("embedding"))

  /** The embedding-neardup candidate pipeline both harnesses time: bucket by
    * `planes`-bit hyperplane signature, same-bucket pair join, exact-cosine
    * filter. Callers count/time the result. */
  def neardupPairs(embDf: DataFrame, planes: Int): DataFrame = {
    val e = embDf.select(col("vec_id"), col("embedding"),
      expr(s"hplane_sig(embedding, $planes)").as("bucket"),
      sqrt(expr("vector_dot(embedding, embedding)")).as("nrm"))
    val a = e.select(col("bucket"), col("vec_id").as("id_a"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("bucket"), col("vec_id").as("id_b"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .filter((expr("vector_dot(ea, eb)") / (col("na") * col("nb"))) >= 0.5)
  }
}
