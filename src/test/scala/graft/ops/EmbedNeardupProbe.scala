package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}

/** Floor decomposition for q_embed_neardup (VERDICT r11 #1 — carried
  * since r9 with no current measurement). The registered plan
  * (`ops/SimilarityQueries.scala` q_embed_neardup) is:
  *
  *   scan embeddings → ScaleOps.spread (ROUND-ROBIN EXCHANGE when the
  *   parquet arrives in < 32 partitions — it always does at fixture
  *   scale) → project (hplane_sig, norm) → EXCHANGE by bucket →
  *   ObjectHashAggregate(sort_array(collect_list(struct))) → Generate
  *   (per-bucket i<j pair expansion, cosine filtered in-HOF) → project
  *
  * Interleaved stages, one JVM (PERF.md methodology rule 1):
  *   count      — bare embeddings scan floor
  *   proj       — + the sig/norm projection (NO spread: measures whether
  *                the single-task projection is material at fixture scale)
  *   agg        — + bucket exchange + collect_list/sort_array (no expand)
  *   nospread   — the FULL body minus ScaleOps.spread: at 100 TB spread
  *                is a no-op (a wide scan already has ≥ executor-count
  *                partitions); at fixture scale it is one extra full-data
  *                exchange+stage. If nospread ≈ full − one stage floor,
  *                the spread exchange is pure local-mode overhead and the
  *                registered query should drop it (the bucket exchange
  *                already distributes the quadratic expansion work).
  *   full       — the registered q_embed_neardup
  *
  * Usage: Test/runMain graft.ops.EmbedNeardupProbe <sfDir> [reps]
  */
object EmbedNeardupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def t(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    def projected(src: DataFrame): DataFrame =
      src.select(col("vec_id"), col("embedding"),
        expr("hplane_sig(embedding, 8)").as("bucket"),
        sqrt(expr("vector_dot(embedding, embedding)")).as("n"))

    def aggregated(src: DataFrame): DataFrame =
      projected(src)
        .groupBy("bucket")
        .agg(sort_array(collect_list(
          struct(col("vec_id"), col("embedding"), col("n")))).as("ms"))

    def expanded(src: DataFrame): DataFrame =
      aggregated(src)
        .select(col("bucket"), explode(expr(
          "flatten(transform(ms, (a, __i) ->" +
            " filter(transform(slice(ms, __i + 2, size(ms) - __i - 1)," +
            " b -> named_struct('id_a', a.vec_id, 'id_b', b.vec_id," +
            " 'cos', vector_dot(a.embedding, b.embedding) / (a.n * b.n)))," +
            " p -> p.cos >= 0.25)))")).as("p"))
        .select(col("bucket"), col("p.id_a"), col("p.id_b"), col("p.cos"))

    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to reps) {
      acc("count") ::= t { emb.queryExecution.toRdd.count() }
      acc("proj") ::= t { projected(emb).queryExecution.toRdd.count() }
      acc("agg") ::= t { aggregated(emb).queryExecution.toRdd.count() }
      acc("nospread") ::= t { expanded(emb).queryExecution.toRdd.count() }
      acc("full") ::= t {
        SparkEntry.queries("q_embed_neardup")(spark, sfDir)
          .queryExecution.toRdd.count()
      }
    }
    for (name <- Seq("count", "proj", "agg", "nospread", "full")) {
      val vs = acc(name).sorted
      println(f"PROBE $name%-10s min=${vs.head}%.3f med=${vs(vs.size / 2)}%.3f")
    }
    spark.stop()
  }
}
