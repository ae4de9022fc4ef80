package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway diagnostic: candidate-pair mass Σ C(bucket,2) of the synthetic
  * embedding corpus at each ScaleGrowth configuration. */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    // ONE corpus/pipeline definition shared with ScaleGrowth (ADVICE r5)
    def emb(n: Long): DataFrame = SimCorpus.emb(spark, n)
    for ((n, planes) <- Seq((25000L, 10), (100000L, 12), (400000L, 14))) {
      val sizes = emb(n)
        .select(expr(s"hplane_sig(embedding, $planes)").as("bucket"))
        .groupBy("bucket").count()
      val st = sizes.agg(
        count(lit(1)).as("nbuckets"), max("count").as("maxsz"),
        sum(expr("(count * (count - 1)) div 2")).as("cand")).head
      println(s"[probe] n=$n planes=$planes buckets=${st.getLong(0)} " +
        s"max=${st.getLong(1)} candidates=${st.getLong(2)}")
    }
    // Hypothesis check (REFUTED — kept as the methodology example): a
    // sequential 64m→8m→1m sweep suggested AQE's byte-targeted coalescing
    // was serializing the pair expansion (2.6→1.35→1.2 s). This interleaved
    // round-robin (advisory flipped per rep in ONE JVM, per PERF.md
    // methodology) shows the advisory is irrelevant — med 1.45 vs 1.40 s at
    // 100k, 4.15 vs 4.31 s at 400k — the sweep's first config had merely
    // paid the cold-codegen cost. Warm neardup time tracks candidate mass
    // (Σ C(bucket,2)) near-linearly: 0.36 s / 414k, ~1.4 s / 1.88M,
    // ~4.2 s / 8.76M. Cross-JVM and first-rep comparisons lie on this host.
    def neardup(n: Long, planes: Int): Double = {
      val pairs = SimCorpus.neardupPairs(emb(n), planes)
      val t0 = System.nanoTime()
      pairs.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    val acc = scala.collection.mutable.Map[(Long, String), List[Double]]()
      .withDefaultValue(Nil)
    neardup(100000L, 12) // warm
    for (_ <- 1 to 3; n <- Seq(100000L, 400000L); adv <- Seq("64m", "8m")) {
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", adv)
      val planes = if (n == 100000L) 12 else 14
      acc((n, adv)) = neardup(n, planes) :: acc((n, adv))
    }
    for (((n, adv), ts) <- acc.toSeq.sortBy { case ((n, a), _) => (n, a) }) {
      val s = ts.sorted
      println(f"[probe] n=$n advisory=$adv med=${s(s.size / 2)}%.2f " +
        f"min=${s.head}%.2f max=${s.last}%.2f")
    }
    spark.stop()
  }
}
