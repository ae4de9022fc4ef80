package graft.ops

import org.apache.spark.sql.SparkSession

/** One-JVM interleaved A/B (PERF.md methodology rule 1): cost of the
  * always-on hot-bucket salt branch in lshPairsFromSig on an UNSKEWED
  * corpus, where the branch is empty — the double reduce-side band
  * aggregation is the suspected overhead. Flips
  * `spark.graft.lsh.salt.threshold` between default (on) and 0 (legacy
  * single-branch plan) per rep. */
object SaltOverheadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = Seq("q_lsh_pairs", "q_dedup_clusters")
    def t(q: String): Double = {
      System.gc()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir).queryExecution.toRdd.count()
      val r = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      r
    }
    queries.foreach(t) // warm
    val acc = scala.collection.mutable.Map[(String, String), List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to 5; q <- queries; mode <- Seq("on", "off")) {
      if (mode == "off") spark.conf.set("spark.graft.lsh.salt.threshold", "0")
      else spark.conf.unset("spark.graft.lsh.salt.threshold")
      acc((q, mode)) = t(q) :: acc((q, mode))
    }
    for (((q, m), ts) <- acc.toSeq.sortBy { case ((q, m), _) => (q, m) }) {
      val s = ts.sorted
      println(f"[salt] $q%-18s $m%3s med=${s(s.size / 2)}%.3f " +
        f"min=${s.head}%.3f max=${s.last}%.3f")
    }
    spark.stop()
  }
}
