package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession

/** Interleaved A/B microbench — the measurement methodology behind PERF.md.
  *
  * `graft.Bench` times each query's reps back-to-back, so when host load
  * drifts during the run, two queries' medians are measured under DIFFERENT
  * conditions and cannot be compared. This main times the named queries
  * ROUND-ROBIN in one JVM: every rep of every query sees the same drift, so
  * relative numbers stay trustworthy on a loaded host (cross-invocation
  * comparisons were measured swinging 3× — see PERF.md). Plan variants
  * under evaluation are registered as temporary queries or hacked in here
  * before being promoted to the library.
  *
  * Usage: `runMain graft.AB <sfDir> <q1,q2,...> [reps]`
  */
object AB {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.AB <sfDir> <q1,q2,...> [reps]")
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")

    def t(df: => DataFrame): Double = {
      System.gc()
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count() // full materialization, as in Bench
      val r = (System.nanoTime() - t0) / 1e9
      // same block hygiene as Bench: iterative queries must not leak
      // checkpoint blocks into the next variant's rep
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      r
    }

    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to reps; name <- names)
      acc(name) = t(SparkEntry.queries(name)(spark, sfDir)) :: acc(name)
    for (name <- names) {
      val vs = acc(name).sorted
      println(f"AB $name%-24s med=${vs(vs.size / 2)}%.3f " +
        f"min=${vs.head}%.3f max=${vs.last}%.3f")
    }
    spark.stop()
  }
}
