package graft.ops

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Quantifies the probe-JVM-vs-AB-harness bias (VERDICT r14 #7): PERF.md
  * r14 noted probe-style solo loops read consistently BELOW `graft.AB`'s
  * interleaved mins for the same query on the same day (q_bm25_multi
  * 0.280 probe vs 0.34–0.38 AB), and weak-list adjudications have mixed
  * the two columns. This main isolates the harness variable inside ONE
  * JVM: phase 1 runs each query as a probe-style solo loop (reps
  * consecutive executions, System.gc() between — each rep re-enters a
  * hot, single-plan JIT profile), phase 2 runs the SAME queries
  * AB-style (round-robin interleave, so every rep re-encounters cold
  * codegen'd classes evicted by the other queries' compilations and a
  * colder block/page cache). Same JVM, same minute — the remaining delta
  * IS the harness bias, with cross-JVM ambient drift excluded.
  *
  * Usage: Test/runMain graft.ops.SoloVsAb <sfDir> <q1,q2,q3> [reps]
  */
object SoloVsAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val queries = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def runOnce(q: String): Double = {
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up: one untimed pass of every query (JIT + codegen + page cache)
    queries.foreach(runOnce)

    // "swap" runs the interleave FIRST — the control that separates the
    // harness-structure hypothesis from plain JVM maturity (later phases
    // run hotter as JIT compilation accumulates)
    val swap = args.contains("swap")
    var solo: Map[String, Seq[Double]] = Map.empty
    val inter = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    def runSolo(): Unit = solo = queries.map { q =>
      q -> (1 to reps).map(_ => runOnce(q)).sorted
    }.toMap
    def runInter(): Unit =
      for (_ <- 1 to reps; q <- queries) inter(q) ::= runOnce(q)
    if (swap) { runInter(); runSolo() } else { runSolo(); runInter() }

    println(f"${"query"}%-22s ${"solo_min"}%9s ${"solo_med"}%9s " +
      f"${"ab_min"}%8s ${"ab_med"}%8s ${"bias_min"}%8s")
    for (q <- queries) {
      val s = solo(q)
      val a = inter(q).sorted
      println(f"$q%-22s ${s.head}%9.3f ${s(s.size / 2)}%9.3f " +
        f"${a.head}%8.3f ${a(a.size / 2)}%8.3f ${a.head / s.head}%8.2f")
    }
    spark.stop()
  }
}
