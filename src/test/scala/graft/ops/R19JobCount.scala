package graft.ops

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scheduled-job / stage counter for named queries (VERDICT r18 #6 asks
  * for a job-count delta, not just wall): runs each query once untimed
  * (JIT + codegen warm), then once under a listener counting jobs and
  * completed stages — construction-time jobs (eager localCheckpoints)
  * included, exactly as the bench pays them.
  *
  * Run: sbt "Test/runMain graft.ops.R19JobCount q_lsh_recall,q_simjoin_prefix"
  */
object R19JobCount {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("q_lsh_recall", "q_simjoin_prefix")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    }
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).queryExecution.toRdd.count() // warm, uncounted
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      jobs.set(0); stages.set(0)
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val w = (System.nanoTime() - t0) / 1e9
      // listener events are async (listenerBus.waitUntilEmpty is
      // private[spark]) — a short settle is enough for a finished query
      Thread.sleep(1000)
      spark.sparkContext.removeSparkListener(listener)
      println(f"JOBS $name%-24s jobs=${jobs.get}%3d stages=${stages.get}%3d wall=$w%.3f")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
