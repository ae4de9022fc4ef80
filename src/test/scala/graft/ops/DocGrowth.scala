package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Scale-growth harness for the r13 document-side additions (VERDICT r13
  * #7): times the REGISTERED builders (CorpusQueries.groupSampleOf /
  * splitAssignOf — the same code the registered queries execute) over
  * id-offset replicated `documents` at 1×/4×/16×.
  *
  * Replication scheme (the EventGrowth mold): each copy offsets doc_id
  * by copy × (max + 1) — md5 rank keys and LCG buckets recompute per
  * copy, sources stay the SAME (so q_group_sample's per-source take sees
  * 16× candidates per group, the interesting direction: the
  * WindowGroupLimit map-side cut must keep the shuffled volume at
  * k rows/source/task regardless of scale) and q_split_assign's narrow
  * audit aggregate grows only in scan volume (the assignment itself
  * never shuffles).
  *
  * Run: sbt "Test/runMain graft.ops.DocGrowth". Results in PERF.md.
  */
object DocGrowth {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "lang", "n_chars")
    val maxDoc = docs.agg(max("doc_id")).head.getLong(0) + 1L
    def docTimes(n: Int): DataFrame =
      (0 until n).map { c =>
        docs.select((col("doc_id") + lit(c * maxDoc)).as("doc_id"),
          col("source"), col("lang"), col("n_chars"))
      }.reduce(_ union _)

    def t(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up (JIT + codegen), untimed
    CorpusQueries.groupSampleOf(docTimes(1)).queryExecution.toRdd.count()
    CorpusQueries.splitAssignOf(docTimes(1)).queryExecution.toRdd.count()

    println(f"${"scale"}%-6s ${"docs"}%9s ${"group_sample_s"}%15s " +
      f"${"split_assign_s"}%15s")
    for (n <- Seq(1, 4, 16)) {
      val d = docTimes(n)
      val nD = d.count()
      val tG = t {
        CorpusQueries.groupSampleOf(d).queryExecution.toRdd.count()
      }
      val tS = t {
        CorpusQueries.splitAssignOf(d).queryExecution.toRdd.count()
      }
      println(f"${n}%-6d ${nD}%9d ${tG}%15.3f ${tS}%15.3f")
    }
    spark.stop()
  }
}
