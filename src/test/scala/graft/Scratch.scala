package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main: decompose q_corpus_keep cost at sf0.1. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    val docs = graft.tables.Tables.documents(spark, sfDir)
    val surv = t("surv count") {
      val s0 = CorpusQueries.exactKeep(
        CorpusQueries.qualityGate(docs))
      println("[scratch] surv rows = " + s0.count()); s0
    }
    val edges = t("edges checkpoint") {
      DedupQueries.lshPairsOf(surv).select("doc_a", "doc_b")
        .localCheckpoint(true)
    }
    println("[scratch] edge rows = " + edges.count())
    val sym = edges.union(edges.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .localCheckpoint(true)
    var labels = surv.select(col("doc_id"), col("doc_id").as("cluster"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged) {
      iter += 1
      val prop = sym.join(labels, sym("doc_b") === labels("doc_id"))
        .select(sym("doc_a").as("doc_id"), col("cluster"))
      val next = t(s"iter $iter next-agg") {
        labels.union(prop).groupBy("doc_id").agg(min("cluster").as("cluster"))
          .localCheckpoint(true)
      }
      converged = t(s"iter $iter convergence") {
        next.join(labels.withColumnRenamed("cluster", "prev"), "doc_id")
          .filter(col("cluster") < col("prev")).isEmpty
      }
      labels = next
    }
    println("[scratch] iterations = " + iter)
    t("final join") {
      surv.join(labels, "doc_id").filter(col("doc_id") === col("cluster"))
        .select(col("doc_id"), col("lang"), col("n_tokens"))
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
