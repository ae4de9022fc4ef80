package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}

/** Same-day stage floors for the three drift-disputed weak members with
  * no dedicated probe (VERDICT r13 #2 adjudication support):
  * q_doc_tfidf and q_importance_weights are two-corpus-pass queries by
  * algorithm (a df/bucket FIT scalar + a SCORE pass — r8/r9
  * decompositions), q_source_overlap is the LSH signature pipeline +
  * one band exchange. This probe re-measures the shared stage floors in
  * the SAME JVM and window as the full queries, so a ratio dispute can
  * be decomposed with today's numbers instead of r9's:
  *
  *   count — bare documents scan
  *   tc    — ONE term_counts(text) tokenize pass (the unit both
  *           two-pass queries pay twice)
  *   sig   — ONE shingle_sig minhash pass (q_source_overlap's per-row
  *           stage, 64 permutations per doc)
  *   tfidf / dsir / overlap — the registered queries
  *
  * Usage: Test/runMain graft.ops.TwoPassFloorProbe <sfDir> [reps]
  */
object TwoPassFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.tables.Tables

    def docs = Tables.documents(spark, sfDir).filter(col("text").isNotNull)

    def t(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to reps) {
      acc("count") ::= t { docs.queryExecution.toRdd.count() }
      acc("tc") ::= t {
        docs.select(expr("term_counts(text)").as("tc"))
          .queryExecution.toRdd.count()
      }
      acc("sig") ::= t {
        docs.select(expr("shingle_sig(text)").as("g"))
          .queryExecution.toRdd.count()
      }
      acc("tfidf") ::= t {
        SparkEntry.queries("q_doc_tfidf")(spark, sfDir)
          .queryExecution.toRdd.count()
      }
      acc("dsir") ::= t {
        SparkEntry.queries("q_importance_weights")(spark, sfDir)
          .queryExecution.toRdd.count()
      }
      acc("overlap") ::= t {
        SparkEntry.queries("q_source_overlap")(spark, sfDir)
          .queryExecution.toRdd.count()
      }
    }
    for (name <- Seq("count", "tc", "sig", "tfidf", "dsir", "overlap")) {
      val vs = acc(name).sorted
      println(f"PROBE $name%-8s min=${vs.head}%.3f med=${vs(vs.size / 2)}%.3f")
    }
    spark.stop()
  }
}
