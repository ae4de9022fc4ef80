package graft.ops

import org.apache.spark.sql.SparkSession

import graft.tables.Tables

/** Dump the executed (AQE-final) plan of q_simjoin_prefix at sf0.1 —
  * exchange census for the r18 diet. Run:
  *   sbt "Test/runMain graft.ops.R18SimjoinExplain"
  */
object R18SimjoinExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions.{col, lit, max, regexp_replace}
    val docs0 = Tables.documents(spark, sfDir).select("doc_id", "text")
    val docs = if (n == 1) docs0 else {
      val maxDoc = docs0.agg(max("doc_id")).head.getLong(0) + 1L
      (0 until n).map { c =>
        docs0.select((col("doc_id") + lit(c * maxDoc)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"c${c}_$$1").as("text"))
      }.reduce(_ union _)
    }
    val q = DedupQueries.simjoinPrefixOf(spark, docs)
    q.queryExecution.toRdd.count() // let AQE finalize
    println("=== EXECUTED PLAN ===")
    println(q.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
