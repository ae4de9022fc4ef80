package graft

import org.apache.spark.sql.SparkSession

object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries("q_ann_ivfpq_residual")(spark, "/root/testdata/sf0.1")
    df.explain("formatted")
    spark.stop()
  }
}
