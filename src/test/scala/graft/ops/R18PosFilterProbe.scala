package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Measure the PPJoin positional filter's candidate cut on the raw sf0.1
  * corpus: matched rows without it, with it, and distinct pairs — the
  * numbers the simjoin scaladoc quotes.
  * Run: sbt "Test/runMain graft.ops.R18PosFilterProbe"
  */
object R18PosFilterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val t = 0.5
    val clean = ScaleOps.spread(Tables.documents(spark, sfDir))
      .select(col("doc_id"), expr("shingle_set(text)").as("ss"))
      .filter(col("ss").isNotNull && size(col("ss")) > 0)
    val occ = clean.select(col("doc_id"), explode(col("ss")).as("sh"))
    val dfreq = occ.groupBy("sh").agg(count(lit(1)).as("df"))
    val ordered = occ.join(dfreq, Seq("sh"))
      .groupBy("doc_id")
      .agg(expr("transform(array_sort(collect_list(struct(df, sh)))," +
        " x -> x.sh)").as("arr"))
      .select(col("doc_id"), col("arr"), size(col("arr")).as("n"))
      .withColumn("p",
        (col("n") - ceil(lit(t) * col("n")).cast("int") + 1))
      .localCheckpoint(true)
    val prefix = ordered.select(Seq(col("doc_id"), col("n")) :+
      posexplode(expr("slice(arr, 1, p)")).as(Seq("pos0", "sh")): _*)
    def joined(posFilter: Boolean) = {
      val base = col("a.sh") === col("b.sh") &&
        col("a.doc_id") < col("b.doc_id") &&
        col("a.n") >= lit(t) * col("b.n") &&
        col("b.n") >= lit(t) * col("a.n")
      val cond = if (posFilter) base &&
        least(col("a.n") - col("a.pos0"), col("b.n") - col("b.pos0"))
          .cast("double") >=
          lit(t) * (col("a.n") + col("b.n")) / lit(1.0 + t) - lit(1e-9)
      else base
      prefix.alias("a").join(prefix.alias("b"), cond)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    }
    println(s"prefix rows:            ${prefix.count()}")
    println(s"matched, no pos filter: ${joined(false).count()}")
    val withPos = joined(true)
    println(s"matched, pos filter:    ${withPos.count()}")
    println(s"distinct pairs:         ${withPos.distinct().count()}")
    println(s"final output pairs:     " +
      s"${DedupQueries.simjoinPrefixOf(spark, Tables.documents(spark, sfDir)).count()}")
    spark.stop()
  }
}
