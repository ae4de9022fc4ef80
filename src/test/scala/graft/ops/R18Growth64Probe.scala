package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Stage attribution for the 64× simjoin octave: fixture-transform cost,
  * tokenize pass, ordered build, full query — so the growth curve's last
  * octave is decomposed, not guessed.
  * Run: sbt "Test/runMain graft.ops.R18Growth64Probe [n]"
  */
object R18Growth64Probe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(64)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val maxDoc = docs.agg(max("doc_id")).head.getLong(0) + 1L
    def docsTimes(k: Int): DataFrame =
      (0 until k).map { c =>
        docs.select((col("doc_id") + lit(c * maxDoc)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"c${c}_$$1").as("text"))
      }.reduce(_ union _)
    def t(label: String)(body: => Unit): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      body
      println(f"$label%-26s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    val d1 = docsTimes(1)
    DedupQueries.simjoinPrefixOf(spark, d1).queryExecution.toRdd.count()
    val d = docsTimes(n)
    for (_ <- 1 to 2) {
      t("fixture (sum length)") {
        d.agg(sum(length(col("text")))).head }
      t("tokenize (shingle_set)") {
        d.select(col("doc_id"), expr("shingle_set(text)").as("ss"))
          .filter(col("ss").isNotNull)
          .agg(sum(size(col("ss")))).head }
      t("ordered build + ckpt") {
        val clean = ScaleOps.spread(d)
          .select(col("doc_id"), expr("shingle_set(text)").as("ss"))
          .filter(col("ss").isNotNull && size(col("ss")) > 0)
        val occ = clean.select(col("doc_id"), explode(col("ss")).as("sh"))
        val dfreq = occ.groupBy("sh").agg(count(lit(1)).as("df"))
        occ.join(dfreq, Seq("sh"))
          .groupBy("doc_id")
          .agg(expr("transform(array_sort(collect_list(struct(df, sh)))," +
            " x -> x.sh)").as("arr"))
          .select(col("doc_id"), col("arr"), size(col("arr")).as("n"))
          .withColumn("p",
            (col("n") - ceil(lit(0.5) * col("n")).cast("int") + 1))
          .localCheckpoint(true).queryExecution.toRdd.count()
      }
      t("full simjoin") {
        DedupQueries.simjoinPrefixOf(spark, d).queryExecution.toRdd.count() }
    }
    spark.stop()
  }
}
