package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** r18 stage decomposition for the q_simjoin_prefix diet (VERDICT r17
  * #1): times the pipeline's cut points in one JVM so the residual cost
  * is attributed, not guessed. Run:
  *   sbt "Test/runMain graft.ops.R18SimjoinProbe [sfDir]"
  */
object R18SimjoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sfDir)

    def t(label: String)(body: => Long): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val n = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }

    // warm-up
    DedupQueries.simjoinPrefixOf(spark, docs).queryExecution.toRdd.count()

    for (_ <- 1 to 2) {
      t("full query") {
        DedupQueries.simjoinPrefixOf(spark, docs).queryExecution.toRdd.count()
      }
      // stage A: the shingle pass alone (tokenize + hash, no shuffle)
      t("A sets scan") {
        docs.select(col("doc_id"), expr("shingle_sig_set(text)").as("g"))
          .select(col("doc_id"), col("g.ss").as("ss"))
          .filter(col("ss").isNotNull && size(col("ss")) > 0)
          .queryExecution.toRdd.count()
      }
      // stage B: through the checkpointed ordered table (df agg + sort)
      t("B ordered (ckpt built)") {
        val sets = docs
          .select(col("doc_id"), expr("shingle_sig_set(text)").as("g"))
          .select(col("doc_id"), col("g.ss").as("ss"))
          .filter(col("ss").isNotNull && size(col("ss")) > 0)
        val occ = sets.select(col("doc_id"), explode(col("ss")).as("sh"))
          .repartition(col("sh"))
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
      // stage C: ordered ckpt + prefix self-join (raw candidate stream)
      t("C + prefix join (raw)") {
        val sets = docs
          .select(col("doc_id"), expr("shingle_sig_set(text)").as("g"))
          .select(col("doc_id"), col("g.ss").as("ss"))
          .filter(col("ss").isNotNull && size(col("ss")) > 0)
        val occ = sets.select(col("doc_id"), explode(col("ss")).as("sh"))
          .repartition(col("sh"))
        val dfreq = occ.groupBy("sh").agg(count(lit(1)).as("df"))
        val ordered = occ.join(dfreq, Seq("sh"))
          .groupBy("doc_id")
          .agg(expr("transform(array_sort(collect_list(struct(df, sh)))," +
            " x -> x.sh)").as("arr"))
          .select(col("doc_id"), col("arr"), size(col("arr")).as("n"))
          .withColumn("p",
            (col("n") - ceil(lit(0.5) * col("n")).cast("int") + 1))
          .localCheckpoint(true)
        val prefix = ordered.select(col("doc_id"), col("n"),
          explode(expr("slice(arr, 1, p)")).as("sh"))
        prefix.alias("a").join(prefix.alias("b"),
            col("a.sh") === col("b.sh") &&
              col("a.doc_id") < col("b.doc_id") &&
              col("a.n") >= lit(0.5) * col("b.n") &&
              col("b.n") >= lit(0.5) * col("a.n"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            col("a.sh").as("sh"))
          .queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
