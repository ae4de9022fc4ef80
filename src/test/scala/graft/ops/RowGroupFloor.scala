package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Turns the row-group-floor ARGUMENT into a measurement (VERDICT r5 #5).
  *
  * q_agg_sum_group and q_join_large run >2× their DuckDB twins at sf0.1
  * and PERF.md attributes it to the fixture layout: the driver writes each
  * table as ONE parquet file with ONE row group, so the scan runs one task
  * and the ~0.2–0.3 s local-mode stage floor dominates — with
  * "amortizes at real row-group counts" argued, not measured. This main
  * measures it: rewrite sf0.1 `lineitem`/`orders` as 32-way-split parquet
  * (everything else symlinked), then interleave the two queries over BOTH
  * layouts round-robin in ONE JVM (PERF.md methodology rule 1 —
  * cross-invocation comparisons drift 3× on this host).
  *
  * Run: sbt "Test/runMain graft.ops.RowGroupFloor". Results in PERF.md.
  */
object RowGroupFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reDir = "/tmp/graft_rowgroup_sf"
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // build the re-chunked twin of the fixture dir (idempotent)
    val split = Set("lineitem", "orders")
    Files.createDirectories(Paths.get(reDir))
    for (t <- graft.tables.Tables.names) {
      val dst = Paths.get(s"$reDir/$t.parquet")
      if (!Files.exists(dst)) {
        if (split(t))
          spark.read.parquet(s"$sfDir/$t.parquet")
            .repartition(32)
            .write.parquet(dst.toString)
        else Files.createSymbolicLink(dst, Paths.get(s"$sfDir/$t.parquet"))
      }
    }

    val queries = Seq("q_agg_sum_group", "q_join_large")
    val dirs = Seq("1rg" -> sfDir, "32rg" -> reDir)

    def t(name: String, dir: String): Double = {
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    // untimed warm-up of both shapes on both layouts
    for (q <- queries; (_, d) <- dirs) t(q, d)

    val acc = scala.collection.mutable.Map[(String, String), List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to 7; q <- queries; (lbl, d) <- dirs)
      acc((q, lbl)) = t(q, d) :: acc((q, lbl))
    for (q <- queries; (lbl, _) <- dirs) {
      val vs = acc((q, lbl)).sorted
      println(f"[rowgroup] $q%-16s $lbl%5s med=${vs(vs.size / 2)}%.3f " +
        f"min=${vs.head}%.3f max=${vs.last}%.3f")
    }
    spark.stop()
  }
}
