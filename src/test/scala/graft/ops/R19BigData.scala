package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Octave-scaled testdata synthesizer (VERDICT r18 #7): the sf0.1 board is
  * stage-floor-bound (~17 MB total — the driver's 8c/32c ratios read ≈1
  * across the board, diagnosing the scale factor, not the queries), so the
  * core-scaling evidence for the r18/r19 rewrites needs a bigger input.
  * This builds an n× replica of sf0.1 under /tmp with FK-CONSISTENT key
  * offsets (each key column shifts by copy × (max(key)+1) of its DOMAIN,
  * so orders still join customers, lineitem still joins orders/part/
  * supplier, embeddings still join documents), documents get per-copy
  * word prefixes (disjoint shingle spaces — the R18Growth scheme: n× is n
  * disjoint similarity problems, measuring VOLUME), and embeddings get a
  * per-copy circular rotation (distinct directions, no engineered
  * duplication). region/nation stay single-copy dimensions.
  *
  * Run: sbt "Test/runMain graft.ops.R19BigData 8 /tmp/sf0.8". The result
  * is perf-only — the DuckDB oracle never sees it.
  */
object R19BigData {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 8
    val out = if (args.length > 1) args(1) else "/tmp/sf0.8"
    val in = "/root/testdata/sf0.1"
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def rd(t: String): DataFrame = spark.read.parquet(s"$in/$t.parquet")

    def dom(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head.getLong(0) + 1L

    val kCust = dom(rd("customer"), "c_custkey")
    val kOrd = dom(rd("orders"), "o_orderkey")
    val kPart = dom(rd("part"), "p_partkey")
    val kSupp = dom(rd("supplier"), "s_suppkey")
    val kDoc = math.max(dom(rd("documents"), "doc_id"),
      dom(rd("embeddings"), "vec_id"))
    val kEvent = dom(rd("events"), "event_id")
    val kUser = dom(rd("events"), "user_id")

    /** n copies of `df`, each key column shifted by copy × its domain. */
    def times(df: DataFrame, offsets: Map[String, Long],
              extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until n).map { c =>
        val shifted = offsets.foldLeft(df) { case (d, (k, span)) =>
          d.withColumn(k, col(k) + lit(c * span))
        }
        extra(shifted, c)
      }.reduce(_ union _)

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[bigdata] wrote $name")
    }

    write("region", rd("region"))
    write("nation", rd("nation"))
    write("customer", times(rd("customer"), Map("c_custkey" -> kCust)))
    write("supplier", times(rd("supplier"), Map("s_suppkey" -> kSupp)))
    write("part", times(rd("part"), Map("p_partkey" -> kPart)))
    write("orders", times(rd("orders"),
      Map("o_orderkey" -> kOrd, "o_custkey" -> kCust)))
    write("lineitem", times(rd("lineitem"),
      Map("l_orderkey" -> kOrd, "l_partkey" -> kPart, "l_suppkey" -> kSupp)))
    write("events", times(rd("events"),
      Map("event_id" -> kEvent, "user_id" -> kUser)))
    write("documents", times(rd("documents"), Map("doc_id" -> kDoc),
      (d, c) => d.withColumn("text",
        regexp_replace(col("text"), "(\\S+)", s"c${c}_$$1"))))
    // circular rotation by copy index: distinct directions per copy, same
    // norms — 64-dim embeddings, copies capped far below 64 by the octave
    write("embeddings", times(rd("embeddings"), Map("vec_id" -> kDoc),
      (d, c) =>
        if (c == 0) d
        else d.withColumn("embedding",
          expr(s"concat(slice(embedding, ${c + 1}, ${64 - c})," +
            s" slice(embedding, 1, $c))"))))
    println(s"[bigdata] done: $out (${n}x sf0.1)")
    spark.stop()
  }
}
