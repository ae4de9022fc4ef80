package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** r19 growth harness (VERDICT r18 #5): octave probes for the two
  * collect_list buffers the r18 group-and-expand rewrites introduced —
  * q_semdedup's per-cell member list and q_dist_drift's per-bucket
  * per-source list. Each probe scales the CORPUS while holding the
  * buffer's design bound fixed, the way the operators' scaladocs argue
  * production behaves:
  *
  *  - q_semdedup: production SemDeDup picks k ∝ corpus so cell occupancy
  *    stays ~constant. The probe replicates the ASSIGNED frame with
  *    disjoint per-copy cell ids (cells ∝ corpus, occupancy exactly the
  *    base corpus's) and times [[SimilarityQueries.semdedupFromAssigned]]
  *    — the groupBy + collect_list + i<j expansion under measurement.
  *    Max cell occupancy is printed next to wall so a super-linear buffer
  *    cannot hide.
  *
  *  - q_dist_drift: the per-bucket list holds ≤ #sources structs. The
  *    probe replicates documents rows verbatim (#sources fixed, corpus
  *    n×) and times [[CorpusQueries.distDriftOf]]; max per-bucket list
  *    size is printed next to wall.
  *
  * Run: sbt "Test/runMain graft.ops.R19Growth". Results in PERF.md.
  */
object R19Growth {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def t(body: => Long): (Double, Long) = {
      System.gc()
      val t0 = System.nanoTime()
      val n = body
      val s = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      (s, n)
    }

    // --- q_semdedup: cells ∝ corpus, occupancy constant ---
    val assigned0 = SimilarityQueries.ivfAssigned(spark, sfDir)
      .localCheckpoint(true) // the replication must not re-run the argmax per rep
    val maxVec = assigned0.agg(max("vec_id")).head.getLong(0) + 1L
    def assignedTimes(n: Int): DataFrame =
      (0 until n).map { c =>
        assigned0.select(
          (col("vec_id") + lit(c * maxVec)).as("vec_id"),
          col("emb"), col("nv"),
          (col("cell") + lit(c.toLong * 16L)).as("cell"))
      }.reduce(_ union _)
    // warm-up, untimed
    SimilarityQueries.semdedupFromAssigned(assignedTimes(1))
      .queryExecution.toRdd.count()
    println(f"${"semdedup"}%-10s ${"scale"}%-6s ${"vecs"}%9s ${"cells"}%7s " +
      f"${"max_occ"}%8s ${"rows"}%9s ${"wall_s"}%8s")
    for (n <- Seq(1, 16, 64)) {
      val a = assignedTimes(n)
      val occ = a.groupBy("cell").agg(count(lit(1)).as("c"))
        .agg(count(lit(1)), max("c")).head
      val (cells, maxOcc) = (occ.getLong(0), occ.getLong(1))
      val nV = a.count()
      val (w, rows) = t {
        SimilarityQueries.semdedupFromAssigned(a)
          .queryExecution.toRdd.count()
      }
      println(f"${"semdedup"}%-10s ${n}%-6d ${nV}%9d ${cells}%7d " +
        f"${maxOcc}%8d ${rows}%9d ${w}%8.3f")
    }

    // --- q_dist_drift: #sources fixed, corpus n× ---
    val docs0 = Tables.documents(spark, sfDir)
      .select(col("source"), col("n_chars"))
      .localCheckpoint(true)
    def docsTimes(n: Int): DataFrame =
      (0 until n).map(_ => docs0).reduce(_ union _)
    CorpusQueries.distDriftOf(docsTimes(1)).queryExecution.toRdd.count()
    println(f"${"dist_drift"}%-10s ${"scale"}%-6s ${"docs"}%9s ${"buckets"}%7s " +
      f"${"max_ps"}%8s ${"rows"}%9s ${"wall_s"}%8s")
    for (n <- Seq(1, 16, 64)) {
      val d = docsTimes(n)
      val nD = d.count()
      val cell = d.select(col("source"), expr("n_chars div 32").as("b"))
        .groupBy("source", "b").agg(count(lit(1)).as("n"))
      val ps = cell.groupBy("b").agg(count(lit(1)).as("k"))
        .agg(count(lit(1)), max("k")).head
      val (buckets, maxPs) = (ps.getLong(0), ps.getLong(1))
      val (w, rows) = t {
        CorpusQueries.distDriftOf(d).queryExecution.toRdd.count()
      }
      println(f"${"dist_drift"}%-10s ${n}%-6d ${nD}%9d ${buckets}%7d " +
        f"${maxPs}%8d ${rows}%9d ${w}%8.3f")
    }
    spark.stop()
  }
}
