package graft.ops

import graft.{SparkEntry, SparkTestBase}

/** Promotes the star CC fallback from property-proven to answer-proven
  * (VERDICT r5 #3): `q_dedup_clusters` under `spark.graft.cc.strategy=star`
  * must produce the exact rows the default propagate path produces on the
  * real sf0.01 fixture — and the propagate path is the one the DuckDB twin
  * hash-verifies every round, so equality here chains star to the oracle. */
class StarCcOracleSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.01"

  test("strategy=star matches the oracle-green propagate path on the sf0.01 fixture") {
    val run = SparkEntry.queries("q_dedup_clusters")
    def rows(): Set[(Long, Long)] =
      run(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val default = rows()
    spark.conf.set("spark.graft.cc.strategy", "star")
    try {
      val star = rows()
      assert(star.size == default.size)
      assert(star == default)
    } finally spark.conf.unset("spark.graft.cc.strategy")
  }

  test("strategy=auto escalates on a capped chain and still reaches the fixed point") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a 400-node path + a 30-clique + isolated nodes: the path needs more
    // than ceil(log2(400)) halving rounds than a handoff of 2 allows, so
    // auto MUST take the contract-then-star branch; the clique converges
    // inside any cap. Labels must equal pure propagate's fixed point.
    val universe = spark.range(0, 450).select(col("id").as("doc_id"))
    val chain = (0L until 399L).map(i => (i, i + 1))
    val clique = (for (i <- 400L until 430L; j <- i + 1 until 430L) yield (i, j))
    val edges = (chain ++ clique).toDF("doc_a", "doc_b")
    val exact = DedupQueries.clusterLabelsPropagate(universe, edges)._1
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sanity: the cap genuinely truncates propagation on this graph
    val (_, converged) =
      DedupQueries.clusterLabelsPropagate(universe, edges, maxRounds = 2)
    assert(!converged, "handoff cap did not bind — graph too easy to pin auto")
    spark.conf.set("spark.graft.cc.strategy", "auto")
    spark.conf.set("spark.graft.cc.handoff", "2")
    try {
      val auto = DedupQueries.clusterLabels(universe, edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(auto === exact)
      // chain collapses to min 0, clique to 400, isolates to themselves
      assert(auto(399L) === 0L && auto(429L) === 400L && auto(449L) === 449L)
    } finally {
      spark.conf.unset("spark.graft.cc.strategy")
      spark.conf.unset("spark.graft.cc.handoff")
    }
  }

  test("strategy=auto inside the cap is propagate's exact fixed point (fixture)") {
    // on the real corpus propagation converges in ~6 rounds < the default
    // handoff of 8, so auto must execute to the same rows the twin
    // hash-verifies (auto IS the default — this is the regression pin)
    val run = SparkEntry.queries("q_dedup_clusters")
    def rows(): Set[(Long, Long)] =
      run(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set("spark.graft.cc.strategy", "propagate")
    val prop = try rows() finally spark.conf.unset("spark.graft.cc.strategy")
    val auto = rows() // default
    assert(auto == prop)
  }
}
