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
}
