package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The curation pipeline's stage invariants: each stage keeps a subset of
  * the previous one, gates actually bite, and the final keep-list contains
  * no document the near-dup graph connects to a smaller-id survivor. */
class CorpusQueriesSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("stages are monotone subsets and every gate bites") {
    val docs = graft.tables.Tables.documents(spark, sfDir)
    val qual = CorpusQueries.qualityGate(docs)
    val surv = CorpusQueries.exactKeep(qual)
    val keep = CorpusQueries.queries("q_corpus_keep")(spark, sfDir)

    val n = docs.count()
    assert(qual.count() < n, "quality gate must drop rows on the fixture")
    assert(surv.count() <= qual.count())
    assert(keep.count() <= surv.count())
    assert(keep.count() > 0, "pipeline must not empty the corpus")
    // subset property: every kept id is a quality survivor
    assert(keep.join(surv, "doc_id").count() === keep.count())
  }

  test("kept documents are pairwise LSH-unconnected among themselves") {
    val surv = CorpusQueries.exactKeep(
      CorpusQueries.qualityGate(graft.tables.Tables.documents(spark, sfDir)))
    val keep = CorpusQueries.queries("q_corpus_keep")(spark, sfDir)
      .select("doc_id")
    val edges = DedupQueries.lshPairsOf(surv).select("doc_a", "doc_b")
    // if two kept docs shared an LSH band they'd be in one component and
    // only the smaller id could have been kept
    val both = edges
      .join(keep.withColumnRenamed("doc_id", "doc_a"), "doc_a")
      .join(keep.withColumnRenamed("doc_id", "doc_b"), "doc_b")
    assert(both.isEmpty)
  }

  test("curate chain: every stage bites and no contaminated doc survives") {
    val docs = graft.tables.Tables.documents(spark, sfDir)
    val curated = CorpusQueries.queries("q_corpus_curate")(spark, sfDir)
    val qualIds = CorpusQueries.qualityGate(docs)
      .filter(col("doc_id") >= 50).select("doc_id")
    val contaminated = CorpusQueries.decontaminate(docs, 50L).select("doc_id")

    assert(curated.count() > 0, "curation must not empty the corpus")
    assert(curated.count() < qualIds.count(),
      "repetition/decontamination/dedup must drop quality survivors")
    // subset of the quality gate, disjoint from the contaminated set,
    // and never a benchmark document
    assert(curated.join(qualIds, "doc_id").count() === curated.count())
    assert(curated.join(contaminated, "doc_id").isEmpty)
    assert(curated.filter(col("doc_id") < 50).isEmpty)
  }

  test("quality gate keeps only the declared languages and thresholds") {
    val qual = CorpusQueries.qualityGate(
      graft.tables.Tables.documents(spark, sfDir))
    assert(qual.filter(!col("lang").isin("en", "de", "fr")).isEmpty)
    assert(qual.filter(col("n_tokens") < 20).isEmpty)
    assert(qual.filter(col("density") < 0.8).isEmpty)
  }
}
