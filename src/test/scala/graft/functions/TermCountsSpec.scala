package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TermCountsSpec extends SparkTestBase {

  /** The composed pipeline term_counts replaced — explode + groupBy tf.
    * Kept verbatim as the equivalence reference: it is the literal Spark
    * transliteration of the unchanged DuckDB twin, so expression ==
    * composed implies expression == oracle. */
  private def composed(docs: org.apache.spark.sql.DataFrame) =
    docs
      .select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  private def viaExpr(docs: org.apache.spark.sql.DataFrame) = {
    GraftFunctions.register(spark)
    docs.select(col("doc_id"), explode(expr("term_counts(text)")).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
  }

  test("matches the composed explode+groupBy tf on edge cases") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox the lazy the dog"),
      (2L, "single"),
      (3L, ""),                       // split('') -> one "" token, tf 1
      (4L, "  MiXeD  Case  mixed case  "), // trim spaces, lower first
      (5L, "a\tb\na  a\tB"),          // interior tabs/newlines split
      (6L, "\ttab-leading keeps an empty token"), // trim is SPACE-only
      (7L, "répét unicode répét tokens")
    ).toDF("doc_id", "text")
    val exp = composed(docs).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val got = viaExpr(docs).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === exp)
  }

  test("query_term_stats: duplicate query terms fan out to every slot") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // the hash-lookup rewrite dedups terms into one counter; slots listing
    // the same term must still each report the full count
    val r = Seq((1L, "a b a c a b")).toDF("doc_id", "text")
      .selectExpr("query_term_stats(text, 'a', 'b', 'a', 'zz') AS q")
      .select("q.dl", "q.tf0", "q.tf1", "q.tf2", "q.tf3").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((6L, 3L, 2L, 3L, 0L)))
  }

  test("null text yields null; terms come out sorted and distinct per doc") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val docs = Seq((1L, null: String), (2L, "b a c a b a")).toDF("doc_id", "text")
    val raw = docs.select(col("doc_id"), expr("term_counts(text)").as("tc"))
      .collect().sortBy(_.getLong(0))
    assert(raw(0).isNullAt(1))
    val rows = raw(1).getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("tc")
    assert(rows.map(_.getString(0)) === Seq("a", "b", "c"))
    assert(rows.map(r => (r.getString(0), r.getLong(1))) ===
      Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }
}
