package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{CorpusQueries, DedupQueries, EventQueries, MultimodalQueries, RelationalQueries, RetrievalQueries, SimilarityQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's registered operator surface: every implemented
  * operator from SURVEY.md §2 (and the LLM-pipeline extensions) has one
  * parameterized query form here; `oracleSql` carries the DuckDB-dialect
  * twin the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped grouped aggregate with exact decimal sums. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q_agg_sum_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ TextQueries.queries ++
      MultimodalQueries.queries ++ CorpusQueries.queries ++
      RetrievalQueries.queries ++ EventQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (approx sketches, LSH bucketing)
    * get the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ DedupQueries.oracle ++
      SimilarityQueries.oracle ++ TextQueries.oracle ++
      MultimodalQueries.oracle ++ CorpusQueries.oracle ++
      RetrievalQueries.oracle ++ EventQueries.oracle

  /** Tolerance twins for the rows-only-by-design queries — natural DuckDB
    * expressions value-compared under explicit tolerances (rel-tol for
    * libm `ln` scores, bucket-disagreement bounds for sketched terciles)
    * by `tools/check_tolerance.py`, so "rows-only" never means "values
    * never compared". Dumped by [[Verify]] as `tolerance_sql.json`;
    * deliberately NOT part of `oracleSql` (the driver's hash gate would
    * red them for the exact reasons they are tolerance-checked). */
  def toleranceSql: Map[String, String] =
    TextQueries.toleranceOracle ++ RetrievalQueries.toleranceOracle ++
      RelationalQueries.toleranceOracle ++ DedupQueries.toleranceOracle
}
