package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided synthetic testdata tables
  * (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * All loads are plain parquet scans — column pruning and predicate pushdown
  * happen in Catalyst, so callers should `select`/`filter` early and let the
  * scan prune (verify with `.explain("formatted")`: `ReadSchema` /
  * `PushedFilters`).
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events.parquet` has shipped `ts` two ways across fixture generations:
    * INT64 TIMESTAMP(NANOS) (arrives as epoch-nano Long under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set by
    * [[graft.GraftSession]]) and plain µs timestamp. Adapt on schema: the
    * Long form gets a truncating ns→µs derivation (matching DuckDB's ns→µs
    * cast) so every downstream query sees one `ts` timestamp column.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
          .drop("ts_ns")
      case _ => raw
    }
  }
}
