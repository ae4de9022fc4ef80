package graft.jobs

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.BeaconIO
import graft.model.{BeaconFunctions, BeaconSchemas}
import graft.verify.Checks

/** E8 — the four pipeline entry points (daily/hourly × export/load) as
  * Spark jobs, mirroring the reference DAG factories
  * (`/root/reference/dags/ethereum2etl_airflow/build_export_dag.py`,
  * `build_load_dag.py`, `build_hourly_export_dag.py`,
  * `build_hourly_load_dag.py`).
  *
  * The row source is pluggable ([[BeaconSource]]): production would fetch
  * from a beacon-node HTTP API (A1–A3 are delegated to a client lib in the
  * reference too); tests and this container use a JSONL-fixture source —
  * no network, same dataflow.
  */
trait BeaconSource {
  /** A1 — blocks for an inclusive slot range. */
  def blocks(spark: SparkSession, slotRange: (Long, Long)): DataFrame
  /** A2 — validator snapshots for an inclusive epoch range (hourly DAG
    * passes an explicit range — `build_hourly_export_dag.py:105-124`). */
  def validators(spark: SparkSession, epochRange: (Long, Long)): DataFrame
  /** A2 — the full *current* validator set (the daily DAG passes
    * `start_epoch=None, end_epoch=None` — `build_export_dag.py:135-143`). */
  def validatorsLatest(spark: SparkSession): DataFrame
  /** A3 — committees for an inclusive epoch range. */
  def committees(spark: SparkSession, epochRange: (Long, Long)): DataFrame
}

/** Fixture source: reads pre-staged JSONL (the exporter's exchange format)
  * and filters to the requested range — the integration-test analog of the
  * reference's single-day replay (`/root/reference/README.md:105-117`). */
final class JsonlBeaconSource(baseDir: String) extends BeaconSource {
  def blocks(spark: SparkSession, r: (Long, Long)): DataFrame =
    BeaconIO.readBeaconTable(spark, "beacon_blocks", s"$baseDir/beacon_blocks.json")
      .filter(col("block_slot").between(r._1, r._2))
  private def allValidators(spark: SparkSession): DataFrame =
    BeaconIO.readBeaconTable(spark, "beacon_validators", s"$baseDir/beacon_validators.json")
  def validators(spark: SparkSession, r: (Long, Long)): DataFrame =
    allValidators(spark).filter(col("epoch").between(r._1, r._2))
  def validatorsLatest(spark: SparkSession): DataFrame = {
    val df = allValidators(spark)
    // one-row metadata scan to resolve "current" — the analog of the
    // reference's range-service call, not a data-path collect
    val maxEpoch = df.agg(max("epoch")).collect()(0).getLong(0)
    df.filter(col("epoch") === maxEpoch)
  }
  def committees(spark: SparkSession, r: (Long, Long)): DataFrame =
    BeaconIO.readBeaconTable(spark, "beacon_committees", s"$baseDir/beacon_committees.json")
      .filter(col("epoch").between(r._1, r._2))
}

object BeaconPipeline {

  /** Daily export (`build_export_dag.py`): resolve the date's slot/epoch
    * ranges (A4/A5), pull each entity, publish partitioned JSONL under
    * `export/{table}/block_date=…` (A8). */
  def dailyExport(spark: SparkSession, source: BeaconSource, ds: LocalDate,
                  exportBase: String): Unit = {
    val slots = BeaconFunctions.slotRangeForDate(ds)
    val epochs = BeaconFunctions.epochRangeForSlots(slots)
    BeaconIO.writeDaily(source.blocks(spark, slots), "block_timestamp",
      s"$exportBase/beacon_blocks")
    BeaconIO.writeDaily(source.validatorsLatest(spark), "timestamp",
      s"$exportBase/beacon_validators")
    BeaconIO.writeDaily(source.committees(spark, epochs), "epoch_timestamp",
      s"$exportBase/beacon_committees")
    // A4/A5 — publish the resolved ranges as sidecars next to the data
    // (`build_export_dag.py:121-123` uploads blocks_meta.txt/epochs_meta.txt)
    BeaconIO.writeRangeMeta(s"$exportBase/beacon_blocks", ds, "blocks_meta.txt", slots)
    BeaconIO.writeRangeMeta(s"$exportBase/beacon_committees", ds, "epochs_meta.txt", epochs)
  }

  /** Hourly export (`build_hourly_export_dag.py`): hour-clamped ranges
    * (A6/A7), hourly layout (A9), plus the validators dual history+latest
    * sink (A10/D6). */
  def hourlyExport(spark: SparkSession, source: BeaconSource, ds: LocalDate, hour: Int,
                   exportBase: String): Unit = {
    val slots = BeaconFunctions.slotRangeForHour(ds, hour)
    val epochs = BeaconFunctions.epochRangeForSlots(slots)
    BeaconIO.writeHourly(source.blocks(spark, slots), "block_timestamp",
      s"$exportBase/beacon_blocks")
    BeaconIO.writeHourly(source.committees(spark, epochs), "epoch_timestamp",
      s"$exportBase/beacon_committees")
    BeaconIO.writeSnapshotWithLatest(source.validators(spark, epochs), "timestamp",
      s"$exportBase/beacon_validators", s"$exportBase/beacon_validators_latest")
  }

  /** Load stage (`build_load_dag.py:76-96`): JSONL exchange files → managed
    * parquet tables partitioned by the materialized date column, then the
    * verify gate (E9). Dynamic partition overwrite keeps replays idempotent
    * (D5) — semantically WRITE_TRUNCATE per logical date.
    *
    * `onlyLastDate` tables reproduce the reference's validators semantics
    * (`build_load_dag.py:82,88-91,127`): read ONLY the logical date's
    * partition (input-path pruning, not a full-tree scan) and fully
    * truncate-replace the destination — the table is always exactly the
    * latest day's snapshot. */
  def load(spark: SparkSession, exportBase: String, warehouseBase: String,
           ds: LocalDate, verify: Boolean = true,
           onlyLastDate: Set[String] = Set("beacon_validators")): Unit = {
    for ((table, (_, tsCol)) <- BeaconSchemas.tables) {
      val srcPath =
        if (onlyLastDate(table)) s"$exportBase/$table/block_date=$ds"
        else s"$exportBase/$table"
      val df = spark.read.option("basePath", s"$exportBase/$table")
        .schema(partitionedSchema(table))
        .option("timestampFormat", BeaconIO.TimestampFormat)
        // the reference loads `gs://…/{task}/*.json` (`build_load_dag.py:92`)
        // — the glob is what keeps the A4/A5 meta sidecars out of the rows
        .option("pathGlobFilter", "*.json")
        .json(srcPath)
      val writer = df.drop("block_date", "hour")
        .transform(BeaconIO.withBlockDate(_, tsCol))
        .write.mode("overwrite").partitionBy("block_date")
      // static overwrite = WRITE_TRUNCATE (whole table replaced); the
      // session default (dynamic) only replaces the partitions present
      (if (onlyLastDate(table)) writer.option("partitionOverwriteMode", "static")
       else writer)
        .parquet(s"$warehouseBase/$table")
      // read back with the declared schema: robust to an empty partition set
      // (an empty-but-valid logical hour must not crash the load)
      spark.read.schema(partitionedSchema(table))
        .parquet(s"$warehouseBase/$table").createOrReplaceTempView(table)
    }
    if (verify) Checks.runAll(spark, ds.toString)
  }

  /** Hourly load (`build_hourly_load_dag.py:92-152`): per logical hour,
    * load each entity's hour partition (input-path pruned — never the full
    * tree), append validators to the hourly-history table AND overwrite the
    * `latest` table (A10/D6, `:138-152`), then run the hourly verify set
    * (blocks_count + blocks_have_latest — `:151-152`; the committees/
    * validators checks are commented out in the reference's hourly DAG). */
  def hourlyLoad(spark: SparkSession, exportBase: String, warehouseBase: String,
                 ds: LocalDate, hour: Int, verify: Boolean = true): Unit = {
    val hh = f"$hour%02d"
    def readHour(table: String): org.apache.spark.sql.DataFrame =
      spark.read.option("basePath", s"$exportBase/$table")
        .schema(hourlySchema(table))
        .option("timestampFormat", BeaconIO.TimestampFormat)
        .option("pathGlobFilter", "*.json")
        .json(s"$exportBase/$table/block_date=$ds/hour=$hh")
    def publish(df: org.apache.spark.sql.DataFrame, tsCol: String, dest: String): Unit =
      df.drop("block_date", "hour")
        .transform(BeaconIO.withBlockDateHour(_, tsCol))
        .write.mode("overwrite").partitionBy("block_date", "hour")
        .parquet(s"$warehouseBase/$dest")

    publish(readHour("beacon_blocks"), "block_timestamp", "beacon_blocks")
    publish(readHour("beacon_committees"), "epoch_timestamp", "beacon_committees")
    // validators: every hour's snapshot accumulates in the history table…
    publish(readHour("beacon_validators"), "timestamp", "beacon_validators_hourly")
    // …and the flat latest export overwrites the latest table (WRITE_TRUNCATE)
    val (vSchema, _) = BeaconSchemas.tables("beacon_validators")
    spark.read.schema(vSchema)
      .option("timestampFormat", BeaconIO.TimestampFormat)
      .option("pathGlobFilter", "*.json")
      .json(s"$exportBase/beacon_validators_latest")
      .write.mode("overwrite").parquet(s"$warehouseBase/beacon_validators_latest")

    if (verify) {
      spark.read.schema(hourlySchema("beacon_blocks"))
        .parquet(s"$warehouseBase/beacon_blocks")
        .createOrReplaceTempView("beacon_blocks")
      Checks.blocksCount(spark, ds.toString)
      Checks.blocksHaveLatest(spark, ds.toString)
    }
  }

  /** Declared schema + the Hive partition columns the export layout adds. */
  private def partitionedSchema(table: String) = {
    val (base, _) = BeaconSchemas.tables(table)
    base.add("block_date", org.apache.spark.sql.types.StringType, nullable = true)
  }

  /** Hourly layout adds an `hour` partition column too. */
  private def hourlySchema(table: String) =
    partitionedSchema(table)
      .add("hour", org.apache.spark.sql.types.StringType, nullable = true)

  /** Single-day replay (the reference's integration test,
    * `README.md:105-117`): export a fixture day then load + verify it. */
  def replayDay(spark: SparkSession, source: BeaconSource, ds: LocalDate,
                workDir: String): Unit = {
    dailyExport(spark, source, ds, s"$workDir/export")
    load(spark, s"$workDir/export", s"$workDir/warehouse", ds)
  }
}
