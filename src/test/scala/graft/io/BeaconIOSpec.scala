package graft.io

import org.apache.spark.sql.functions._

import graft.{BeaconFixtures, SparkTestBase}
import graft.model.BeaconSchemas

class BeaconIOSpec extends SparkTestBase {

  test("JSONL read with declared schema: unknown keys dropped, missing keys null (A13)") {
    val dir = tmpDir("bq-semantics")
    BeaconFixtures.write(s"$dir/in.json", Seq(
      // unknown_key must be silently dropped; graffiti missing → null
      """{"block_slot":1,"block_timestamp":"2020-12-01T12:00:35Z","skipped":false,"unknown_key":"zzz"}""",
      """{"block_slot":2,"block_timestamp":"2020-12-01T12:00:47Z","skipped":true,"graffiti":"0x67"}"""))
    val df = BeaconIO.readBeaconTable(spark, "beacon_blocks", s"$dir/in.json")
    assert(df.schema === BeaconSchemas.beaconBlocks, "schema is the declared one, never inferred")
    val rows = df.orderBy("block_slot").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("graffiti") === null)
    assert(rows(1).getAs[String]("graffiti") === "0x67")
    assert(!df.columns.contains("unknown_key"))
  }

  test("nested repeated records parse: attestations explode, doubly-nested indices (C3/C4/C5)") {
    val dir = tmpDir("nested")
    BeaconFixtures.write(s"$dir/blocks.json", BeaconFixtures.blockLines(64))
    val df = BeaconIO.readBeaconTable(spark, "beacon_blocks", s"$dir/blocks.json")
    val atts = df.select(col("block_slot"), explode(col("attestations")).as("att"))
      .select(col("block_slot"), col("att.index"), col("att.target_epoch"))
    // 64 slots, every 7th-slot%3 skipped → 55 proposed x 2 attestations
    assert(atts.count() === 55L * 2)
    val nested = df
      .select(explode(col("attester_slashings")).as("sl"))
      .select(explode(col("sl.attestation_1_attesting_indices")).as("vi"))
    assert(nested.count() > 0)
    assert(nested.agg(max("vi")).collect()(0).getLong(0) === 3L)
  }

  test("daily write materializes block_date and prunes partitions on read (A8, §4.1)") {
    val dir = tmpDir("daily")
    BeaconFixtures.write(s"$dir/blocks.json", BeaconFixtures.blockLines(3700)) // spans 2 days
    val df = BeaconIO.readBeaconTable(spark, "beacon_blocks", s"$dir/blocks.json")
    BeaconIO.writeDaily(df, "block_timestamp", s"$dir/out", format = "parquet")

    val dirs = new java.io.File(s"$dir/out").listFiles().map(_.getName).filter(_.startsWith("block_date=")).sorted
    assert(dirs.toSeq === Seq("block_date=2020-12-01", "block_date=2020-12-02"))

    val read = spark.read.parquet(s"$dir/out").filter(col("block_date") === "2020-12-02")
    val plan = read.queryExecution.executedPlan.toString
    assert(read.count() === 3700L - 3599L)
    assert(plan.contains("block_date"), "partition filter must appear in the scan")
  }

  test("dynamic partition overwrite keeps other dates intact (D5 idempotent replay)") {
    val dir = tmpDir("dyn")
    BeaconFixtures.write(s"$dir/blocks.json", BeaconFixtures.blockLines(3700))
    val all = BeaconIO.readBeaconTable(spark, "beacon_blocks", s"$dir/blocks.json")
    BeaconIO.writeDaily(all, "block_timestamp", s"$dir/out", format = "parquet")
    val before = spark.read.parquet(s"$dir/out").count()

    // replay only day 2: overwrite mode must not clobber day 1
    val day2 = all.filter(to_date(col("block_timestamp")) === "2020-12-02")
    BeaconIO.writeDaily(day2, "block_timestamp", s"$dir/out", format = "parquet")
    val after = spark.read.parquet(s"$dir/out")
    assert(after.count() === before, "replaying one partition must not drop the others")
    assert(after.filter(col("block_date") === "2020-12-01").count() === 3599L)
  }

  test("hourly layout adds hour=HH; latest dual sink overwrites fully (A9/A10/D6)") {
    val dir = tmpDir("hourly")
    // spacing 3600 s → epoch 0 in hour=12, epoch 1 in hour=13
    BeaconFixtures.write(s"$dir/v.json",
      BeaconFixtures.validatorLines(2, 5, epochSpacingSeconds = 3600))
    val df = BeaconIO.readBeaconTable(spark, "beacon_validators", s"$dir/v.json")
    val epoch0 = df.filter(col("epoch") === 0)
    BeaconIO.writeSnapshotWithLatest(epoch0, "timestamp",
      s"$dir/history", s"$dir/latest", format = "parquet")
    val hist = new java.io.File(s"$dir/history/block_date=2020-12-01").listFiles()
      .map(_.getName).filter(_.startsWith("hour=")).toSeq
    assert(hist === Seq("hour=12"))

    // second snapshot: history gains an hour partition, latest is replaced
    val epoch1 = df.filter(col("epoch") === 1)
    BeaconIO.writeSnapshotWithLatest(epoch1, "timestamp",
      s"$dir/history", s"$dir/latest", format = "parquet")
    assert(spark.read.parquet(s"$dir/latest").count() === 5L)
    assert(spark.read.parquet(s"$dir/latest").agg(max("epoch")).collect()(0).getLong(0) === 1L)
    assert(spark.read.parquet(s"$dir/history").count() === 10L)
  }

  test("readDate prunes to a single date partition") {
    val dir = tmpDir("readdate")
    BeaconFixtures.write(s"$dir/blocks.json", BeaconFixtures.blockLines(3700))
    val df = BeaconIO.readBeaconTable(spark, "beacon_blocks", s"$dir/blocks.json")
    BeaconIO.writeDaily(df, "block_timestamp", s"$dir/out", format = "parquet")
    val one = BeaconIO.readDate(spark, s"$dir/out", java.time.LocalDate.parse("2020-12-01"))
    assert(one.count() === 3599L)
    val scanned = one.queryExecution.executedPlan.toString
    assert(scanned.contains("block_date"), "read must carry the partition predicate")
  }
}
