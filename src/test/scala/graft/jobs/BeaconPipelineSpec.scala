package graft.jobs

import org.apache.spark.sql.functions._

import graft.{BeaconFixtures, SparkTestBase}

/** End-to-end single-day replay (SURVEY.md §5.2 item 4, mirroring the
  * reference's bounded integration test `/root/reference/README.md:105-117`):
  * fixture JSONL → daily export (partitioned JSONL) → load (parquet
  * warehouse) → all four verify checks green. */
class BeaconPipelineSpec extends SparkTestBase {

  test("single-day replay: export → load → verify all green (E8)") {
    val work = tmpDir("replay")
    val fixtures = s"$work/fixtures"
    BeaconFixtures.writeDay(fixtures, nSlots = 128, nValidators = 6)
    val source = new JsonlBeaconSource(fixtures)

    BeaconPipeline.replayDay(spark, source, BeaconFixtures.GenesisDay, work)

    // warehouse tables exist, partitioned by block_date, and re-read clean
    val blocks = spark.read.parquet(s"$work/warehouse/beacon_blocks")
    assert(blocks.count() === 128L)
    assert(blocks.columns.contains("block_date"))
    val committees = spark.read.parquet(s"$work/warehouse/beacon_committees")
    assert(committees.select(countDistinct(col("epoch"))).collect()(0).getLong(0) === 4L)
    val validators = spark.read.parquet(s"$work/warehouse/beacon_validators")
    // decimal NUMERIC balances survive the JSONL round-trip exactly
    val bal = validators.agg(max("balance")).collect()(0).getDecimal(0)
    assert(bal.toPlainString === "32000000000.500000000")
  }

  test("replay is idempotent: running the same day twice changes nothing (D5)") {
    val work = tmpDir("replay2")
    val fixtures = s"$work/fixtures"
    BeaconFixtures.writeDay(fixtures, nSlots = 96, nValidators = 4)
    val source = new JsonlBeaconSource(fixtures)

    BeaconPipeline.replayDay(spark, source, BeaconFixtures.GenesisDay, work)
    val first = spark.read.parquet(s"$work/warehouse/beacon_blocks").count()
    BeaconPipeline.replayDay(spark, source, BeaconFixtures.GenesisDay, work)
    val second = spark.read.parquet(s"$work/warehouse/beacon_blocks").count()
    assert(first === second && first === 96L)
  }

  test("range-meta sidecars are published next to the data and parse back (A4/A5)") {
    val work = tmpDir("meta")
    BeaconFixtures.writeDay(s"$work/fixtures", nSlots = 64, nValidators = 3)
    val source = new JsonlBeaconSource(s"$work/fixtures")
    val ds = BeaconFixtures.GenesisDay
    BeaconPipeline.dailyExport(spark, source, ds, s"$work/export")
    assert(graft.io.BeaconIO.readRangeMeta(
      s"$work/export/beacon_blocks", ds, "blocks_meta.txt")
      === graft.model.BeaconFunctions.slotRangeForDate(ds))
    assert(graft.io.BeaconIO.readRangeMeta(
      s"$work/export/beacon_committees", ds, "epochs_meta.txt")
      === graft.model.BeaconFunctions.epochRangeForDate(ds))
  }

  test("validators load truncates stale snapshots; event tables keep history (only_last_date)") {
    val work = tmpDir("trunc")
    BeaconFixtures.writeDay(s"$work/fixtures", nSlots = 64, nValidators = 3)
    val source = new JsonlBeaconSource(s"$work/fixtures")
    val ds = BeaconFixtures.GenesisDay
    BeaconPipeline.replayDay(spark, source, ds, work)
    // plant a stale prior-day partition in both warehouse tables
    for (t <- Seq("beacon_validators", "beacon_blocks")) {
      assert(graft.io.FsTransfer.copyTree(
        s"$work/warehouse/$t/block_date=$ds",
        s"$work/warehouse/$t/block_date=2020-11-30"))
    }
    BeaconPipeline.load(spark, s"$work/export", s"$work/warehouse", ds, verify = false)
    def dates(t: String): Set[String] =
      spark.read.parquet(s"$work/warehouse/$t")
        .select(col("block_date").cast("string")).distinct()
        .collect().map(_.getString(0)).toSet
    // WRITE_TRUNCATE semantics: the snapshot table holds ONLY the logical date
    assert(dates("beacon_validators") === Set(ds.toString))
    // dynamic overwrite: event history outside the replayed date is retained
    assert(dates("beacon_blocks") === Set(ds.toString, "2020-11-30"))
  }

  test("hourly load: hour partitions, validators history + latest, verify green") {
    val work = tmpDir("hourly-load")
    BeaconFixtures.writeDay(s"$work/fixtures", nSlots = 3700, nValidators = 4)
    val source = new JsonlBeaconSource(s"$work/fixtures")
    val ds = BeaconFixtures.GenesisDay
    BeaconPipeline.hourlyExport(spark, source, ds, 12, s"$work/export_hourly")
    BeaconPipeline.hourlyLoad(spark, s"$work/export_hourly", s"$work/warehouse", ds, 12)
    val blocks = spark.read.parquet(s"$work/warehouse/beacon_blocks")
    // genesis is 12:00:23, so hour 12 holds slots 0..floor((3600-23-1)/12)
    assert(blocks.count() === ((3600 - 23) / 12 + 1).toLong)
    assert(blocks.columns.contains("hour"))
    assert(spark.read.parquet(s"$work/warehouse/beacon_validators_hourly").count() > 0)
    // latest = the full current snapshot, WRITE_TRUNCATE overwritten hourly
    assert(spark.read.parquet(s"$work/warehouse/beacon_validators_latest")
      .select("validator_index").distinct().count() === 4L)
    // idempotent replay of the same hour
    BeaconPipeline.hourlyLoad(spark, s"$work/export_hourly", s"$work/warehouse", ds, 12)
    assert(spark.read.parquet(s"$work/warehouse/beacon_blocks").count()
      === ((3600 - 23) / 12 + 1).toLong)
  }

  test("hourly export writes hour partitions and the validators latest sink") {
    val work = tmpDir("hourly-exp")
    val fixtures = s"$work/fixtures"
    BeaconFixtures.writeDay(fixtures, nSlots = 3700, nValidators = 4) // spans 2 days
    val source = new JsonlBeaconSource(fixtures)

    BeaconPipeline.hourlyExport(spark, source, BeaconFixtures.GenesisDay, 12,
      s"$work/export_hourly")
    val blocks = spark.read.option("basePath", s"$work/export_hourly/beacon_blocks")
      .json(s"$work/export_hourly/beacon_blocks")
    assert(blocks.select(col("hour").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq === Seq("12"))
    // hour 12 of genesis day: first slot is genesis (12:00:23), last before 13:00
    assert(blocks.count() === ((3600 - 23) / 12 + 1).toLong)
    assert(new java.io.File(s"$work/export_hourly/beacon_validators_latest").exists())
  }
}
