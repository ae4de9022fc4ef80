package graft.jobs

import java.time.LocalDate

import graft.GraftSession

/** E8 — runnable pipeline entry points (the analog of the reference's DAG
  * factory instantiations, `/root/reference/dags/eth2_mainnet_hourly_export_dag.py:7-16`
  * and `eth2_mainnet_hourly_load_dag.py:12-19`).
  *
  * Each main takes CLI args instead of Airflow Variables; the same settings
  * resolve through [[PipelineConfig]] when driven from an environment.
  */
object Eth2ReplayJob {
  /** args: <fixtureDir> <workDir> [yyyy-MM-dd] — generate-or-use fixture
    * JSONL, run daily export → load → verify for the logical date.
    * `--gen-fixtures` as fixtureDir writes synthetic fixtures into workDir. */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Eth2ReplayJob <fixtureDir|--gen-fixtures> <workDir> [date]")
    val workDir = args(1)
    val ds = if (args.length > 2) LocalDate.parse(args(2)) else LocalDate.parse("2020-12-01")
    val fixtureDir =
      if (args(0) == "--gen-fixtures") {
        val dir = s"$workDir/fixtures"
        graft.BeaconFixtures.writeDay(dir, nSlots = 256, nValidators = 8)
        dir
      } else args(0)
    val spark = GraftSession.local(cores = 4, appName = "eth2-replay")
    try {
      BeaconPipeline.replayDay(spark, new JsonlBeaconSource(fixtureDir), ds, workDir)
      val n = spark.read.parquet(s"$workDir/warehouse/beacon_blocks").count()
      println(s"""{"job":"replay","date":"$ds","blocks_loaded":$n,"verify":"pass"}""")
    } finally spark.stop()
  }
}

/** Source dispatch shared by the export mains: an `http(s)://…[,fallback…]`
  * spec selects the real beacon-node client ([[graft.sources.HttpBeaconSource]])
  * with E3 provider fallback; anything else is a fixture JSONL directory.
  * Rate limit / worker count resolve through [[PipelineConfig.Vars]] from the
  * environment (`EXPORT_RATE_LIMIT`, `EXPORT_MAX_WORKERS` — the reference's
  * `export_rate_limit`/`export_max_workers` Airflow Variables,
  * `/root/reference/dags/ethereum2etl_airflow/variables.py:15-21`). */
private[jobs] object SourceDispatch {
  def sourceFor(spec: String): BeaconSource =
    if (spec.startsWith("http://") || spec.startsWith("https://")) {
      val vars = PipelineConfig.Vars("EXPORT_", name => sys.env.get(name.toUpperCase))
      new graft.sources.HttpBeaconSource(graft.sources.BeaconApiConfig(
        providerUris = spec.split(',').toSeq.map(_.trim).filter(_.nonEmpty),
        ratePerSecond = vars.get("RATE_LIMIT").map(_.toDouble),
        fetchTasks = vars.int("MAX_WORKERS", 8)))
    } else new JsonlBeaconSource(spec)
}

object Eth2DailyExportJob {
  /** args: <providerUrisOrFixtureDir> <exportBase> <yyyy-MM-dd> — the daily
    * export stage alone (`build_export_dag.py`), runnable against a live
    * beacon node URI list or a fixture directory. */
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: Eth2DailyExportJob <providerUris|fixtureDir> <exportBase> <date>")
    val spark = GraftSession.local(cores = 4, appName = "eth2-daily-export")
    try {
      BeaconPipeline.dailyExport(spark, SourceDispatch.sourceFor(args(0)),
        LocalDate.parse(args(2)), args(1))
      println(s"""{"job":"daily_export","date":"${args(2)}"}""")
    } finally spark.stop()
  }
}

object Eth2HourlyExportJob {
  /** args: <providerUrisOrFixtureDir> <exportBase> <yyyy-MM-dd> <hour> */
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: Eth2HourlyExportJob <providerUris|fixtureDir> <exportBase> <date> <hour>")
    val spark = GraftSession.local(cores = 4, appName = "eth2-hourly-export")
    try {
      BeaconPipeline.hourlyExport(spark, SourceDispatch.sourceFor(args(0)),
        LocalDate.parse(args(2)), args(3).toInt, args(1))
      println(s"""{"job":"hourly_export","date":"${args(2)}","hour":${args(3)}}""")
    } finally spark.stop()
  }
}

object Eth2HourlyLoadJob {
  /** args: <exportBase> <warehouseBase> <yyyy-MM-dd> <hour> — the analog of
    * `eth2_mainnet_hourly_load_dag.py:12-19`. */
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: Eth2HourlyLoadJob <exportBase> <warehouseBase> <date> <hour>")
    val spark = GraftSession.local(cores = 4, appName = "eth2-hourly-load")
    try {
      BeaconPipeline.hourlyLoad(spark, args(0), args(1),
        LocalDate.parse(args(2)), args(3).toInt)
      println(s"""{"job":"hourly_load","date":"${args(2)}","hour":${args(3)},"verify":"pass"}""")
    } finally spark.stop()
  }
}
