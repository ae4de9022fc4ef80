package graft.jobs

import java.time.LocalDate

/** E7 — typed config resolution with chain prefixing, required-var checks
  * and type coercion, re-expressing `read_export_dag_vars` /
  * `read_load_dag_vars` / `read_var`
  * (`/root/reference/dags/ethereum2etl_airflow/variables.py:6-64`).
  *
  * Variables resolve from a plain map (tests) or the environment, looked up
  * as `{prefix}{name}` first then `{name}` — the reference's
  * `var_prefix` convention (`variables.py:55-64`).
  */
object PipelineConfig {

  final case class Vars(prefix: String, source: String => Option[String]) {
    def get(name: String): Option[String] =
      source(prefix + name).orElse(source(name)).map(_.trim).filter(_.nonEmpty)
    def required(name: String): String =
      get(name).getOrElse(throw new IllegalArgumentException(
        s"$prefix$name variable is required"))
    def int(name: String, default: Int): Int = get(name).map(_.toInt).getOrElse(default)
    def bool(name: String, default: Boolean): Boolean =
      get(name).map(_.toBoolean).getOrElse(default)
    def date(name: String): Option[LocalDate] = get(name).map(LocalDate.parse)
    def list(name: String): Seq[String] =
      get(name).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
  }

  /** `read_export_dag_vars` (`variables.py:6-35`). */
  final case class ExportConfig(
      providerUris: Seq[String],
      outputBucket: String,
      exportStartDate: LocalDate,
      exportEndDate: Option[LocalDate],
      exportMaxWorkers: Int,
      exportBatchSize: Int,
      notificationEmails: Seq[String])

  def readExportConfig(vars: Vars): ExportConfig = ExportConfig(
    providerUris = {
      val uris = vars.list("provider_uris")
      require(uris.nonEmpty, s"${vars.prefix}provider_uris variable is required")
      uris
    },
    outputBucket = vars.required("output_bucket"),
    exportStartDate = vars.date("export_start_date").getOrElse(LocalDate.parse("2020-12-01")),
    exportEndDate = vars.date("export_end_date"),
    exportMaxWorkers = vars.int("export_max_workers", 5),
    exportBatchSize = vars.int("export_batch_size", 10),
    notificationEmails = vars.list("notification_emails"))

  /** `read_load_dag_vars` (`variables.py:38-52`). */
  final case class LoadConfig(
      outputBucket: String,
      destinationDatasetProjectId: String,
      notificationEmails: Seq[String],
      loadStartDate: LocalDate,
      loadEndDate: Option[LocalDate],
      loadCatchup: Boolean)

  def readLoadConfig(vars: Vars): LoadConfig = {
    val end = vars.date("load_end_date")
    LoadConfig(
      outputBucket = vars.required("output_bucket"),
      destinationDatasetProjectId = vars.required("destination_dataset_project_id"),
      notificationEmails = vars.list("notification_emails"),
      loadStartDate = vars.date("load_start_date").getOrElse(LocalDate.parse("2020-12-01")),
      loadEndDate = end,
      // catchup flips on iff an end date is set (`build_load_dag.py:60`)
      loadCatchup = end.isDefined)
  }

  def fromEnv(prefix: String): Vars = Vars(prefix, n => sys.env.get(n))
  def fromMap(prefix: String, m: Map[String, String]): Vars = Vars(prefix, m.get)
}
