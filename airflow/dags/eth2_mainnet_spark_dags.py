"""Example Airflow DAGs scheduling the Spark pipeline jobs.

The deployment story is the reference's thin DAG-instantiation file
(`/root/reference/dags/eth2_mainnet_hourly_export_dag.py:7-16`) with the
BigQuery/CLI tasks replaced by `spark-submit` of the library's entry points
(`graft.jobs.Eth2DailyExportJob` / `Eth2HourlyExportJob` /
`Eth2HourlyLoadJob` — see `src/main/scala/graft/jobs/Mains.scala`).

Submit contract (each task is one spark-submit):

    spark-submit --class graft.jobs.Eth2DailyExportJob  graft.jar \
        <providerUris|fixtureDir> <exportBase> <yyyy-MM-dd>
    spark-submit --class graft.jobs.Eth2HourlyExportJob graft.jar \
        <providerUris|fixtureDir> <exportBase> <yyyy-MM-dd> <hour>
    spark-submit --class graft.jobs.Eth2HourlyLoadJob   graft.jar \
        <exportBase> <warehouseBase> <yyyy-MM-dd> <hour>

A first argument starting with http(s):// selects the real beacon-node HTTP
client (comma-separated URIs = provider fallback order); rate limit and
fetch parallelism come from the EXPORT_RATE_LIMIT / EXPORT_MAX_WORKERS
environment variables (the reference's `export_rate_limit` /
`export_max_workers` Airflow Variables, `variables.py:15-21`).

The module imports cleanly without Airflow installed (the scheduler-less
test container): DAG construction is skipped, the submit contract above
still documents the interface.
"""
import os
import shlex

try:
    from datetime import datetime

    from airflow import DAG
    from airflow.operators.bash import BashOperator

    _HAVE_AIRFLOW = True
except ImportError:  # pragma: no cover - container has no airflow
    _HAVE_AIRFLOW = False

# Resolved the same way the reference reads its Airflow Variables
# (`variables.py:55-64`): environment first, defaults second.
GRAFT_JAR = os.environ.get("GRAFT_JAR", "/opt/graft/graft.jar")
PROVIDER_URIS = os.environ.get("ETH2_PROVIDER_URIS", "http://localhost:5052")
EXPORT_BASE = os.environ.get("ETH2_EXPORT_BASE", "/data/eth2/export")
WAREHOUSE_BASE = os.environ.get("ETH2_WAREHOUSE_BASE", "/data/eth2/warehouse")
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "spark-submit")


def _submit(job_class, *args):
    """One task = one spark-submit of a library entry point."""
    quoted = " ".join(shlex.quote(str(a)) for a in args)
    return f"{SPARK_SUBMIT} --class {job_class} {shlex.quote(GRAFT_JAR)} {quoted}"


if _HAVE_AIRFLOW:
    # Daily export: schedule + start date mirror the reference's mainnet DAG
    # (genesis day 2020-12-01, daily cadence — `build_export_dag.py:46-55`).
    # `schedule=` (not the reference era's `schedule_interval=`, deprecated
    # in Airflow 2.4 and removed in 3.0) so the example imports on current
    # releases.
    with DAG(
        dag_id="eth2_mainnet_spark_daily_export_dag",
        schedule="0 1 * * *",
        start_date=datetime(2020, 12, 1),
        max_active_runs=1,
        catchup=False,
    ) as daily_export_dag:
        BashOperator(
            task_id="daily_export",
            bash_command=_submit(
                "graft.jobs.Eth2DailyExportJob",
                PROVIDER_URIS, EXPORT_BASE, "{{ ds }}",
            ),
        )

    # Hourly export + load: `30 * * * *` like the reference
    # (`eth2_mainnet_hourly_export_dag.py:12`); load waits on export via a
    # cross-DAG completion gate (the ExternalTaskSensor analog is
    # Orchestration.awaitCompletion inside the load job).
    with DAG(
        dag_id="eth2_mainnet_spark_hourly_dag",
        schedule="30 * * * *",
        start_date=datetime(2020, 12, 1),
        max_active_runs=1,
        catchup=False,
    ) as hourly_dag:
        export = BashOperator(
            task_id="hourly_export",
            bash_command=_submit(
                "graft.jobs.Eth2HourlyExportJob",
                PROVIDER_URIS, EXPORT_BASE,
                "{{ ds }}", "{{ logical_date.strftime('%H') }}",
            ),
        )
        load = BashOperator(
            task_id="hourly_load",
            bash_command=_submit(
                "graft.jobs.Eth2HourlyLoadJob",
                EXPORT_BASE, WAREHOUSE_BASE,
                "{{ ds }}", "{{ logical_date.strftime('%H') }}",
            ),
        )
        export >> load
