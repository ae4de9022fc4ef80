package graft.jobs

import scala.annotation.tailrec
import scala.collection.mutable
import scala.concurrent.duration._

/** Minimal dataflow orchestration (SURVEY.md §2-E) — the reference's
  * "physical plan" re-expressed as plain Scala: named task nodes with
  * dependency edges, bounded concurrency, retry policy, provider fallback,
  * and success/failure hooks.
  *
  * Reference anchors: task wrapper `add_export_task`
  * (`/root/reference/dags/ethereum2etl_airflow/build_export_dag.py:170-185`),
  * dependency edges + fan-in (`build_load_dag.py:142-144`), retry policy
  * (`build_export_dag.py:33-41`), provider fallback loop
  * (`build_export_dag.py:210-224`), concurrency=1
  * (`build_export_dag.py:46-55`), notification hooks
  * (`build_load_dag.py:134-144`).
  */
object Orchestration {

  /** E4 — retry with fixed delay (5 retries / 5 min in the reference;
    * tests pass small values). */
  final case class RetryPolicy(retries: Int = 5, delay: FiniteDuration = 5.minutes)

  /** E1/E2 — a named task with upstream dependencies. */
  final case class Task(id: String, deps: Seq[String] = Nil, enabled: Boolean = true)(
      val action: () => Unit)

  sealed trait TaskResult
  case object Succeeded extends TaskResult
  final case class Failed(error: Throwable, attempts: Int) extends TaskResult
  case object SkippedUpstream extends TaskResult
  case object Disabled extends TaskResult

  /** E3 — try each provider URI in order until one succeeds
    * (`build_export_dag.py:210-224`). */
  def withFallback[A](providerUris: Seq[String])(f: String => A): A = {
    require(providerUris.nonEmpty, "at least one provider uri required")
    @tailrec def loop(remaining: Seq[String]): A = remaining match {
      case Seq(last) => f(last)
      case head +: tail =>
        scala.util.Try(f(head)) match {
          case scala.util.Success(a) => a
          case scala.util.Failure(e) =>
            System.err.println(s"[fallback] provider $head failed: ${e.getMessage}")
            loop(tail)
        }
    }
    loop(providerUris)
  }

  /** E4 — run `f` under the retry policy. */
  def withRetries[A](policy: RetryPolicy, sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis))(
      f: () => A): A = {
    var attempt = 0
    var last: Throwable = null
    while (attempt <= policy.retries) {
      try return f()
      catch {
        case e: Throwable =>
          last = e; attempt += 1
          if (attempt <= policy.retries) sleep(policy.delay)
      }
    }
    throw last
  }

  /** A20 — availability sensor: poll until `probe` is true (poke 60 s,
    * timeout 1 h in the reference — `build_load_dag.py:67-74`). */
  def waitFor(probe: () => Boolean, poke: FiniteDuration = 60.seconds,
              timeout: FiniteDuration = 1.hour,
              sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis)): Boolean = {
    val deadline = System.nanoTime() + timeout.toNanos
    var ok = probe()
    while (!ok && System.nanoTime() < deadline) { sleep(poke); ok = probe() }
    ok
  }

  /** A21 — cross-pipeline task gate (the `ExternalTaskSensor` analog,
    * `/root/reference/dags/ethereum2etl_airflow/build_hourly_load_dag.py:70-80`:
    * the load pipeline's `load_beacon_validators_latest` waits on the
    * *export* pipeline's task of the same logical timestamp).
    *
    * Spark-era protocol: the upstream pipeline publishes a zero-byte
    * completion marker `markerDir/taskId/logicalTs` when a task finishes;
    * the downstream gate polls for it (reference cadence: poke 300 s,
    * timeout 2 h, reschedule mode). Markers are per-(task, logical time),
    * so replays of one logical hour gate independently of all others. */
  def publishCompletion(markerDir: String, taskId: String, logicalTs: String): Unit = {
    val dir = java.nio.file.Paths.get(markerDir, taskId)
    java.nio.file.Files.createDirectories(dir)
    val marker = dir.resolve(logicalTs)
    if (!java.nio.file.Files.exists(marker)) java.nio.file.Files.createFile(marker)
  }

  /** A21 — wait for another pipeline's `(taskId, logicalTs)` completion
    * marker. Returns false on timeout (caller fails the task → E4 retries). */
  def awaitCompletion(markerDir: String, taskId: String, logicalTs: String,
                      poke: FiniteDuration = 300.seconds,
                      timeout: FiniteDuration = 2.hours,
                      sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis)): Boolean =
    waitFor(
      () => java.nio.file.Files.exists(
        java.nio.file.Paths.get(markerDir, taskId, logicalTs)),
      poke, timeout, sleep)

  /** Token-bucket limiter for the ingestion client — the reference's
    * optional `export_rate_limit`
    * (`/root/reference/dags/ethereum2etl_airflow/variables.py:20-21`,
    * plumbed into every export command at `build_export_dag.py:25,82,96,115`).
    * `permitsPerSecond` tokens accrue continuously up to `burst`;
    * [[RateLimiter.acquire]] blocks until one is available. Used around
    * per-request client calls (driver or executor side — each fetch task
    * holds its own limiter, so the aggregate rate is `tasks × rate`, the
    * same semantics as the reference's per-worker limit). Clock and sleep
    * injectable for deterministic tests. */
  final class RateLimiter(permitsPerSecond: Double, burst: Int = 1,
                          nanoTime: () => Long = () => System.nanoTime(),
                          sleep: Long => Unit = ns =>
                            Thread.sleep(ns / 1000000L, (ns % 1000000L).toInt)) {
    require(permitsPerSecond > 0 && burst >= 1)
    private val intervalNanos = (1e9 / permitsPerSecond).toLong
    private var available = burst.toDouble // guarded by this
    private var last = nanoTime()

    def acquire(): Unit = synchronized {
      refill()
      while (available < 1.0) {
        sleep(((1.0 - available) * intervalNanos).toLong)
        refill()
      }
      available -= 1.0
    }

    def throttled[A](f: => A): A = { acquire(); f }

    private def refill(): Unit = {
      val now = nanoTime()
      available = math.min(burst.toDouble,
        available + (now - last).toDouble / intervalNanos)
      last = now
    }
  }

  /** A22 — plain file read util
    * (`/root/reference/dags/ethereum2etl_airflow/file_utils.py:1-4`). */
  def readFile(path: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)

  /** A16 — synchronous job submit + assert
    * (`bigquery_utils.py:24-33`): Spark actions already block; this names
    * the job and converts any failure into a hard assert. */
  def submitAndAssert[A](jobName: String)(f: => A): A =
    try f catch {
      case e: Throwable =>
        throw new IllegalStateException(s"job $jobName failed: ${e.getMessage}", e)
    }

  /** E1/E2/E5/E6 — topologically execute a task graph with `concurrency=1`
    * (the reference's setting); downstream of a failure is skipped; hooks
    * fire per terminal state. Throws on cycles or unknown deps. */
  def execute(tasks: Seq[Task], retry: RetryPolicy = RetryPolicy(retries = 0, delay = 0.seconds),
              onSuccess: String => Unit = _ => (), onFailure: (String, Throwable) => Unit = (_, _) => (),
              sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis)): Map[String, TaskResult] = {
    val byId = tasks.map(t => t.id -> t).toMap
    require(byId.size == tasks.size, "duplicate task ids")
    tasks.foreach(t => t.deps.foreach(d =>
      require(byId.contains(d), s"task ${t.id} depends on unknown task $d")))

    val results = mutable.Map[String, TaskResult]()
    val done = mutable.Set[String]()
    var progressed = true
    while (done.size < tasks.size && progressed) {
      progressed = false
      for (t <- tasks if !done(t.id) && t.deps.forall(done)) {
        progressed = true
        done += t.id
        results(t.id) =
          if (!t.enabled) Disabled
          else if (t.deps.exists(d => results(d) != Succeeded && results(d) != Disabled))
            SkippedUpstream
          else {
            var attempts = 0
            try {
              withRetries(retry, sleep) { () => attempts += 1; t.action() }
              onSuccess(t.id)
              Succeeded
            } catch {
              case e: Throwable => onFailure(t.id, e); Failed(e, attempts)
            }
          }
      }
    }
    if (done.size < tasks.size)
      throw new IllegalArgumentException(
        s"cycle in task graph: ${tasks.map(_.id).filterNot(done).mkString(", ")}")
    results.toMap
  }
}
