package graft.jobs

import org.scalatest.funsuite.AnyFunSuite

import scala.concurrent.duration._

class OrchestrationSpec extends AnyFunSuite {

  import Orchestration._

  private val noSleep: FiniteDuration => Unit = _ => ()

  test("provider fallback tries URIs in order and returns the first success (E3)") {
    var tried = Vector.empty[String]
    val out = withFallback(Seq("bad1", "bad2", "good")) { uri =>
      tried :+= uri
      if (uri.startsWith("bad")) sys.error(s"$uri down") else s"ok:$uri"
    }
    assert(out === "ok:good")
    assert(tried === Vector("bad1", "bad2", "good"))
  }

  test("fallback rethrows the last provider's error when all fail") {
    val e = intercept[RuntimeException] {
      withFallback(Seq("a", "b")) { uri => sys.error(s"$uri down"): String }
    }
    assert(e.getMessage === "b down")
  }

  test("retry policy retries then succeeds (E4)") {
    var calls = 0
    val out = withRetries(RetryPolicy(retries = 5, delay = 1.milli), noSleep) { () =>
      calls += 1
      if (calls < 3) sys.error("flaky") else 42
    }
    assert(out === 42 && calls === 3)
  }

  test("retry policy exhausts and rethrows") {
    var calls = 0
    intercept[RuntimeException] {
      withRetries(RetryPolicy(retries = 2, delay = 1.milli), noSleep) { () =>
        calls += 1; sys.error("always down")
      }
    }
    assert(calls === 3)
  }

  test("sensor polls until available and honors timeout (A20)") {
    var polls = 0
    assert(waitFor(() => { polls += 1; polls >= 3 }, poke = 1.milli,
      timeout = 1.second, sleep = noSleep))
    assert(!waitFor(() => false, poke = 10.millis, timeout = 30.millis,
      sleep = d => Thread.sleep(d.toMillis)))
  }

  test("cross-pipeline gate sees the marker for its own logical time only (A21)") {
    val dir = java.nio.file.Files.createTempDirectory("markers").toString
    // downstream waits; upstream hasn't published → poll till timeout
    assert(!awaitCompletion(dir, "export_beacon_validators_hourly",
      "2020-12-01T05", poke = 1.milli, timeout = 10.millis, sleep = noSleep))
    // upstream publishes a DIFFERENT hour — still gated
    publishCompletion(dir, "export_beacon_validators_hourly", "2020-12-01T04")
    assert(!awaitCompletion(dir, "export_beacon_validators_hourly",
      "2020-12-01T05", poke = 1.milli, timeout = 10.millis, sleep = noSleep))
    // the matching logical hour unblocks; publish is idempotent (replay-safe)
    publishCompletion(dir, "export_beacon_validators_hourly", "2020-12-01T05")
    publishCompletion(dir, "export_beacon_validators_hourly", "2020-12-01T05")
    assert(awaitCompletion(dir, "export_beacon_validators_hourly",
      "2020-12-01T05", poke = 1.milli, timeout = 1.second, sleep = noSleep))
  }

  test("rate limiter enforces the configured request rate (token bucket)") {
    var now = 0L // fake nanos
    var slept = 0L
    val rl = new RateLimiter(permitsPerSecond = 2, burst = 2,
      nanoTime = () => now, sleep = ns => { slept += ns; now += ns })
    rl.acquire(); rl.acquire() // burst drains free
    assert(slept === 0L)
    rl.acquire() // third must wait ~one 500ms interval
    assert(slept === 500L * 1000000L)
    now += 2000L * 1000000L // 2 s idle refills up to burst, never beyond
    val before = slept
    rl.acquire(); rl.acquire()
    assert(slept === before)
    var calls = 0
    assert(rl.throttled { calls += 1; 7 } === 7 && calls === 1)
  }

  test("task graph runs in dependency order with fan-in (E1/E2)") {
    var order = Vector.empty[String]
    def t(id: String, deps: String*) = Task(id, deps)(() => order :+= id)
    val res = Orchestration.execute(Seq(
      t("email", "v1", "v2", "v3"), t("v1", "load"), t("v2", "load"),
      t("v3", "load"), t("load", "export"), t("export")))
    assert(res.values.forall(_ === Succeeded))
    assert(order.head === "export" && order(1) === "load" && order.last === "email")
  }

  test("failure skips downstream, fires hooks, leaves siblings running (E2/E6)") {
    var failed = Vector.empty[String]
    var succeeded = Vector.empty[String]
    val res = Orchestration.execute(
      Seq(
        Task("a")(() => sys.error("boom")),
        Task("b", Seq("a"))(() => ()),
        Task("c")(() => ())),
      onSuccess = succeeded :+= _,
      onFailure = (id, _) => failed :+= id)
    assert(res("a").isInstanceOf[Failed])
    assert(res("b") === SkippedUpstream)
    assert(res("c") === Succeeded)
    assert(failed === Vector("a") && succeeded === Vector("c"))
  }

  test("disabled task is skipped but does not block downstream (toggle arg)") {
    var ran = Vector.empty[String]
    val res = Orchestration.execute(Seq(
      Task("a", enabled = false)(() => ran :+= "a"),
      Task("b", Seq("a"))(() => ran :+= "b")))
    assert(res("a") === Disabled && res("b") === Succeeded && ran === Vector("b"))
  }

  test("cycles are rejected") {
    intercept[IllegalArgumentException] {
      Orchestration.execute(Seq(Task("a", Seq("b"))(() => ()), Task("b", Seq("a"))(() => ())))
    }
  }
}
