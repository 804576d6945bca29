package graft.pipeline

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

class SchedulerSpec extends AnyFunSuite {

  test("two scheduled firings produce distinct logged_at and full history") {
    // deterministic clock: advances 1h per call; sleeper records waits
    var tick = 0L
    val clock = () => { tick += 1; Instant.ofEpochSecond(tick * 3600) }
    val waits = Seq.newBuilder[Long]

    var invocations = 0
    val nodes = Seq(Runner.Single(Runner.Stage("load", () => {
      invocations += 1
      s"run $invocations"
    })))

    val runs = Scheduler.runScheduled(nodes,
      Scheduler.Trigger(intervalMs = 60000, maxRuns = 2),
      clock = clock, sleeper = waits += _)

    assert(runs.length == 2 && invocations == 2)
    assert(waits.result() == Seq(60000L), "sleeps only BETWEEN firings")
    assert(runs.map(_.scheduledFor).distinct.length == 2)
    assert(runs.forall(_.result.succeeded))

    val hist = Scheduler.history(runs)
    assert(hist.length == 2)
    assert(hist.map(_.loggedAt).distinct.length == 2,
      "each firing must stamp its own logged_at")
    // newest first
    assert(hist == hist.sortBy(_.loggedAt).reverse)
    assert(hist.head.message == "run 2")
  }

  test("a failed firing is logged but later firings still run") {
    var n = 0
    val nodes = Seq(Runner.Single(Runner.Stage("flaky", () => {
      n += 1
      if (n == 1) sys.error("boom")
      "ok"
    })))
    val runs = Scheduler.runScheduled(nodes,
      Scheduler.Trigger(intervalMs = 0, maxRuns = 2),
      sleeper = _ => ())
    assert(!runs.head.result.succeeded)
    assert(runs(1).result.succeeded)
    val statuses = Scheduler.history(runs).map(_.status)
    assert(statuses.toSet == Set("SUCCESS", "FAILED"))
  }
}
