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

  test("cron parse + next-fire matches the reference's daily 05:00 UTC rule") {
    // the reference's EventBridge rule, verbatim shape:
    // cloudformation/05_eventbridge-trigger.yml:39
    val c = Scheduler.Cron.parse("cron(0 5 * * ? *)")
    assert(c.nextAfter(Instant.parse("2026-08-12T04:59:30Z")) ==
      Instant.parse("2026-08-12T05:00:00Z"))
    // strictly-after: a fire AT 05:00 schedules the NEXT day
    assert(c.nextAfter(Instant.parse("2026-08-12T05:00:00Z")) ==
      Instant.parse("2026-08-13T05:00:00Z"))
    assert(c.nextAfter(Instant.parse("2026-08-12T23:59:59Z")) ==
      Instant.parse("2026-08-13T05:00:00Z"))
    // month rollover
    assert(c.nextAfter(Instant.parse("2026-08-31T06:00:00Z")) ==
      Instant.parse("2026-09-01T05:00:00Z"))
  }

  test("cron field shapes: steps, ranges, lists, day-of-week") {
    val quarterly = Scheduler.Cron.parse("*/15 * * * ? *")
    assert(quarterly.nextAfter(Instant.parse("2026-08-12T10:07:00Z")) ==
      Instant.parse("2026-08-12T10:15:00Z"))
    val workdays = Scheduler.Cron.parse("30 8 ? * 2-6 *") // Mon-Fri (EB: 1=Sun)
    // 2026-08-14 is a Friday; next fire after Friday 09:00 is Monday 08:30
    assert(workdays.nextAfter(Instant.parse("2026-08-14T09:00:00Z")) ==
      Instant.parse("2026-08-17T08:30:00Z"))
    val lists = Scheduler.Cron.parse("0 0,12 1 1,7 ? *")
    assert(lists.nextAfter(Instant.parse("2026-02-03T00:00:00Z")) ==
      Instant.parse("2026-07-01T00:00:00Z"))
    // a rule that can never fire must be rejected, not loop forever
    intercept[IllegalArgumentException] {
      Scheduler.Cron.parse("0 0 30 2 ? *")
        .nextAfter(Instant.parse("2026-01-01T00:00:00Z"))
    }
  }

  test("cron trigger drives firings at schedule matches via injected clock") {
    val c = Scheduler.Cron.parse("cron(0 5 * * ? *)")
    var now = Instant.parse("2026-08-12T03:00:00Z")
    val waits = Seq.newBuilder[Long]
    val nodes = Seq(Runner.Single(Runner.Stage("load", () => "ok")))
    val runs = Scheduler.runCron(nodes, Scheduler.CronTrigger(c, maxRuns = 2),
      clock = () => now,
      sleeper = ms => { waits += ms; now = now.plusMillis(ms) })
    assert(runs.map(_.scheduledFor) == Seq(
      Instant.parse("2026-08-12T05:00:00Z"),
      Instant.parse("2026-08-13T05:00:00Z")))
    assert(waits.result() == Seq(2L * 3600 * 1000, 24L * 3600 * 1000))
    assert(runs.forall(_.result.succeeded))
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
