package graft.pipeline

import java.time.Instant

/** Schedule hook for the DAG runner (SURVEY.md §2.8 W4) — the engine
  * counterpart of the reference's EventBridge trigger
  * (`cloudformation/05_eventbridge-trigger.yml:39`, the cron expression
  * `cron(0 5 * * ? *)` = daily 05:00 UTC) and the Snowflake TASK
  * schedule (`README.md:276-282`). The reference fires on that schedule
  * and keeps task history queryable; this does the same in-process:
  * a trigger (fixed-rate or cron) drives [[Runner.run]] and the audit
  * rows of every firing accumulate into one queryable history.
  *
  * Clock and sleeper are injectable so tests (and backfills) can drive
  * firings deterministically without wall-clock waits.
  */
object Scheduler {

  /** Fixed-rate trigger: fire every `intervalMs`, `maxRuns` times
    * (EventBridge `rate(...)` semantics). For the reference's actual
    * `cron(...)` rule shape, use [[CronTrigger]].
    */
  final case class Trigger(intervalMs: Long, maxRuns: Int)

  /** An EventBridge-style cron schedule over UTC, minute resolution:
    * `minute hour day-of-month month day-of-week`, each field `*`/`?`
    * (any), a number, a comma list, a range `a-b`, or a step `∗/n` /
    * `a/n`. Day-of-week is EventBridge numbering: 1 = Sunday … 7 =
    * Saturday. A trailing sixth (year) field is accepted and must be
    * `*` (the reference's rule uses `*`). Day-of-month and day-of-week
    * conditions are ANDed, with `?`/`*` meaning unconstrained — the
    * reference rule constrains at most one of them, where AND and
    * cron's historical OR semantics agree.
    */
  final case class Cron(minutes: Set[Int], hours: Set[Int],
                        daysOfMonth: Set[Int], months: Set[Int],
                        daysOfWeek: Set[Int]) {

    private def matches(t: java.time.ZonedDateTime): Boolean = {
      // java DayOfWeek: 1 = Monday … 7 = Sunday → EventBridge 1 = Sunday
      val ebDow = t.getDayOfWeek.getValue % 7 + 1
      minutes(t.getMinute) && hours(t.getHour) &&
        daysOfMonth(t.getDayOfMonth) && months(t.getMonthValue) &&
        daysOfWeek(ebDow)
    }

    /** First fire time STRICTLY after `t` (minute-grid scan; bounded by
      * ~4 years of minutes to reject never-matching rules like Feb 30).
      */
    def nextAfter(t: Instant): Instant = {
      var z = t.atZone(java.time.ZoneOffset.UTC)
        .truncatedTo(java.time.temporal.ChronoUnit.MINUTES)
        .plusMinutes(1)
      var steps = 0
      val maxSteps = 4 * 366 * 24 * 60
      while (!matches(z) && steps < maxSteps) {
        // jump by the coarsest non-matching unit, then scan minutes
        if (!months(z.getMonthValue))
          z = z.plusMonths(1).withDayOfMonth(1).withHour(0).withMinute(0)
        else if (!daysOfMonth(z.getDayOfMonth) ||
            !daysOfWeek(z.getDayOfWeek.getValue % 7 + 1))
          z = z.plusDays(1).withHour(0).withMinute(0)
        else if (!hours(z.getHour))
          z = z.plusHours(1).withMinute(0)
        else z = z.plusMinutes(1)
        steps += 1
      }
      require(steps < maxSteps, s"cron rule never fires: $this")
      z.toInstant
    }
  }

  object Cron {

    /** Parse `"cron(0 5 * * ? *)"` (the reference's EventBridge shape)
      * or a bare 5/6-field expression.
      */
    def parse(rule: String): Cron = {
      val body = rule.trim match {
        case r if r.startsWith("cron(") && r.endsWith(")") =>
          r.stripPrefix("cron(").stripSuffix(")")
        case r => r
      }
      val fields = body.trim.split("\\s+")
      require(fields.length == 5 || fields.length == 6,
        s"expected 5 or 6 cron fields, got ${fields.length} in '$rule'")
      if (fields.length == 6)
        require(fields(5) == "*",
          s"only year='*' is supported, got '${fields(5)}'")
      Cron(
        field(fields(0), 0, 59), field(fields(1), 0, 23),
        field(fields(2), 1, 31), field(fields(3), 1, 12),
        field(fields(4), 1, 7))
    }

    private def field(f: String, lo: Int, hi: Int): Set[Int] =
      f.split(",").toSet.flatMap { part: String =>
        part match {
          case "*" | "?" => (lo to hi).toSet
          case s if s.contains("/") =>
            val Array(base, step) = s.split("/", 2)
            val start = if (base == "*") lo else base.toInt
            (start to hi by step.toInt).toSet
          case s if s.contains("-") =>
            val Array(a, b) = s.split("-", 2)
            (a.toInt to b.toInt).toSet
          case s =>
            val v = s.toInt
            require(v >= lo && v <= hi, s"cron value $v out of [$lo,$hi]")
            Set(v)
        }
      }
  }

  /** Cron trigger: fire at each schedule match, `maxRuns` times. */
  final case class CronTrigger(cron: Cron, maxRuns: Int)

  /** One firing: when it was scheduled and what the run produced. */
  final case class ScheduledRun(scheduledFor: Instant,
                                result: Runner.RunResult)

  /** Drive `nodes` on the trigger. A failed run does NOT cancel later
    * firings (matching the reference: the cron fires regardless of the
    * last outcome; failures land in the log for the history query).
    */
  def runScheduled(nodes: Seq[Runner.Node], trigger: Trigger,
                   clock: () => Instant = () => Instant.now,
                   sleeper: Long => Unit = Thread.sleep): Seq[ScheduledRun] =
    (0 until trigger.maxRuns).map { i =>
      if (i > 0) sleeper(trigger.intervalMs)
      ScheduledRun(clock(), Runner.run(nodes))
    }

  /** Drive `nodes` on a cron schedule: each firing sleeps until the next
    * schedule match after `clock()`, then runs. Failure semantics match
    * [[runScheduled]]: a failed run never cancels later firings.
    */
  def runCron(nodes: Seq[Runner.Node], trigger: CronTrigger,
              clock: () => Instant = () => Instant.now,
              sleeper: Long => Unit = Thread.sleep): Seq[ScheduledRun] =
    (0 until trigger.maxRuns).map { _ =>
      val now = clock()
      val at = trigger.cron.nextAfter(now)
      sleeper(java.time.Duration.between(now, at).toMillis)
      ScheduledRun(at, Runner.run(nodes))
    }

  /** W4 task-history across all firings: every stage's audit row,
    * newest first (the `dim_etl_log` ORDER BY logged_at DESC intent,
    * `README.md:289-298`).
    */
  def history(runs: Seq[ScheduledRun]): Seq[Runner.EtlLogRecord] =
    runs.flatMap(_.result.log).sortBy(_.loggedAt).reverse
}
