package graft.pipeline

import java.time.Instant

/** Schedule hook for the DAG runner (SURVEY.md §2.8 W4) — the engine
  * counterpart of the reference's EventBridge cron trigger
  * (`cloudformation/05_eventbridge-trigger.yml:39`, a rate-based rule
  * that invokes the pipeline) and the Snowflake TASK schedule
  * (`README.md:276-282`). The reference runs on a fixed interval and
  * keeps task history queryable; this does the same in-process:
  * a fixed-interval trigger drives [[Runner.run]] and the audit rows of
  * every firing accumulate into one queryable history.
  *
  * Clock and sleeper are injectable so tests (and backfills) can drive
  * firings deterministically without wall-clock waits.
  */
object Scheduler {

  /** Fixed-rate trigger: fire every `intervalMs`, `maxRuns` times.
    * (EventBridge `rate(...)` semantics; cron-expression parsing is out
    * of scope — the reference's rule is rate-based too.)
    */
  final case class Trigger(intervalMs: Long, maxRuns: Int)

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

  /** W4 task-history across all firings: every stage's audit row,
    * newest first (the `dim_etl_log` ORDER BY logged_at DESC intent,
    * `README.md:289-298`).
    */
  def history(runs: Seq[ScheduledRun]): Seq[Runner.EtlLogRecord] =
    runs.flatMap(_.result.log).sortBy(_.loggedAt).reverse
}
