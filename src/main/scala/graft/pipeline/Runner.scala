package graft.pipeline

import java.time.Instant
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}

/** In-process DAG runner (SURVEY.md §2.7 C3/C9, §2.8 W3/W4) — the engine
  * equivalent of the reference's Step Function
  * (`cloudformation/06_stepfunction.json:4-138`): sequential stages, a
  * parallel fan-out, typed failures that short-circuit, and an ETL audit
  * log row per stage outcome (the Snowflake `dim_etl_log` intent,
  * `README.md:225-266`).
  */
object Runner {

  /** One pipeline stage; `run` returns a human-readable success message. */
  final case class Stage(name: String, run: () => String)

  sealed trait Node
  final case class Single(stage: Stage) extends Node
  /** Parallel fan-out — the reference runs provider + quality transforms
    * concurrently (`06_stepfunction.json:92-129`).
    */
  final case class Par(stages: Seq[Stage]) extends Node

  /** W3: audit record, mirroring dim_etl_log (proc_name, status,
    * message, logged_at).
    */
  final case class EtlLogRecord(procName: String, status: String,
                                message: String, loggedAt: String)

  final case class RunResult(succeeded: Boolean, log: Seq[EtlLogRecord]) {
    /** W4: the task-history view — newest first. */
    def history: Seq[EtlLogRecord] = log.sortBy(_.loggedAt).reverse
  }

  /** Execute nodes in order; a failed stage short-circuits the rest
    * (typed Fail states per stage in the reference). Parallel stages run
    * on the given EC and all must succeed.
    */
  def run(nodes: Seq[Node])(implicit
      ec: ExecutionContext = ExecutionContext.global): RunResult = {
    val log = Seq.newBuilder[EtlLogRecord]

    def exec(stage: Stage): Boolean = Try(stage.run()) match {
      case Success(msg) =>
        log += EtlLogRecord(stage.name, "SUCCESS", msg, Instant.now.toString)
        true
      case Failure(e) =>
        log += EtlLogRecord(stage.name, "FAILED",
          Option(e.getMessage).getOrElse(e.getClass.getName),
          Instant.now.toString)
        false
    }

    val ok = nodes.foldLeft(true) {
      case (false, _) => false // short-circuit after first failure
      case (true, Single(s)) => exec(s)
      case (true, Par(stages)) =>
        val fs = stages.map(s => Future(exec(s)))
        Await.result(Future.sequence(fs), Duration.Inf).forall(identity)
    }
    RunResult(ok, log.result())
  }
}
