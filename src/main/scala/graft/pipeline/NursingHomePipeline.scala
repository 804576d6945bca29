package graft.pipeline

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.ops.{Cleaning, Joins, Split, Stamping}

/** The reference pipeline end-to-end, Spark-first (SURVEY.md §3):
  * ingest → universal cleaning → archive raw → validate staging →
  * parallel (provider transform, quality transform).
  *
  * Differences from the reference, by design:
  *  - validation BLOCKS (the reference's never did, §3.1.5);
  *  - the provider frame is persisted before its 5-way fan-out (the
  *    reference re-scans staging parquet per output, §3.3);
  *  - per-domain cleaning failures quarantine to the error zone and the
  *    run continues (C2 semantics preserved).
  */
final class NursingHomePipeline(spark: SparkSession, lake: Lake,
                                idStrategy: Stamping.IdStrategy = Stamping.Monotonic,
                                clock: Option[LocalDate] = None) {

  /** Stage 2 (`nh-etl-universal-cleaning.py:70-102`): for each raw
    * domain: CSV all-string read → normalize names → rename map → trim →
    * stamp → staging parquet. Empty domains skipped; failures routed to
    * the error zone.
    */
  def universalCleaning(): Seq[(String, String)] =
    Catalog.domains(lake.raw).map { domain =>
      val path = lake.rawDomain(domain)
      try {
        val df = spark.read.option("header", true).csv(path)
        if (df.isEmpty) { // df.isEmpty (head-based), not rdd.isEmpty (§4)
          domain -> "skipped-empty"
        } else {
          val cleaned = Stamping.stamp(
            Cleaning.universalClean(df), idStrategy, clock)
          cleaned.write.mode("overwrite").parquet(lake.stagingDomain(domain))
          domain -> "staged"
        }
      } catch {
        case e: Exception =>
          try {
            spark.read.option("header", true).csv(path)
              .write.mode("overwrite").parquet(lake.errorDomain(domain))
          } catch { case _: Exception => () }
          domain -> s"error: ${e.getMessage}"
      }
    }

  /** Stage 5a (`nh-etl-provider-transform.py`): vertical split of the
    * wide provider table into 5 dims with 2 broadcast left-joins.
    * The source frame is persisted once for the fan-out; each output is
    * stamped and written to the transform zone.
    */
  def providerTransform(): Seq[String] = {
    val df = spark.read.parquet(lake.stagingDomain("provider_info"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // facility: explicit 23-col projection, written as-is (`:36-62`)
      Split.Facility(df).write.mode("overwrite")
        .parquet(lake.transformDomain("facility"))

      val surveySummary = Split.guardedDrop(
        spark.read.parquet(lake.stagingDomain("survey_summary")),
        Split.DropCols)
      val penaltiesExt = Split.guardedDrop(
        spark.read.parquet(lake.stagingDomain("penalties")),
        Split.DropCols)

      val outputs: Seq[(String, DataFrame)] = Seq(
        "staffing" -> Split.Staffing(df),
        "rating" -> Split.Rating(df),
        "surveys" -> Joins.leftEnrich(Split.Surveys(df), surveySummary,
          Split.Pk),
        "penalties" -> Joins.leftEnrich(Split.Penalties(df), penaltiesExt,
          Split.Pk))

      outputs.map { case (name, frame) =>
        Stamping.stamp(frame, idStrategy, clock)
          .write.mode("overwrite").parquet(lake.transformDomain(name))
        name
      } :+ "facility"
    } finally df.unpersist()
  }

  /** Stage 5b (`nh-etl-quality-transform.py:27-67`): quality-measures
    * projection with guarded drop, stamped, written; failures quarantine
    * the staged frame to the error zone.
    */
  def qualityTransform(): String = {
    val domain = "qualitymsr_mds"
    val df = spark.read.parquet(lake.stagingDomain(domain))
    try {
      val projected = Split.Quality(
        Split.guardedDrop(df,
          Seq("facility_name", "provider_address", "city_town", "zip_code")))
      Stamping.stamp(projected, idStrategy, clock)
        .write.mode("overwrite").parquet(lake.transformDomain(domain))
      domain
    } catch {
      case e: Exception =>
        df.write.mode("overwrite").parquet(lake.errorDomain(domain))
        throw e
    }
  }

  /** The full DAG (§3.1), stage-for-stage with the Step Function. */
  def run(inboxDir: String, manifestPath: String,
          requiredDomains: Seq[String] = Seq("provider_info",
            "qualitymsr_mds", "survey_summary", "penalties")): Runner.RunResult =
    Runner.run(Seq(
      Runner.Single(Runner.Stage("sync_inbox", () => {
        val r = Ingest.run(inboxDir, lake, manifestPath)
        s"synced=${r.synced.size} skipped=${r.skipped.size}"
      })),
      Runner.Single(Runner.Stage("universal_cleaning", () =>
        universalCleaning().map { case (d, s) => s"$d:$s" }.mkString(","))),
      Runner.Single(Runner.Stage("move_source_files", () =>
        Ingest.archiveRaw(lake, requiredDomains.toSet).toSeq.sorted
          .map { case (d, t) => s"$d->$t" }.mkString(","))),
      Runner.Single(Runner.Stage("validate_staging", () => {
        val v = Catalog.validate(lake.staging, requiredDomains)
        if (!v.ok) throw new IllegalStateException(v.message)
        v.message
      })),
      Runner.Par(Seq(
        Runner.Stage("provider_transform", () =>
          providerTransform().sorted.mkString(",")),
        Runner.Stage("quality_transform", () => qualityTransform())))))
}
