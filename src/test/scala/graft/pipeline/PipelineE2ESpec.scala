package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.ops.Stamping

/** End-to-end smoke (SURVEY.md §5 tier t1): a reference-shaped raw lake
  * (FIXTURES.md §1) driven through the full DAG — ingest routing,
  * universal cleaning, archival, blocking validation, parallel
  * transforms — asserting zone contents and output schemas.
  */
class PipelineE2ESpec extends SparkSpec {

  private def writeCsv(path: String, header: String, rows: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path), (header +: rows).mkString("\n"))
  }

  test("full pipeline: inbox → raw → staging → transform with audit log") {
    val root = Files.createTempDirectory("graft-e2e").toString
    val lake = Lake(s"$root/lake")
    val inbox = s"$root/inbox"

    // reference-shaped inbox files (FIXTURES.md §1.5 routing)
    writeCsv(s"$inbox/NH_ProviderInfo_Apr2025.csv",
      "CMS Certification Number (CCN),Provider Name,Provider Address," +
        "City/Town,State,ZIP Code,Telephone Number," +
        "Provider SSA County Code,County/Parish,Ownership Type," +
        "Number of Certified Beds,Average Number of Residents per Day," +
        "Average Number of Residents per Day Footnote,Provider Type," +
        "Provider Resides in Hospital,Legal Business Name," +
        "Date First Approved to Provide Medicare and Medicaid Services," +
        "Affiliated Entity Name,Affiliated Entity ID," +
        "Continuing Care Retirement Community,Special Focus Status," +
        "Abuse Icon,Overall Rating,Staffing Rating," +
        "Reported Nurse Aide Staffing Hours per Resident per Day," +
        "Total nursing staff turnover,Rating Cycle 1 Health Revisit Score," +
        "Total Weighted Health Survey Score," +
        "Number of Facility Reported Incidents," +
        "Number of Substantiated Complaints," +
        "Number of Citations from Infection Control Inspections," +
        "Number of Fines,Total Amount of Fines in Dollars," +
        "Number of Payment Denials,Total Number of Penalties",
      Seq(
        "015009, ALPINE CARE ,1 Main St,Town A,AL,35007,555-0100,290," +
          "Shelby,For profit,85, 80.1 ,,Medicare and Medicaid,NO," +
          "ALPINE LLC,1991-01-01,ENT A,123,N,,N,4,3,2.5,55.0,0.5,70.0," +
          "1,2,0,1,65000,0,2",
        "015010,BETA HOME,2 Oak Ave,Town B,AL,35010,555-0200,291," +
          "Jefferson,Non profit,120,110.4,,Medicare,NO,BETA INC," +
          "1992-02-02,ENT B,456,Y,,N,5,4,3.1,40.0,0.2,50.0," +
          "0,1,1,0,0,1,1"))
    writeCsv(s"$inbox/NH_SurveySummary_Apr2025.csv",
      "CMS Certification Number (CCN),Provider Name,City/Town,ZIP Code," +
        "Survey Date,Survey Type,Count of Health Deficiencies," +
        "Count of Fire Safety Deficiencies",
      Seq("015009,ALPINE CARE,Town A,35007,2025-01-15,Health,3,1",
        "015010,BETA HOME,Town B,35010,2025-02-20,Health,1,0"))
    writeCsv(s"$inbox/NH_Penalties_Apr2025.csv",
      "CMS Certification Number (CCN),Provider Name,Provider Address," +
        "City/Town,ZIP Code,Penalty Date,Penalty Type,Fine Amount",
      Seq("015009,ALPINE CARE,1 Main St,Town A,35007,2024-11-01," +
        "Fine,32500"))
    writeCsv(s"$inbox/NH_QualityMDS_Apr2025.csv",
      "CMS Certification Number (CCN),Provider Name,Provider Address," +
        "City/Town,ZIP Code,Measure Code,Measure Description," +
        "Resident Type,Q1 Measure Score,Footnote for Q1 Measure Score," +
        "Q2 Measure Score,Footnote for Q2 Measure Score,Q3 Measure Score," +
        "Footnote for Q3 Measure Score,Q4 Measure Score," +
        "Footnote for Q4 Measure Score,Four Quarter Average Score," +
        "Footnote for Four Quarter Average Score," +
        "Used in Quality Measure Five Star Rating,Measure Period," +
        "Location,Processing Date",
      Seq("015009,ALPINE CARE,1 Main St,Town A,35007,401,Falls,Long Stay," +
        "1.1,,1.2,,1.3,,1.4,,1.25,,Y,2024Q1-2024Q4,Onsite,2025-03-01"))
    // an unknown file routes to raw/other/ and then the error zone
    writeCsv(s"$inbox/NH_Mystery_Apr2025.csv", "A,B", Seq("1,2"))

    val pipeline = new NursingHomePipeline(spark, lake,
      Stamping.Deterministic(Seq("facility_number")),
      Some(java.time.LocalDate.of(2026, 1, 1)))
    val result = pipeline.run(inbox, s"$root/manifest.json")

    assert(result.succeeded,
      result.log.map(r => s"${r.procName}=${r.status}:${r.message}")
        .mkString("; "))

    // transform outputs exist with conformed pk + stamps
    val facility = spark.read.parquet(lake.transformDomain("facility"))
    assert(facility.count() == 2)
    assert(facility.columns.contains("facility_number") &&
      facility.columns.contains("row_id") &&
      facility.columns.contains("etl_date"))
    // staffing split excludes identity cols, includes pattern matches
    val staffing = spark.read.parquet(lake.transformDomain("staffing"))
    assert(staffing.columns.exists(_.contains("staffing")) &&
      !staffing.columns.contains("facility_name"))
    // surveys joined with survey_summary side table
    val surveys = spark.read.parquet(lake.transformDomain("surveys"))
    assert(surveys.columns.contains("survey_type"))
    // penalties joined with penalties side table
    val penalties = spark.read.parquet(lake.transformDomain("penalties"))
    assert(penalties.columns.contains("penalty_type") &&
      penalties.count() == 2) // left join keeps both facilities
    // quality projection
    val quality = spark.read.parquet(lake.transformDomain("qualitymsr_mds"))
    assert(quality.columns.contains("measure_code") &&
      !quality.columns.contains("provider_address"))
    // values cleaned: trimmed cells
    val name = facility.filter(facility("facility_number") === "015009")
      .select("facility_name").head().getString(0)
    assert(name == "ALPINE CARE")

    // raw archived: known domains → processed/, unknown → error/
    assert(Catalog.nonEmpty(s"${lake.processed}/provider_info"))
    assert(Catalog.nonEmpty(s"${lake.error}/raw_other"))

    // audit log has one row per stage, all SUCCESS
    assert(result.log.size == 6)
    assert(result.log.forall(_.status == "SUCCESS"))

    // idempotent re-ingest: second run syncs nothing new
    val report2 = Ingest.run(inbox, lake, s"$root/manifest.json")
    assert(report2.synced.isEmpty && report2.skipped.size == 5)
  }

  test("validation gate blocks on missing required domain") {
    val root = Files.createTempDirectory("graft-gate").toString
    val lake = Lake(s"$root/lake")
    val inbox = s"$root/inbox"
    writeCsv(s"$inbox/NH_ProviderInfo_X.csv",
      "CMS Certification Number (CCN),Provider Name", Seq("1,A"))

    val pipeline = new NursingHomePipeline(spark, lake)
    val result = pipeline.run(inbox, s"$root/manifest.json")
    assert(!result.succeeded)
    val gate = result.log.find(_.procName == "validate_staging").get
    assert(gate.status == "FAILED" && gate.message.contains("No files found"))
    // transforms never ran (short-circuit)
    assert(!result.log.exists(_.procName == "provider_transform"))
  }

  test("ingest routing mirrors the reference mapping") {
    assert(Ingest.route("NH_ProviderInfo_Apr2025.csv") == "provider_info")
    assert(Ingest.route("NH_QualityMDS_2025.csv") == "qualitymsr_mds")
    assert(Ingest.route("NH_SurveySummary.csv") == "survey_summary")
    assert(Ingest.route("NH_Penalties.csv") == "penalties")
    assert(Ingest.route("random_file.csv") == "other")
  }
}
