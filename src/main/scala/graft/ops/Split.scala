package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Vertical-partitioning (projection) operators (SURVEY.md §2.2 P5-P10).
  *
  * Reference: `script/nh-etl-provider-transform.py:31-102` splits the wide
  * provider table into facility / staffing / rating / surveys / penalties
  * frames via explicit selects and column-NAME-pattern projections, with a
  * guarded drop of identity columns. Schema-by-naming-convention: resilient
  * to upstream column additions (SURVEY.md §1.3).
  *
  * All column selection is driver-side metadata work (no job, no scan);
  * the resulting explicit `select` prunes the parquet scan to exactly the
  * needed columns — at 100 TB the scan reads only the projected columns.
  */
object Split {

  val Pk = "facility_number"

  /** Common identity columns dropped from non-facility dims
    * (`nh-etl-provider-transform.py:31`).
    */
  val DropCols: Seq[String] = Seq(
    "facility_name", "facility_address", "city_town", "zip_code")

  /** Declarative spec of one vertical partition. */
  final case class DomainSpec(
      name: String,
      explicitCols: Seq[String] = Nil,
      namePatterns: Seq[String] = Nil,
      dropAfter: Seq[String] = Nil) {

    /** Resolve against an actual schema (driver-side; logged column sets
      * per SURVEY.md §7.4.3).
      */
    def resolve(columns: Seq[String]): Seq[String] = {
      val picked =
        if (explicitCols.nonEmpty) explicitCols
        else columns.filter(c => namePatterns.exists(c.contains))
      picked.filterNot(dropAfter.contains)
    }

    def apply(df: DataFrame): DataFrame =
      df.select(resolve(df.columns.toSeq).map(col): _*)
  }

  /** P7: staffing — name contains any of pk/staffing/hours_per/turnover/
    * case_mix/adjusted (`nh-etl-provider-transform.py:68-70`).
    */
  val Staffing: DomainSpec = DomainSpec("staffing",
    namePatterns = Seq(Pk, "staffing", "hours_per", "turnover", "case_mix",
      "adjusted"),
    dropAfter = DropCols)

  /** P8: rating (`:75`). */
  val Rating: DomainSpec = DomainSpec("rating",
    namePatterns = Seq("rating", "footnote", Pk),
    dropAfter = DropCols)

  /** P9: surveys (`:80-82`). */
  val Surveys: DomainSpec = DomainSpec("surveys",
    namePatterns = Seq("rating_cycle", "health_deficiency", "revisit_score",
      "total_weighted_health_survey_score", Pk),
    dropAfter = DropCols)

  /** P5: facility — 23-column explicit select (`:36-61`). */
  val Facility: DomainSpec = DomainSpec("facility",
    explicitCols = Seq(Pk, "facility_name", "facility_address", "city_town",
      "state", "zip_code", "telephone_number", "provider_ssa_county_code",
      "county_parish", "ownership_type", "number_of_certified_beds",
      "average_number_of_residents_per_day",
      "average_number_of_residents_per_day_footnote", "facility_type",
      "provider_resides_in_hospital", "legal_business_name",
      "date_first_approved_to_provide_medicare_and_medicaid_services",
      "affiliated_entity_name", "affiliated_entity_id",
      "continuing_care_retirement_community", "special_focus_status",
      "abuse_icon", "row_id", "etl_date"))

  /** P6/penalties-in-provider: explicit penalties select (`:93-102`). */
  val Penalties: DomainSpec = DomainSpec("penalties",
    explicitCols = Seq(Pk, "number_of_facility_reported_incidents",
      "number_of_substantiated_complaints",
      "number_of_citations_from_infection_control_inspections",
      "number_of_fines", "total_amount_of_fines_in_dollars",
      "number_of_payment_denials", "total_number_of_penalties"))

  /** P6: quality-measures 18-column select
    * (`nh-etl-quality-transform.py:38-47`).
    */
  val Quality: DomainSpec = DomainSpec("qualitymsr_mds",
    explicitCols = Seq(Pk, "measure_code", "measure_description",
      "resident_type", "q1_measure_score", "footnote_for_q1_measure_score",
      "q2_measure_score", "footnote_for_q2_measure_score",
      "q3_measure_score", "footnote_for_q3_measure_score",
      "q4_measure_score", "footnote_for_q4_measure_score",
      "four_quarter_average_score",
      "footnote_for_four_quarter_average_score",
      "used_in_quality_measure_five_star_rating", "measure_period",
      "location", "processing_date"))

  /** P10: guarded drop — `drop` only columns actually present
    * (`nh-etl-provider-transform.py:70,75,82,85,105`).
    */
  def guardedDrop(df: DataFrame, cols: Seq[String]): DataFrame =
    df.drop(cols.filter(df.columns.contains): _*)

  /** P7-P9 generic form: select columns whose name contains any pattern. */
  def patternSelect(df: DataFrame, patterns: Seq[String]): DataFrame =
    df.select(df.columns.filter(c => patterns.exists(c.contains))
      .map(col): _*)
}
