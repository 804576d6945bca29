package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints over a table — the dbt-test /
  * Deequ-style contract check a lake pipeline runs before publishing a
  * load (extends the reference's single blocking completeness gate,
  * `validate_staging.py:15-47`, to a rule vocabulary). Each rule
  * reports its violation count; a publisher blocks when any
  * `passed = false`.
  *
  * Scale shape: every row-local rule (not-null, accepted-values,
  * range) compiles into ONE shared full-scan aggregate — one pass over
  * the table regardless of rule count, map-side partials, no shuffle.
  * `Unique` adds one hash aggregate on its key columns (narrow: keys
  * only). `RefIntegrity` adds one join against the parent's distinct
  * keys — broadcastable for dimension-sized parents. Nothing ever
  * collects rows; violations are counted, not materialized.
  */
object Validation {

  sealed trait Rule { def name: String }

  /** Row-local rules: a per-row predicate whose failures are summed. */
  sealed trait LocalRule extends Rule {
    def kind: String
    /** True when the row VIOLATES the rule. */
    def violation: Column
  }

  case class NotNull(column: String) extends LocalRule {
    val name = s"${column}_not_null"
    val kind = "not_null"
    def violation: Column = col(column).isNull
  }

  case class AcceptedValues(column: String, allowed: Seq[String])
      extends LocalRule {
    require(allowed.nonEmpty, s"$column: empty accepted-values list")
    val name = s"${column}_accepted_values"
    val kind = "accepted_values"
    // null is a not-null rule's business, not this one's
    def violation: Column =
      col(column).isNotNull && !col(column).isin(allowed: _*)
  }

  case class InRange(column: String, lo: Double, hi: Double)
      extends LocalRule {
    require(lo <= hi, s"$column: lo > hi")
    val name = s"${column}_in_range"
    val kind = "in_range"
    def violation: Column =
      col(column).isNotNull && !col(column).between(lo, hi)
  }

  /** Duplicate-key rule: violations = rows living in a key group of
    * size > 1 (so a clean table scores 0 and every extra copy AND its
    * original count — the "rows you cannot publish as-is" number).
    */
  case class Unique(columns: Seq[String]) extends Rule {
    require(columns.nonEmpty, "Unique needs at least one column")
    val name = s"${columns.mkString("_")}_unique"
  }

  /** Referential integrity: child rows whose non-null `column` has no
    * match in `parentCol` of `parent`.
    */
  case class RefIntegrity(column: String, parent: DataFrame,
                          parentCol: String) extends Rule {
    val name = s"${column}_ref_integrity"
  }

  /** Evaluate `rules` against `df`: one row per rule with
    * (rule, rule_type, n_violations, passed), local rules fused into a
    * single scan.
    */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules to validate")
    val locals = rules.collect { case r: LocalRule => r }
    val localPart: Option[DataFrame] =
      if (locals.isEmpty) None
      else {
        val counts = locals.map(r =>
          sum(when(r.violation, lit(1L)).otherwise(lit(0L))).as(r.name))
        val row = df.agg(counts.head, counts.tail: _*)
        Some(row.select(explode(array(locals.map(r =>
          struct(lit(r.name).as("rule"), lit(r.kind).as("rule_type"),
            col(r.name).as("n_violations"))): _*)).as("r"))
          .select(col("r.rule").as("rule"),
            col("r.rule_type").as("rule_type"),
            col("r.n_violations").as("n_violations")))
      }

    val others = rules.collect {
      case u: Unique =>
        df.groupBy(u.columns.map(col): _*)
          .agg(count(lit(1)).as("__c"))
          .filter(col("__c") > 1)
          .agg(coalesce(sum(col("__c")), lit(0L)).as("n_violations"))
          .select(lit(u.name).as("rule"), lit("unique").as("rule_type"),
            col("n_violations"))
      case r: RefIntegrity =>
        df.select(col(r.column)).filter(col(r.column).isNotNull)
          .join(broadcast(
            r.parent.select(col(r.parentCol).as(r.column)).distinct()),
            Seq(r.column), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(r.name).as("rule"),
            lit("ref_integrity").as("rule_type"), col("n_violations"))
    }

    (localPart.toSeq ++ others).reduce(_ unionByName _)
      .withColumn("passed", col("n_violations") === 0)
  }
}
