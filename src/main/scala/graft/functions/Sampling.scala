package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is partition-layout dependent: the kept set changes
  * under repartition, AQE, or a re-run — unacceptable when a training
  * mix must be reproducible and auditable. Hash-gating on a stable key
  * (`xxhash64(id) mod 1e6 < rate*1e6`) is map-only, shuffle-free,
  * partition-independent, and the SAME rows survive on every engine and
  * every run — which also makes it oracle-checkable in DuckDB.
  *
  * The gate composes: a stratified mix (per-language, per-source, or
  * per-quality-bucket rates) is one `CASE` over the stratum column, still
  * map-only. At 100 TB this is the canonical "build a 5% mix with 2x
  * upsampled code" operator: one scan, no shuffle, no driver state.
  */
object Sampling {

  private val Scale = 1000000L

  /** Keep-predicate: deterministic Bernoulli(rate) by id hash. */
  def hashGate(idCol: Column, rate: Double): Column =
    pmod(xxhash64(idCol), lit(Scale)) < lit((rate * Scale).toLong)

  /** Uniform deterministic sample. */
  def sample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(hashGate(col(idCol), rate))

  /** Stratified deterministic sample: per-stratum rates with a default.
    * One map-only pass; the hash gate is shared, so a row's fate under a
    * rate INCREASE is monotone (rows kept at 5% stay kept at 10% — handy
    * for growing a mix without resampling everything).
    *
    * Note: when `stratumCol` is an expensive DERIVED expression (e.g. a
    * language-ID over the text), Catalyst's predicate pushdown will
    * substitute it into the filter and evaluate it twice per row. At
    * scale, materialize the stratum column once (write it, or persist)
    * and pass the materialized column here.
    */
  def sampleStratified(df: DataFrame, idCol: String, stratumCol: Column,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit((defaultRate * Scale).toLong): Column) {
      case (acc, (stratum, rate)) =>
        when(stratumCol === stratum, lit((rate * Scale).toLong)).otherwise(acc)
    }
    df.filter(pmod(xxhash64(col(idCol)), lit(Scale)) < threshold)
  }
}
