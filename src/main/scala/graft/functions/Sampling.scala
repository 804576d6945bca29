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
    * When `stratumCol` is an expensive DERIVED expression (a language-ID
    * over the text, a quality score), Catalyst's predicate pushdown
    * substitutes it into the filter below the projection that computes
    * it, so it evaluates twice per row. `eagerStratum = true` pins the
    * sampling predicate above that projection with a
    * [[graft.expressions.PushdownBarrier]], so the stratum evaluates
    * exactly once per row — at 100 TB the stratum IS the dominant cost,
    * so this halves the scan. Leave it false for plain materialized
    * columns, where pushdown (all the way into the parquet scan) is the
    * behavior you want.
    */
  def sampleStratified(df: DataFrame, idCol: String, stratumCol: Column,
                       rates: Map[String, Double],
                       defaultRate: Double,
                       eagerStratum: Boolean = false): DataFrame = {
    def threshold(stratum: Column): Column =
      rates.foldLeft(lit((defaultRate * Scale).toLong): Column) {
        case (acc, (s, rate)) =>
          when(stratum === s, lit((rate * Scale).toLong)).otherwise(acc)
      }
    if (!eagerStratum)
      df.filter(pmod(xxhash64(col(idCol)), lit(Scale)) < threshold(stratumCol))
    else {
      val tag = "__graft_stratum"
      df.withColumn(tag, graft.expressions.exprs.pushdown_barrier(stratumCol))
        .filter(pmod(xxhash64(col(idCol)), lit(Scale)) < threshold(col(tag)))
        .drop(tag)
    }
  }

  /** Deterministic WEIGHTED Bernoulli keep: each row survives with
    * probability `weight` (its own column value in [0,1]) under the same
    * id-hash gate as [[sample]] — keep iff
    * `xxhash64(id) pmod 1e6 < floor(weight·1e6)`. The quality-weighted
    * mixing rule ("keep good documents proportionally more") as one
    * map-only, shuffle-free, partition-independent pass; monotone in the
    * weight, so raising a doc's score can only keep it.
    *
    * `weight` must itself be engine-deterministic (e.g. a
    * 4-decimal-rounded quality score) for the kept set to be
    * reproducible and oracle-checkable.
    */
  def sampleWeighted(df: DataFrame, idCol: String,
                     weight: Column): DataFrame =
    df.filter(pmod(xxhash64(col(idCol)), lit(Scale)) <
      floor(weight * lit(Scale)).cast("long"))

  /** Per-group keep-thresholds for [[sampleTemperature]]: groups sized
    * `n_g` get threshold `floor(1e6 * (n_min / n_g)^(1-alpha))` — the
    * subsample-only realization of temperature flattening (the smallest
    * group keeps everything; a group 100× larger keeps `100^(alpha-1)`
    * of itself). `alpha = 1` is the natural distribution (keep all),
    * `alpha = 0` fully flat (every group downsampled to `n_min`).
    *
    * `alpha = 0.5` is computed via `sqrt`, which IEEE 754 requires to be
    * correctly rounded — so the thresholds are bit-identical on every
    * conforming engine (the DuckDB oracle reproduces them exactly).
    * Other alphas go through `pow`, which carries no such guarantee;
    * they are just as valid operationally, but a cross-engine comparison
    * could disagree on a row whose hash lands exactly on the threshold.
    */
  def temperatureThresholds(df: DataFrame, groupCol: String,
                            alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1]: $alpha")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val nmin = counts.agg(min(col("__n")).as("__nmin"))
    val ratio = col("__nmin").cast("double") / col("__n").cast("double")
    val rate = if (alpha == 0.5) sqrt(ratio) else pow(ratio, lit(1.0 - alpha))
    counts.crossJoin(broadcast(nmin))
      .select(col(groupCol), floor(lit(Scale) * rate).cast("long").as("__thr"))
  }

  /** Temperature-based group resampling (the multilingual-LM "alpha
    * sampling" rule: sample languages/domains ∝ `n^alpha` so giant
    * groups stop drowning small ones — cf. the mixing exponents in the
    * XLM-R and mT5 papers): a count pass sizes each group, then the
    * same deterministic id-hash gate as [[sample]] keeps each group at
    * its [[temperatureThresholds]] rate.
    *
    * Scale shape: two scans — the count pass reads ONE column (parquet
    * column pruning makes it cheap) and reduces map-side to one row per
    * group; the keep pass is map-only with the tiny per-group threshold
    * table broadcast. No wide shuffle at any point, and the kept set is
    * partition-independent and monotone under alpha increase.
    */
  def sampleTemperature(df: DataFrame, idCol: String, groupCol: String,
                        alpha: Double): DataFrame =
    df.join(broadcast(temperatureThresholds(df, groupCol, alpha)),
        Seq(groupCol))
      .filter(pmod(xxhash64(col(idCol)), lit(Scale)) < col("__thr"))
      .drop("__thr")

  /** Deterministic disjoint split assignment (train/val/test and
    * friends): each row lands in exactly one named split by its id-hash
    * bucket, with cumulative thresholds over the same `mod 10^6` gate
    * the samplers use. Map-only, partition-independent, and STABLE
    * UNDER CORPUS GROWTH: a document's split never changes when other
    * documents arrive or leave — the property that keeps eval sets
    * leak-free across dataset versions (contrast `randomSplit`, which
    * reshuffles everything on every run). Fractions must sum to 1
    * (±1e-9).
    */
  def assignSplit(idCol: Column,
                  fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got $fractions")
    val bucket = pmod(xxhash64(idCol), lit(Scale))
    val cum = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
      .tail.map(c => (c * Scale).toLong)
    fractions.init.zip(cum.init).foldRight(
        lit(fractions.last._1): Column) { case (((name, _), thr), acc) =>
      when(bucket < thr, name).otherwise(acc)
    }
  }

  /** Fill a per-source budget deterministically: documents are taken in
    * xxhash64(id) order (an arbitrary-but-stable shuffle of each
    * source) until the source's cumulative cost reaches `budget` — the
    * "give me exactly N tokens of web, N of code" mix-construction
    * primitive. A document is kept iff the cost BEFORE it is under
    * budget, so each source overshoots by at most one document.
    *
    * Scale shape — a distributed prefix sum, NOT a global sort: the
    * hash's top `shardBits` bits give 2^shardBits range-shards whose
    * unsigned order equals hash order (within a shard all signs agree,
    * so the signed sort is unsigned-correct). Phase 1 aggregates
    * per-(source, shard) costs (map-side combined); phase 2 turns those
    * `sources × 2^shardBits` rows into shard offsets with a window over
    * a TINY frame; phase 3 is a bounded window cumsum within each
    * (source, shard) plus the broadcast offset. No partition ever holds
    * more than ~1/2^shardBits of a source.
    */
  def budgetFill(docs: DataFrame, idCol: String, sourceCol: String,
                 cost: Column, budget: Long,
                 shardBits: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shardBits >= 1 && shardBits <= 16)
    val base = docs.select(col(sourceCol).as("source"),
        col(idCol).as("doc_id"), cost.cast("long").as("cost"))
      .withColumn("h", xxhash64(col("doc_id")))
      .withColumn("shard", shiftrightunsigned(col("h"), 64 - shardBits))
    val wOff = Window.partitionBy("source").orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = base.groupBy("source", "shard")
      .agg(sum("cost").as("ssum"))
      .withColumn("offset", sum("ssum").over(wOff) - col("ssum"))
      .select("source", "shard", "offset")
    val wIn = Window.partitionBy("source", "shard")
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(offsets), Seq("source", "shard"))
      .withColumn("cum_before",
        col("offset") + sum("cost").over(wIn) - col("cost"))
      .filter(col("cum_before") < budget)
      .select(col("source"), col("doc_id"), col("cost"),
        col("cum_before"))
  }
}
