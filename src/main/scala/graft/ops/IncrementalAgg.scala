package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-key mergeable state
  * table (count / sum / min / max over an exact integer measure) and
  * fold delta batches into it without touching historical raw rows —
  * the standard warehouse pattern behind "update the daily rollup from
  * today's partition only" (the reference's recurring Snowflake task
  * layer re-aggregates from scratch each run; this is the 100 TB
  * alternative where each run's work is O(delta), not O(history)).
  *
  * All four statistics are self-mergeable (`sum` of counts/sums, `min`
  * of mins, `max` of maxes), so merging partials is EXACTLY equal to
  * aggregating the union of the raw inputs — the property the oracle
  * query checks end-to-end. Derived read-time statistics (avg) come
  * from `readView`.
  *
  * Scale shape: `aggState` on a delta shuffles only the delta (narrow
  * (keys, measure) rows with map-side combine); `mergeStates` shuffles
  * two ALREADY-AGGREGATED key-sized frames, never raw history. At a
  * fixed key cardinality the recurring cost is independent of total
  * history size.
  */
object IncrementalAgg {

  /** Per-key mergeable state over an exact-integer `measure`. */
  def aggState(df: DataFrame, keyCols: Seq[String],
               measure: Column): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("st_cnt"),
        sum(measure).as("st_sum"),
        min(measure).as("st_min"),
        max(measure).as("st_max"))

  /** Fold a delta state into a base state: union of partials, one
    * key-sized shuffle. Associative and commutative — any batch
    * arrival order yields the same table.
    */
  def mergeStates(base: DataFrame, delta: DataFrame,
                  keyCols: Seq[String]): DataFrame =
    base.unionByName(delta)
      .groupBy(keyCols.map(col): _*)
      .agg(sum("st_cnt").as("st_cnt"),
        sum("st_sum").as("st_sum"),
        min("st_min").as("st_min"),
        max("st_max").as("st_max"))

  /** Read-time view: exact integer stats plus the derived mean, emitted
    * on the exact 4-dp grid (integer half-up + one exact division —
    * build-invariant, no round(DOUBLE, n) tail).
    */
  def readView(state: DataFrame): DataFrame =
    state.select(state.columns.map(col).toIndexedSeq :+
      graft.functions.ExactGrid.eRatio(col("st_sum"), col("st_cnt"), 10000L)
        .as("st_avg"): _*)

  /** Incremental JOIN maintenance — the delta rule
    * `Δ(L ⋈ R) = ΔL ⋈ R ∪ Lᵒˡᵈ ⋈ ΔR` (with R = Rᵒˡᵈ ∪ ΔR on the first
    * term so ΔL×ΔR pairs appear exactly once): the new join rows a
    * batch introduces, WITHOUT re-joining the historical bulk against
    * itself. Appending the result to the old join output equals the
    * full re-join — the equivalence the oracle checks end-to-end.
    *
    * Scale shape: both terms put a DELTA on one side of the join, so
    * each shuffle moves one delta plus the (key-pruned) other side —
    * per-batch cost is O(Δ · matched), never O(history²). At a fixed
    * arrival rate the recurring maintenance cost is flat while the
    * naive re-join grows with history.
    */
  def deltaJoin(baseL: DataFrame, deltaL: DataFrame,
                baseR: DataFrame, deltaR: DataFrame,
                keys: Seq[String]): DataFrame =
    deltaL.join(baseR.unionByName(deltaR), keys)
      .unionByName(baseL.join(deltaR, keys))
}
