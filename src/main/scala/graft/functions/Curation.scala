package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.TopKBy

/** Corpus-curation operators: bounded per-group caps over a document
  * table — the "at most N documents per domain/source, best first" rule
  * every web-scale training-data pipeline applies to stop a handful of
  * giant domains from dominating the mix (cf. the per-domain caps in the
  * C4 and RefinedWeb dataset papers).
  */
object Curation {

  /** Keep at most `k` rows per `groupCol`, best-first by `ord`
    * (descending). `ord` must be a LONG that totally orders rows within
    * a group — pack the quality key and a unique tie-breaker into one
    * long (e.g. `scaled_quality * 2^48 - id`), so the winner set is
    * deterministic under any partitioning.
    *
    * Scale shape: the winner ids come from the bounded
    * [[graft.expressions.TopKByAgg]] — map-side partials reduce every
    * partition to ≤k ids per group BEFORE the shuffle, so the exchange
    * moves `groups × k × partitions` longs, never the document rows
    * (contrast a `row_number().over(Window.partitionBy(group))`
    * formulation, which shuffles and sorts the full 100 TB corpus). The
    * final semi-join restores full rows for the winners only; with
    * `broadcastWinners` (default) it is map-only — right for
    * `groups × k` in the millions. Beyond that, set it false for a
    * shuffled semi-join on the narrow id column.
    */
  def capPerGroup(docs: DataFrame, groupCol: String, idCol: String,
                  ord: Column, k: Int,
                  broadcastWinners: Boolean = true): DataFrame = {
    val winners = docs
      .groupBy(col(groupCol))
      .agg(TopKBy.top_k_by(ord, col(idCol), k).as("__winner_ids"))
      .select(explode(col("__winner_ids")).as(idCol))
    val rhs = if (broadcastWinners) broadcast(winners) else winners
    docs.join(rhs, Seq(idCol), "left_semi")
  }

  /** Pareto-front (skyline) multi-objective curation: keep the
    * documents NOT strictly dominated on two scaled-integer criteria —
    * no other document is better on BOTH `xCol` and `yCol`. The
    * selection a mix builder wants when quality and rarity (or quality
    * and freshness) trade off and a single weighted score would bury
    * one axis.
    *
    * Scalable band-pruned formulation, never the quadratic
    * NOT-EXISTS self-join: bucket x into `bandWidth`-wide bands, then
    * a document is dominated iff some y' > y exists at strictly
    * larger x — which decomposes into (a) the max y of all HIGHER
    * bands (every such doc has strictly larger x), from a bands×bands
    * join over a #bands-sized frame, and (b) the running max y over
    * strictly-larger DISTINCT x within its own band, from a window
    * whose partitions hold at most `bandWidth` rows. The only
    * corpus-sized operation is one (band, x) group-by; the dominator
    * lookup joins back broadcast (x is a bounded-cardinality scaled
    * score, so distinct (band, x) pairs are at most the score range).
    *
    * Precondition: x and y are scaled-integer scores with |x| < 2⁵²
    * (band arithmetic runs through exact doubles).
    */
  def paretoFront(df: DataFrame, idCol: String, xCol: String,
                  yCol: String, bandWidth: Long = 64L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bandWidth >= 1)
    val base = df.select(col(idCol), col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .withColumn("__band",
        floor(col("__x").cast("double") / bandWidth).cast("long"))
    val gx = base.groupBy("__band", "__x").agg(max("__y").as("__my"))
    val wIn = Window.partitionBy("__band").orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val inband = gx.withColumn("__domIn", max("__my").over(wIn))
    val bandmax = gx.groupBy("__band").agg(max("__my").as("__bm"))
    val above = bandmax.as("a")
      .join(bandmax.as("b"), col("b.__band") > col("a.__band"), "left")
      .groupBy(col("a.__band").as("__band"))
      .agg(max(col("b.__bm")).as("__domAbove"))
    val dom = inband.join(broadcast(above), Seq("__band"))
      .select(col("__band"), col("__x"),
        greatest(coalesce(col("__domIn"), lit(Long.MinValue)),
          coalesce(col("__domAbove"), lit(Long.MinValue))).as("__dom"))
    base.join(broadcast(dom), Seq("__band", "__x"))
      .filter(col("__dom") <= col("__y"))
      .select(col(idCol), col("__x").as(xCol), col("__y").as(yCol))
  }

  /** Quality-desc ordering key for [[capPerGroup]] with doc-id
    * tie-break: `round(quality * 10^4) * 2^48 - id`. Exact in long
    * arithmetic for quality ∈ [0,1] rounded to 4 decimals and ids below
    * 2^48; equal-quality ties resolve to the LOWEST id
    * deterministically.
    */
  def qualityOrd(quality: Column, id: Column): Column =
    round(quality * lit(10000)).cast("long") * lit(1L << 48) -
      id.cast("long")

  /** Linear-model keep probability over per-doc signal columns — the
    * shape of a fasttext-style quality classifier's scoring pass
    * (features → weighted sum → squash → threshold), with fixed weights
    * standing in for trained ones.
    *
    * The squash is the ALGEBRAIC sigmoid `0.5 + 0.5·z/(1+|z|)` rather
    * than the logistic `1/(1+e^-z)`: same monotone s-shape and 0.5
    * decision point at z=0, but built from +,×,÷,|·| only — every step
    * IEEE-exact-rounded identically in any engine, where `exp` is
    * libm-dependent and can differ in the last ulp (which a rounded
    * hash-compare would surface as a phantom mismatch). Map-only,
    * codegen'd, deterministic.
    */
  def linearKeepProb(bias: Double, terms: (Column, Double)*): Column = {
    val z = terms.foldLeft(lit(bias): Column) {
      case (acc, (c, w)) => acc + c * lit(w)
    }
    round(lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z)), 4)
  }

  /** Curriculum ordering: a global training order from easy to hard
    * WITHOUT a global sort. Docs are hashed into `nShards` interleave
    * shards (id mod nShards); each shard ranks its own docs by
    * (difficulty asc, id asc); global position = (rank-1)·nShards +
    * shard — shards deal their easiest-first cards round-robin, so the
    * curriculum ramps globally while every window sort stays
    * shard-local.
    *
    * Scale shape: one hash shuffle on shard + a per-shard window sort
    * (each ~1/nShards of the data; raise nShards with the corpus).
    * Within ±nShards positions the order equals the true global
    * difficulty sort wherever shard difficulty distributions match —
    * the standard trade for removing the single-task total-order
    * window. Deterministic: pure integer/rounded-difficulty keys.
    */
  def curriculumOrder(docs: DataFrame, idCol: String, difficulty: Column,
                      nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withShard = docs
      .withColumn("difficulty", difficulty)
      .withColumn("shard", pmod(col(idCol), lit(nShards)).cast("long"))
    val w = Window.partitionBy("shard")
      .orderBy(col("difficulty").asc, col(idCol).asc)
    withShard
      .withColumn("shard_rank", row_number().over(w).cast("long"))
      .withColumn("global_pos",
        (col("shard_rank") - 1) * nShards + col("shard"))
  }
}
