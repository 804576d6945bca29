package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al., "DSIR",
  * arXiv:2302.03169): score every raw document by how much more likely
  * its hashed-unigram features are under a TARGET distribution (the
  * high-quality / in-domain slice) than under the raw corpus — the
  * standard importance gate for composing a pretraining mix toward a
  * reference domain without a trained classifier.
  *
  * Both "models" are add-one-smoothed categorical distributions over
  * `dim` hash buckets (the hashing trick makes them vocabulary-free and
  * fixed-size); a doc's weight is its mean per-token log-likelihood
  * ratio `ln p_target(b) − ln p_raw(b)`.
  *
  * Scale shape: the two bucket-count frames are `dim`-bounded (one
  * narrow aggregation each, map-side partials) and broadcast; corpus
  * totals are a one-row broadcast; the token stream joins them map-side
  * and reduces per document — linear in tokens with no wide shuffle.
  * Per-doc reduction is a position-sorted left-to-right fold, so the
  * double sum is deterministic under any partitioning (identical long
  * counts → identical IEEE ln terms → identical fold in both engines).
  */
object Importance {

  /** Per-document importance weight of the corpus against the
    * `isTarget` slice: (idCol, n_tokens, imp_weight) with `imp_weight`
    * the 4-decimal-rounded mean token log-ratio. Blank docs are
    * excluded (no tokens ⇒ no likelihood). Positive means
    * "target-like", negative "raw-typical".
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, dim: Int = 4096): DataFrame = {
    require(dim >= 2, s"need dim >= 2 buckets; got $dim")
    val d = docs.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("id"), isTarget.as("is_target"),
        split(lower(trim(col(textCol))), "\\s+").as("arr"))
    val toks = d.select(col("id"), col("is_target"),
        posexplode(col("arr")).as(Seq("p0", "w")))
      .select(col("id"), col("is_target"), (col("p0") + 1).as("pos"),
        pmod(xxhash64(col("w")), lit(dim.toLong)).as("b"))
    val tc = toks.filter(col("is_target")).groupBy("b")
      .agg(count(lit(1)).as("ct"))
    val rc = toks.groupBy("b").agg(count(lit(1)).as("cr"))
    val tot = toks.agg(
      sum(when(col("is_target"), lit(1L)).otherwise(lit(0L))).as("nt"),
      count(lit(1)).as("nr"))

    // buckets unseen in the target slice smooth to ct=0 via the left
    // join; every token's bucket exists in the raw counts by definition
    val terms = toks
      .join(broadcast(tc), Seq("b"), "left")
      .join(broadcast(rc), Seq("b"))
      .crossJoin(broadcast(tot))
      .select(col("id"), col("pos"),
        (log((coalesce(col("ct"), lit(0L)) + lit(1.0)) /
            (col("nt") + lit(dim)).cast("double")) -
          log((col("cr") + lit(1.0)) /
            (col("nr") + lit(dim)).cast("double"))).as("lr"))

    terms.groupBy("id")
      .agg(aggregate(
          sort_array(collect_list(struct(col("pos"), col("lr")))),
          lit(0.0), (acc, x) => acc + x.getField("lr")).as("raw"),
        count(lit(1)).as("n_tokens"))
      .select(col("id").as(idCol), col("n_tokens"),
        round(col("raw") / col("n_tokens").cast("double"), 4)
          .as("imp_weight"))
  }
}
