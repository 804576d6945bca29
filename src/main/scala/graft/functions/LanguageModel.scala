package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet-style
  * quality signal (Wenzek et al., "CCNet", arXiv:1911.00359): score
  * each document by its mean negative log-likelihood under an add-one-
  * smoothed bigram model trained on the corpus itself. Low avg-NLL ≈
  * fluent/typical text; high ≈ gibberish or boilerplate-mix — the
  * standard perplexity gate in front of a pretraining mix.
  *
  * Scale shape: token and bigram counts are plain aggregations (shuffle
  * on token / bigram key, map-side partials — linear); bigrams are
  * derived MAP-SIDE from the token array (slice + zip, no positional
  * self-join); the two count joins key on bigram/first-token (linear,
  * AQE-broadcastable when the vocabulary is small); corpus constants
  * (N, V) are a one-row broadcast. Per-doc reduction is a sorted
  * left-to-right fold, deterministic under any partitioning.
  *
  * Determinism contract: both engines evaluate
  * `ln((c+1)/(denom+V))` on identical long counts — identical IEEE
  * doubles — and fold per-doc terms in position order (the fold's `0.0
  * + x` seed is exact for any finite x), so the DuckDB oracle matches
  * bit-for-bit before the 4-decimal output round.
  */
object LanguageModel {

  /** Mean negative log-likelihood per document under the corpus bigram
    * model: P(w₁) = (c(w₁)+1)/(N+V), P(wᵢ|wᵢ₋₁) =
    * (c(wᵢ₋₁wᵢ)+1)/(c(wᵢ₋₁)+V). Returns (idCol, n_tokens, avg_nll)
    * with avg_nll rounded to 4 decimals; blank docs are excluded.
    */
  def bigramNll(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val d = docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("id"),
        split(lower(trim(col(textCol))), "\\s+").as("arr"))

    val toks = d.select(col("id"),
      posexplode(col("arr")).as(Seq("p0", "w")))
    val uni = toks.groupBy("w").agg(count(lit(1)).as("cu"))
    val stats = toks.agg(count(lit(1)).as("n"),
      count_distinct(col("w")).as("v"))

    // bigrams map-side off the array: (w1, w2) at positions (i, i+1),
    // pos = i (1-based) — no token-table self-join
    val bg = d.select(col("id"),
        posexplode(arrays_zip(
          slice(col("arr"), lit(1), size(col("arr")) - 1),
          slice(col("arr"), lit(2), size(col("arr")) - 1))).as(Seq("p0", "z")))
      .select(col("id"), (col("p0") + 1).as("pos"),
        col("z.0").as("w1"), col("z.1").as("w2"))
    val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))

    // first-token term at pos 1: ln((c(w1)+1) / (N+V))
    val term1 = d.select(col("id"), element_at(col("arr"), 1).as("w"))
      .join(uni, Seq("w"))
      .crossJoin(broadcast(stats))
      .select(col("id"), lit(1).as("pos"),
        log((col("cu") + lit(1.0))
          / (col("n") + col("v")).cast("double")).as("lp"))

    // bigram term at pos i+1: ln((c(w1,w2)+1) / (c(w1)+V))
    val termb = bg
      .join(bc, Seq("w1", "w2"))
      .join(uni.withColumnRenamed("w", "w1"), Seq("w1"))
      .crossJoin(broadcast(stats))
      .select(col("id"), (col("pos") + 1).cast("int").as("pos"),
        log((col("cb") + lit(1.0))
          / (col("cu") + col("v")).cast("double")).as("lp"))

    term1.unionByName(termb)
      .groupBy("id")
      .agg(aggregate(
          sort_array(collect_list(struct(col("pos"), col("lp")))),
          lit(0.0), (acc, x) => acc + x.getField("lp")).as("raw"),
        count(lit(1)).as("n_tokens"))
      .select(col("id").as(idCol), col("n_tokens"),
        round(-(col("raw") / col("n_tokens").cast("double")), 4)
          .as("avg_nll"))
  }
}
