package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.TopKBy

/** Keyword retrieval: BM25-scored top-k documents per query — the
  * lexical complement to the embedding ANN operators in [[Similarity]]
  * (hybrid retrieval pipelines run both and fuse).
  *
  * Scale shape: tf/df/len are plain aggregations over the exploded
  * token table (shuffle on term/doc — unavoidable and linear); the
  * query set is tiny and broadcast everywhere; winners per query come
  * from the bounded [[graft.expressions.TopKByAgg]] (map-side ≤k per
  * query per partition), not a corpus-wide window sort.
  *
  * Determinism contract (what makes the DuckDB oracle exact): the
  * per-(query, doc) score folds term scores in SORTED TERM ORDER via a
  * left-to-right `aggregate` fold — both engines then execute the same
  * IEEE double additions in the same order — and ranking uses the score
  * rounded to 4 decimals with a doc-id tie-break packed into one long.
  */
object Retrieval {

  /** BM25 top-k. `queries`: (query_id, whitespace keywords). Returns
    * (query_id, rank, doc_id, score) with score rounded to 4 decimals,
    * rank 1-based by (score desc, doc_id asc).
    */
  def bm25TopK(spark: SparkSession, docs: DataFrame,
               queries: Seq[(Int, String)], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    import spark.implicits._

    val toks = docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))

    val docLen = toks.groupBy(idCol).agg(count(lit(1)).as("len"))
    val tf = toks.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // corpus constants: one tiny row, broadcast-cross-joined
    val stats = docLen.agg(count(lit(1)).as("n_docs"),
      sum("len").as("total_len"))

    val qterms = queries
      .flatMap { case (qid, text) =>
        text.toLowerCase.trim.split("\\s+").toSeq.distinct.map(t => (qid, t))
      }
      .toDF("query_id", "term")

    val scored = tf
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .join(docLen, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("avg_len",
        col("total_len").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs").cast("double") - col("df") + lit(0.5))
          / (col("df") + lit(0.5))))
      .withColumn("tscore",
        col("idf") * (col("tf") * lit(k1 + 1.0))
          / (col("tf") + lit(k1) * (lit(1.0 - b)
            + lit(b) * col("len").cast("double") / col("avg_len"))))

    // order-defined fold: sort term scores by term, then sum
    // left-to-right — bit-reproducible across engines and partitionings
    val perDoc = scored.groupBy("query_id", idCol)
      .agg(aggregate(
        sort_array(collect_list(struct(col("term"), col("tscore")))),
        lit(0.0),
        (acc, x) => acc + x.getField("tscore")).as("raw_score"))
      .withColumn("score", round(col("raw_score"), 4))

    // bounded top-k winners: pack (rounded score, doc id) into one long
    val ord = round(col("score") * 10000).cast("long") * lit(1L << 40) -
      col(idCol)
    val winners = perDoc
      .groupBy("query_id")
      .agg(TopKBy.top_k_by(ord, col(idCol), k).as("ids"))
      .select(col("query_id"), posexplode(col("ids")).as(Seq("pos", idCol)))
      .withColumn("rank", col("pos") + 1)
      .drop("pos")

    winners.join(perDoc.select(col("query_id"), col(idCol), col("score")),
        Seq("query_id", idCol))
      .select(col("query_id"), col("rank"), col(idCol), col("score"))
  }

  /** Boolean term-overlap retriever: rank docs by how many DISTINCT
    * query terms they contain (desc, doc-id tie-break). The
    * recall-oriented counterpart BM25 gets fused with in
    * [[rrfFuse]] — same bounded-top-k winner shape.
    */
  def booleanOverlapTopK(spark: SparkSession, docs: DataFrame,
                         queries: Seq[(Int, String)], k: Int,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    import spark.implicits._
    val terms = docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .distinct()
    val qterms = queries
      .flatMap { case (qid, text) =>
        text.toLowerCase.trim.split("\\s+").toSeq.distinct.map(t => (qid, t))
      }
      .toDF("query_id", "term")
    val ov = terms.join(broadcast(qterms), Seq("term"))
      .groupBy("query_id", idCol).agg(count(lit(1)).as("overlap"))
    val ord = col("overlap") * lit(1L << 40) - col(idCol)
    ov.groupBy("query_id")
      .agg(TopKBy.top_k_by(ord, col(idCol), k).as("ids"))
      .select(col("query_id"), posexplode(col("ids")).as(Seq("pos", idCol)))
      .withColumn("rank", col("pos") + 1)
      .select(col("query_id"), col("rank"), col(idCol))
  }

  /** Retrieval quality metrics for a ranking against deterministic
    * relevance judgments: a doc is RELEVANT to a query iff it contains
    * EVERY distinct query term (boolean-AND qrels — system-independent
    * and recomputable by the oracle). Returns one row per query with
    * relevant docs: (query_id, n_rel, recall_k, mrr_k, ndcg_k), all
    * rounded to 4 decimals.
    *
    * Determinism: DCG folds hit ranks ascending and IDCG folds
    * 1..min(n_rel, k) ascending, both with the exact `0.0 + x` seed;
    * the log2 discount is `ln2 / ln(rank+1)` with ln2 embedded as one
    * shared double literal — the identical IEEE operation sequence in
    * both engines.
    *
    * Scale shape: the ranking is whatever retriever produced it (BM25
    * here — bounded top-k); qrels cost one distinct-(doc, term) pass
    * joined to the broadcast query terms; everything after is per-query
    * rows (thousands at most).
    */
  def retrievalMetrics(spark: SparkSession, docs: DataFrame,
                       queries: Seq[(Int, String)], k: Int,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    import spark.implicits._
    val ln2 = math.log(2.0)

    val ranking = bm25TopK(spark, docs, queries, k, idCol = idCol,
      textCol = textCol)

    val qterms = queries
      .flatMap { case (qid, text) =>
        text.toLowerCase.trim.split("\\s+").toSeq.distinct.map(t => (qid, t))
      }
      .toDF("query_id", "term")
    val nq = queries
      .map { case (qid, text) =>
        (qid, text.toLowerCase.trim.split("\\s+").toSeq.distinct.size)
      }
      .toDF("query_id", "nq")

    val docTerms = docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .distinct()
    val qrels = docTerms.join(broadcast(qterms), Seq("term"))
      .groupBy("query_id", idCol).agg(count(lit(1)).as("c"))
      .join(broadcast(nq), Seq("query_id"))
      .filter(col("c") === col("nq"))
      .select("query_id", idCol)

    val nrel = qrels.groupBy("query_id").agg(count(lit(1)).as("n_rel"))

    val hits = ranking.join(qrels, Seq("query_id", idCol))
    val hitStats = hits.groupBy("query_id").agg(
      aggregate(sort_array(collect_list(col("rank"))), lit(0.0),
        (acc, r) => acc + lit(ln2) / log(r.cast("double") + lit(1.0)))
        .as("dcg"),
      min("rank").as("first_rank"),
      count(lit(1)).as("n_hits"))

    nrel.join(hitStats, Seq("query_id"), "left")
      .withColumn("idcg",
        aggregate(sequence(lit(1L), least(col("n_rel"), lit(k.toLong))),
          lit(0.0),
          (acc, i) => acc + lit(ln2) / log(i.cast("double") + lit(1.0))))
      // recall and MRR are exact integer ratios — emitted on the exact
      // 4-dp grid (OVERFLOW_AUDIT r14); nDCG's dcg/idcg are genuinely
      // inexact doubles, where the round IS the intended quantization
      .select(col("query_id"), col("n_rel"),
        ExactGrid.eRatio(coalesce(col("n_hits"), lit(0L)), col("n_rel"),
          10000L).as(s"recall_$k"),
        coalesce(ExactGrid.eRatio(lit(1L), col("first_rank"), 10000L),
          lit(0.0)).as(s"mrr_$k"),
        round(coalesce(col("dcg"), lit(0.0)) / col("idcg"), 4)
          .as(s"ndcg_$k"))
  }

  /** Reciprocal-rank fusion: `Σ 1/(c + rank)` over the rankings a doc
    * appears in (absent → contributes 0) — the standard way to combine
    * retrievers whose scores aren't comparable (BM25 + ANN, BM25 +
    * boolean). The fused score is an exact small-integer ratio —
    * 1/d₁ + 1/d₂ = (d₁+d₂)/(d₁·d₂) — emitted on the exact 1e-6 grid
    * (integer half-up + one exact division, build-invariant); top-k
    * per query via the bounded aggregate on the packed grid key.
    *
    * Inputs need columns (query_id, doc_id, rank).
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, c: Int = 60,
              idCol: String = "doc_id"): DataFrame = {
    val l = a.select(col("query_id"), col(idCol), col("rank").as("rank_a"))
    val r = b.select(col("query_id"), col(idCol), col("rank").as("rank_b"))
    val d1 = lit(c.toLong) + col("rank_a")
    val d2 = lit(c.toLong) + col("rank_b")
    val fused = l.join(r, Seq("query_id", idCol), "full_outer")
      .withColumn("rrf",
        when(col("rank_a").isNotNull && col("rank_b").isNotNull,
          ExactGrid.eRatio(d1 + d2, d1 * d2, 1000000L))
        .when(col("rank_a").isNotNull,
          ExactGrid.eRatio(lit(1L), d1, 1000000L))
        .otherwise(ExactGrid.eRatio(lit(1L), d2, 1000000L)))
    val ord = round(col("rrf") * 1000000).cast("long") * lit(1L << 40) -
      col(idCol)
    fused.groupBy("query_id")
      .agg(TopKBy.top_k_by(ord, col(idCol), k).as("ids"))
      .select(col("query_id"), posexplode(col("ids")).as(Seq("pos", idCol)))
      .withColumn("rank", col("pos") + 1)
      .join(fused.select(col("query_id"), col(idCol), col("rrf")),
        Seq("query_id", idCol))
      .select(col("query_id"), col("rank"), col(idCol), col("rrf"))
  }
}
