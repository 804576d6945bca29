package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 ranks the doc matching all query terms first") {
    val docs = Seq(
      (1L, "spark shuffle join hash table scan"),
      (2L, "hash table"),
      (3L, "window agg stream stream stream"),
      (4L, "completely unrelated words here")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(spark, docs, Seq(1 -> "hash table"), k = 3)
      .orderBy("rank").as[(Int, Int, Long, Double)].collect()
    // doc 2 is ALL query terms (short => high tf weight); doc 1 matches
    // both terms too; doc 4 matches none and must be absent
    assert(out.map(_._3).toSet == Set(1L, 2L))
    assert(out.head._3 == 2L, s"shortest all-term doc should rank 1: $out")
    assert(out.forall(_._4 > 0))
  }

  test("scores and ranks are partition-independent") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("doc_id", "text")
    val qs = Seq(1 -> "join hash table", 2 -> "stream window agg")
    def run(parts: Int) =
      Retrieval.bm25TopK(spark, docs.repartition(parts), qs, k = 5)
        .as[(Int, Int, Long, Double)].collect().toSet
    assert(run(1) == run(7),
      "order-defined fold must make scores partitioning-invariant")
  }

  test("retrievalMetrics: perfect retrieval scores 1.0 across the board") {
    val docs = Seq(
      (1L, "apple banana"),
      (2L, "apple apple banana"),
      (3L, "cherry plum"),
      (4L, "apple only here")
    ).toDF("doc_id", "text")
    // rel(q) = docs containing BOTH terms = {1, 2}; BM25 must put both
    // in its top-10, so recall = mrr = ndcg = 1
    val m = Retrieval.retrievalMetrics(spark, docs,
        Seq(1 -> "apple banana"), k = 10)
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(m.length == 1)
    val (_, nRel, recall, mrr, ndcg) = m.head
    assert(nRel == 2L)
    assert(recall == 1.0 && mrr == 1.0 && ndcg == 1.0, m.head.toString)
  }

  test("retrievalMetrics stay in [0, 1] on the real corpus") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("doc_id", "text")
    val qs = Seq(1 -> "join hash table", 2 -> "stream window agg",
      3 -> "zzz-not-in-corpus qqq")
    val m = Retrieval.retrievalMetrics(spark, docs, qs, k = 10)
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(m.nonEmpty)
    m.foreach { case (qid, nRel, recall, mrr, ndcg) =>
      assert(nRel > 0)
      assert(recall >= 0 && recall <= 1, s"q$qid recall $recall")
      assert(mrr >= 0 && mrr <= 1, s"q$qid mrr $mrr")
      assert(ndcg >= 0 && ndcg <= 1.0001, s"q$qid ndcg $ndcg")
    }
    // the nonsense query has no all-term doc => contributes no row
    assert(!m.exists(_._1 == 3), "no-relevant-docs query must be absent")
  }

  test("rrf fusion rewards docs ranked by both retrievers") {
    val a = Seq((1, 1, 10L), (1, 2, 20L)).toDF("query_id", "rank", "doc_id")
      .select(col("query_id"), col("doc_id"), col("rank"))
    val b = Seq((1, 1, 20L), (1, 2, 30L)).toDF("query_id", "rank", "doc_id")
      .select(col("query_id"), col("doc_id"), col("rank"))
    val out = Retrieval.rrfFuse(a, b, k = 3)
      .orderBy("rank").as[(Int, Int, Long, Double)].collect().toSeq
    // doc 20 appears in BOTH rankings (ranks 2 and 1) => top; docs 10
    // and 30 each appear once at ranks 1/2
    assert(out.map(_._3) == Seq(20L, 10L, 30L), s"got $out")
    val expected20 = math.rint((1.0 / 62 + 1.0 / 61) * 1e6) / 1e6
    assert(math.abs(out.head._4 - expected20) < 1e-9)
  }

  test("boolean overlap ranks by distinct query terms present") {
    val docs = Seq(
      (1L, "join join join"),          // 1 distinct term
      (2L, "join hash"),               // 2
      (3L, "join hash table extra")    // 3
    ).toDF("doc_id", "text")
    val out = Retrieval
      .booleanOverlapTopK(spark, docs, Seq(1 -> "join hash table"), k = 3)
      .orderBy("rank").as[(Int, Int, Long)].collect().toSeq
    assert(out.map(_._3) == Seq(3L, 2L, 1L), s"got $out")
  }

  test("absent query terms contribute nothing (unknown term query is empty)") {
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(spark, docs,
      Seq(1 -> "nonexistent tokens"), k = 5)
    assert(out.count() == 0)
  }
}
