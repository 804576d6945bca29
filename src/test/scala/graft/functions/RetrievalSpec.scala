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

  test("absent query terms contribute nothing (unknown term query is empty)") {
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(spark, docs,
      Seq(1 -> "nonexistent tokens"), k = 5)
    assert(out.count() == 0)
  }
}
