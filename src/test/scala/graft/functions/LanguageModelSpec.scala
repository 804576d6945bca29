package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read
    .parquet(sf("sf0.001") + "/documents.parquet")
    .select("doc_id", "text")

  test("bigramNll covers every non-blank doc with n_tokens = token count") {
    val out = LanguageModel.bigramNll(docs)
    val expected = docs.filter(length(trim(col("text"))) > 0)
    assert(out.count() == expected.count())
    val joined = out.join(expected, Seq("doc_id"))
      .withColumn("tc", TextFunctions.tokenCount(col("text")))
    assert(joined.filter(col("n_tokens") =!= col("tc")).isEmpty,
      "n_tokens must equal the whitespace token count")
    assert(out.filter(col("avg_nll") <= 0).isEmpty,
      "mean negative log-likelihood must be positive")
  }

  test("bigramNll is deterministic under repartitioning") {
    def run(parts: Int): Map[Long, Double] =
      LanguageModel.bigramNll(docs.repartition(parts))
        .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    assert(run(2) == run(7))
  }

  test("typical text scores more likely than out-of-vocabulary text") {
    // train on a corpus where 'a b' dominates; the all-novel doc must
    // carry the higher mean NLL (the CCNet gate's discriminating signal)
    val corpus = Seq(
      (1L, "a b a b a b"), (2L, "a b a b"), (3L, "a b a b a b a b"),
      (4L, "zq xw vy uk tj")).toDF("doc_id", "text")
    val nll = LanguageModel.bigramNll(corpus)
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    assert(nll(4L) > nll(1L) && nll(4L) > nll(2L) && nll(4L) > nll(3L),
      s"OOV doc should be least likely: $nll")
  }
}
