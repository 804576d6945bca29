package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The measured dedup-path dial (VERDICT r9 #6): the size-biased mean
  * shingle df must route CLOSED-vocabulary corpora (hot buckets, the
  * quadratic-candidate adversarial floor) to the MinHash-LSH banded
  * path and OPEN-vocabulary corpora (df-bounded buckets) to the exact
  * prefix-filter path — and each route's output must be exactly the
  * underlying per-path function's output (which the oracle queries
  * gate), never a third semantics.
  */
class SimilarityRouteSpec extends SparkSpec {

  import spark.implicits._

  // 400 docs over a 6-word vocabulary: every shingle bucket is hot
  private lazy val closedDocs = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val rnd = new scala.util.Random(7L)
    (0 until 400).map { i =>
      (i.toLong, (0 until 30).map(_ => vocab(rnd.nextInt(6)))
        .mkString(" "))
    }.toDF("doc_id", "text")
  }

  // 400 docs of globally-unique words: every df = 1
  private lazy val openDocs = (0 until 400).map { i =>
    (i.toLong, (0 until 30).map(j => s"w${i}_$j").mkString(" "))
  }.toDF("doc_id", "text")

  test("size-biased mean df separates the two vocabulary classes") {
    val closed = Dedup.sizeBiasedMeanDf(closedDocs, "doc_id", "text")
    val open = Dedup.sizeBiasedMeanDf(openDocs, "doc_id", "text")
    assert(closed >= 8.0, s"closed-vocab load unexpectedly cold: $closed")
    assert(open < 8.0 && open >= 1.0,
      s"open-vocab load unexpectedly hot: $open")
  }

  test("routing flips between the fixture classes and each path " +
      "reproduces its underlying function exactly") {
    val (rClosed, pairsClosed) =
      Dedup.similarityPairsAuto(closedDocs, "doc_id", "text")
    assert(rClosed == "banded")
    val (rOpen, pairsOpen) =
      Dedup.similarityPairsAuto(openDocs, "doc_id", "text")
    assert(rOpen == "prefix")
    // banded route == minHashCandidates thresholded, uniform schema
    val wantBanded = Dedup
      .minHashCandidates(closedDocs, "doc_id", "text")
      .filter(col("est_jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"),
        round(col("est_jaccard") * 1000000).cast("long").as("sim_ppm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val gotBanded = pairsClosed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotBanded == wantBanded)
    assert(gotBanded.nonEmpty, "closed-vocab fixture found no dups")
    // prefix route == prefixFilterPairs, uniform schema (all-unique
    // words -> zero pairs is the CORRECT exact answer)
    val wantPrefix = Dedup
      .prefixFilterPairs(openDocs, "doc_id", "text")
      .select(col("id_a"), col("id_b"), col("jac_ppm").as("sim_ppm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val gotPrefix = pairsOpen.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotPrefix == wantPrefix)
  }

  test("driver fixture routes by scale exactly as the decade tables " +
      "predict") {
    // sf0.1 documents (5k docs, closed ~31-word vocabulary): measured
    // size-biased mean df 10.7 -> banded (the r6 table shows the
    // prefix path quadratic there: 409k -> 44.9M candidates).
    val big = spark.read.parquet(sf("sf0.1") + "/documents.parquet")
    assert(Dedup.sizeBiasedMeanDf(big, "doc_id", "text") >= 8.0)
    // sf0.001 (50 docs): vocabulary not yet saturated, buckets cold,
    // the exact path is right (and cheap) -> prefix.
    val small = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    assert(Dedup.sizeBiasedMeanDf(small, "doc_id", "text") < 8.0)
  }
}
