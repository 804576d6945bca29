package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProductQuantizationSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read
    .parquet(sf("sf0.001") + "/embeddings.parquet")

  test("encode emits M codes per vector, all inside the codebook") {
    val books = ProductQuantization.trainCodebooks(emb, "vec_id",
      "embedding", m = 4, k = 8, iters = 2)
    assert(books.size == 4 && books.forall(_.size == 8))
    assert(books.forall(_.forall(_.length == 16)))
    val codes = ProductQuantization.encode(emb, "vec_id", "embedding",
      books)
    assert(codes.count() == emb.count())
    val flat = codes.select(explode(col("codes")).as("c"))
      .as[Int].collect()
    assert(flat.forall(c => c >= 0 && c < 8))
  }

  test("adcTopK is deterministic under repartitioning") {
    def run(parts: Int): Set[(Long, Int, Long)] =
      ProductQuantization.adcTopK(spark, emb.repartition(parts),
          emb.filter(col("vec_id") < 4), "vec_id", "embedding",
          m = 4, k = 8, iters = 2, topK = 5)
        .select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
    assert(run(2) == run(7))
  }

  private def exactTop5: Map[Long, Set[Long]] = {
    val e = emb.select(col("vec_id"), col("embedding"))
    e.toDF("query_id", "qv").filter(col("query_id") < 8)
      .crossJoin(e.toDF("neighbor_id", "cv"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot",
        graft.expressions.exprs.dot_product(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("dot").desc, col("neighbor_id").asc)))
      .filter(col("rn") <= 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  private def meanRecall(approx: Map[Long, Set[Long]],
                         truth: Map[Long, Set[Long]]): Double = {
    val rs = truth.map { case (q, t) =>
      approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    rs.sum / rs.size
  }

  test("ADC recall beats random; refined rerank recovers most of it") {
    val queries = emb.filter(col("vec_id") < 8)
    def collectTop(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth = exactTop5
    val adc = meanRecall(collectTop(
      ProductQuantization.adcTopK(spark, emb, queries, "vec_id",
        "embedding", m = 8, k = 32, iters = 3, topK = 5)), truth)
    // 8 bytes/vector vs 256: random recall@5 over 500 vectors is ~0.01
    assert(adc >= 0.1, f"pure ADC recall $adc%.2f not above random")
    val refined = meanRecall(collectTop(
      ProductQuantization.adcTopKRefined(spark, emb, queries, "vec_id",
        "embedding", m = 8, k = 32, iters = 3, topK = 5,
        shortlist = 40)), truth)
    assert(refined >= 0.6,
      f"refined recall $refined%.2f; shortlist rerank should recover " +
        f"most of ADC's ($adc%.2f) distortion loss")
    assert(refined >= adc - 1e-9, "rerank must not lose recall")
  }

  test("trainCodebooks seeds from the 1-in-mod sample only") {
    // iters = 0 leaves the codebooks at their seeds; with sampleMod = 8
    // over dense ids the K seed subvectors must come from ids 0, 8, 16,
    // 24 — so codebook entry 1 equals vec 8's subvector, not vec 1's
    val k = 4
    val books = ProductQuantization.trainCodebooks(emb, "vec_id",
      "embedding", m = 4, k = k, iters = 0, sampleMod = 8)
    val byId = emb.filter(col("vec_id").isin(1L, 8L))
      .select(col("vec_id"), col("embedding").cast("array<float>"))
      .as[(Long, Seq[Float])].collect().toMap
    val sub = books.head.head.length
    assert(books.head(1).toSeq == byId(8L).slice(0, sub),
      "seed 1 must be sampled vec 8's subvector")
    assert(books.head(1).toSeq != byId(1L).slice(0, sub),
      "unsampled vec 1 leaked into the codebook seeds")
  }

  test("pre-trained books reproduce the default build (reuse API)") {
    val queries = emb.filter(col("vec_id") < 4)
    val books = ProductQuantization.trainCodebooks(emb, "vec_id",
      "embedding", m = 4, k = 8, iters = 2,
      sampleMod = Clustering.trainSampleMod(emb.count(), 4096))
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
    val default = collect(ProductQuantization.adcTopK(spark, emb,
      queries, "vec_id", "embedding", m = 4, k = 8, iters = 2, topK = 5))
    val reused = collect(ProductQuantization.adcTopK(spark, emb,
      queries, "vec_id", "embedding", m = 4, k = 8, iters = 2, topK = 5,
      books = Some(books)))
    assert(default == reused,
      "externally trained codebooks must reproduce the default build")
  }
}
