package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read
    .parquet(sf("sf0.001") + "/documents.parquet")
    .select("doc_id", "source", "text")

  test("capPerGroup equals the window row_number formulation") {
    val ord = Curation.qualityOrd(
      TextFunctions.qualityScore(col("text")), col("doc_id"))
    val capped = Curation.capPerGroup(docs, "source", "doc_id", ord, k = 5)
      .select("doc_id", "source")
    val w = Window.partitionBy("source").orderBy(col("__ord").desc)
    val windowed = docs.withColumn("__ord", ord)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 5)
      .select("doc_id", "source")
    assert(capped.exceptAll(windowed).isEmpty &&
      windowed.exceptAll(capped).isEmpty,
      "bounded-aggregate cap must match the window formulation exactly")
  }

  test("cap is deterministic under repartitioning") {
    val ord = Curation.qualityOrd(
      TextFunctions.qualityScore(col("text")), col("doc_id"))
    def run(parts: Int): Set[Long] =
      Curation.capPerGroup(docs.repartition(parts), "source", "doc_id",
        ord, k = 3).select("doc_id").as[Long].collect().toSet
    assert(run(1) == run(13), "winner set must not depend on partitioning")
  }

  test("no group exceeds the cap; under-full groups keep all rows") {
    val ord = Curation.qualityOrd(
      TextFunctions.qualityScore(col("text")), col("doc_id"))
    val sizes = Curation.capPerGroup(docs, "source", "doc_id", ord, k = 4)
      .groupBy("source").count().as[(String, Long)].collect()
    assert(sizes.nonEmpty && sizes.forall(_._2 <= 4))
    val tiny = docs.filter(col("doc_id") < 3) // fewer rows than the cap
    val kept = Curation.capPerGroup(tiny, "source", "doc_id",
      ord, k = 10).count()
    assert(kept == tiny.count(), "groups under the cap must be untouched")
  }

  test("equal-quality ties break to the lowest doc_id") {
    val df = Seq(
      (1L, "a", 0.9), (2L, "a", 0.9), (3L, "a", 0.9), (4L, "a", 0.1)
    ).toDF("doc_id", "source", "q")
    val kept = Curation.capPerGroup(df, "source", "doc_id",
        Curation.qualityOrd(col("q"), col("doc_id")), k = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L), s"expected lowest-id tie-break, got $kept")
  }
}
