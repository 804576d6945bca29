package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BudgetFillSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 200L)
    .map(i => (i, s"src${i % 4}", "x" * (i % 23 + 5).toInt))
    .toDF("doc_id", "source", "text")

  test("every kept doc starts under budget; overshoot is at most one doc") {
    val out = Sampling.budgetFill(docs, "doc_id", "source",
      length(col("text")), budget = 300L)
    val rows = out.collect()
    assert(rows.forall(_.getAs[Long]("cum_before") < 300L))
    // per source: total cost of kept docs < budget + max single cost
    val kept = rows.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("cost")).sum)
    assert(kept.values.forall(_ < 300L + 28L))
    assert(kept.keySet == Set("src0", "src1", "src2", "src3"))
  }

  test("kept set is partitioning-invariant (distributed prefix sum is exact)") {
    val a = Sampling.budgetFill(docs.repartition(1), "doc_id", "source",
      length(col("text")), 300L).orderBy("doc_id").collect().toSeq
    val b = Sampling.budgetFill(docs.repartition(13), "doc_id", "source",
      length(col("text")), 300L).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("a growing corpus keeps a prefix-stable fill order") {
    // budget large enough to keep everything: cum_before then encodes
    // the full hash order; the first 100 docs' relative order must not
    // change when 100 more arrive (hash order is corpus-independent)
    val half = docs.filter(col("doc_id") <= 100)
    val hOrder = Sampling.budgetFill(half, "doc_id", "source",
      length(col("text")), budget = 1000000L)
      .orderBy("source", "cum_before").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id")))
    val fullOrder = Sampling.budgetFill(docs, "doc_id", "source",
      length(col("text")), budget = 1000000L)
      .orderBy("source", "cum_before").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id")))
      .filter(_._2 <= 100)
    assert(hOrder.toSeq == fullOrder.toSeq)
  }
}
