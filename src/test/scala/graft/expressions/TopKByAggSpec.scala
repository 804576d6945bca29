package graft.expressions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TopKByAggSpec extends SparkSpec {
  import spark.implicits._

  private def sample = spark.range(10000).select(
    (col("id") % 50).as("g"),
    ((col("id") * 2654435761L) % 1000000).as("ord"),
    col("id").as("v"))

  test("partial merge across partitions equals single-partition result") {
    def run(parts: Int) = sample.repartition(parts)
      .groupBy("g").agg(TopKBy.top_k_by(col("ord"), col("v"), 5).as("t"))
      .orderBy("g").as[(Long, Seq[Long])].collect().toSeq
    assert(run(16) == run(1))
  }

  test("matches the window row_number formulation") {
    val viaAgg = sample.groupBy("g")
      .agg(TopKBy.top_k_by(col("ord"), col("v"), 5).as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("pos", "v")))
      .select(col("g"), (col("pos") + 1).as("rank"), col("v"))
      .as[(Long, Long, Long)].collect().toSet
    // ordering: ord DESC with payload ASC tie-break (TopKBuffer contract)
    val w = Window.partitionBy("g").orderBy(col("ord").desc, col("v").asc)
    val viaWindow = sample.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("g"), col("rank").cast("long"), col("v"))
      .as[(Long, Long, Long)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("Long.MinValue ordering key ranks smallest, not largest") {
    // -Long.MinValue overflows to Long.MinValue: an arithmetic-negation
    // sort would rank it first. It must come last.
    val buf = new TopKBuffer(3)
    buf.add(Long.MinValue, 1L)
    buf.add(0L, 2L)
    buf.add(Long.MaxValue, 3L)
    assert(buf.topPayloadsDesc.toSeq == Seq(3L, 2L, 1L))
  }

  test("groups smaller than k return all rows, heap never overflows") {
    val small = Seq((1L, 10L, 100L), (1L, 20L, 200L)).toDF("g", "ord", "v")
    val got = small.groupBy("g")
      .agg(TopKBy.top_k_by(col("ord"), col("v"), 5).as("t"))
      .as[(Long, Seq[Long])].head()
    assert(got == ((1L, Seq(200L, 100L))))
  }
}
