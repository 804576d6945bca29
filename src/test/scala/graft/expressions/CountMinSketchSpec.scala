package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSketchSpec extends SparkSpec {
  import spark.implicits._

  private def items = spark.range(20000)
    .select(concat(lit("item"), col("id") % 50).as("token"))

  private def build(df: org.apache.spark.sql.DataFrame, d: Int,
                    w: Int): Array[Byte] =
    df.agg(Cms.cms_state(col("token"), d, w).as("st"))
      .head().getAs[Array[Byte]](0)

  test("estimate is never below the exact count (no underestimates)") {
    val state = build(items, 4, 16) // 50 items into 16 buckets: collisions
    val rows = items.groupBy("token")
      .agg(count(lit(1)).as("exact"))
      .select(col("token"), col("exact"),
        Cms.cms_estimate(lit(state), col("token"), 4).as("est"))
      .as[(String, Long, Long)].collect()
    assert(rows.length == 50)
    rows.foreach { case (tok, exact, est) =>
      assert(est >= exact, s"$tok: cms $est < exact $exact")
    }
    // with 50 keys in 16 buckets some row must actually collide
    assert(rows.exists { case (_, exact, est) => est > exact },
      "undersized grid should produce at least one overestimate")
  }

  test("wide grid gives exact counts when no buckets collide") {
    val few = spark.range(1000)
      .select(concat(lit("k"), col("id") % 5).as("token"))
    val state = build(few, 4, 1024)
    val rows = few.groupBy("token").agg(count(lit(1)).as("exact"))
      .select(Cms.cms_estimate(lit(state), col("token"), 4).as("est"),
        col("exact"))
      .as[(Long, Long)].collect()
    rows.foreach { case (est, exact) => assert(est == exact) }
  }

  test("partial merge across partitions equals 1-partition build") {
    def run(parts: Int) = build(items.repartition(parts), 4, 32)
    assert(java.util.Arrays.equals(run(1), run(16)),
      "elementwise-add merge must be partition-independent")
  }

  test("mismatched grid shapes refuse to merge") {
    val a = new CmsBuffer(4, 32)
    val b = new CmsBuffer(4, 64)
    intercept[IllegalArgumentException] { a.mergeWith(b) }
    intercept[IllegalArgumentException] { new CmsBuffer(3, 48) } // not pow2
  }
}
