package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BitmapDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("bitmap distinct equals countDistinct (dense keys)") {
    val df = spark.range(200000).select(
      (col("id") % 7).as("g"), (col("id") % 54321).as("v"))
    val rows = df.groupBy("g")
      .agg(Bitmaps.bitmap_distinct(col("v")).as("bm"),
        countDistinct(col("v")).as("exact"))
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 7)
    rows.foreach { case (_, bm, exact) =>
      assert(bm == exact, s"bitmap must be exact: $bm vs $exact")
    }
  }

  test("merge-invariant across partitionings") {
    val df = spark.range(300000)
      .select((col("id") % 4).as("g"), (col("id") * 13 % 99991).as("v"))
    def run(parts: Int) = df.repartition(parts).groupBy("g")
      .agg(Bitmaps.bitmap_distinct(col("v")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(run(1) == run(32))
  }

  test("negative and page-straddling keys count exactly") {
    // values straddle page boundaries (multiples near 65536) and sign
    val vals = Seq(-1L, -65536L, -65537L, 0L, 1L, 65535L, 65536L,
      65537L, 131071L, 131072L, Long.MaxValue, Long.MinValue,
      -1L, 0L, 65536L) // dupes must not double-count
    val df = vals.toDF("v")
    val n = df.agg(Bitmaps.bitmap_distinct(col("v"))).as[Long].head()
    assert(n == vals.distinct.length.toLong)
  }

  test("sparse pages promote to dense past the roaring crossover") {
    val buf = new RoaringBuffer
    // one page, cardinality past 4096 => bitmap container; exact count
    (0 until 10000).foreach(i => buf.add(i.toLong))
    (0 until 10000).foreach(i => buf.add(i.toLong)) // idempotent re-add
    assert(buf.cardinality == 10000L)
    assert(buf.nPages == 1)
    // serialization round-trip preserves the set exactly
    val back = RoaringBuffer.fromBytes(buf.toBytes)
    assert(back.cardinality == 10000L)
    back.or(buf)
    assert(back.cardinality == 10000L)
  }

  test("state store + merge equals single-pass count (lossless rollup)") {
    val df = spark.range(150000).select(
      (col("id") % 3).as("g"), (col("id") % 12).as("part"),
      (col("id") % 33333).as("v"))
    val direct = df.groupBy("g")
      .agg(Bitmaps.bitmap_distinct(col("v")).as("n"))
      .as[(Long, Long)].collect().toMap
    val rolled = df.groupBy("g", "part")
      .agg(Bitmaps.bitmap_state(col("v")).as("bm"))
      .groupBy("g")
      .agg(Bitmaps.bitmap_merge_count(col("bm")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(direct == rolled, "bitmap rollup must be lossless")
  }
}
