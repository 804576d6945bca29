package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("below k rows the quantile is exact") {
    val df = spark.range(100).select((col("id") % 4).as("g"),
      col("id").as("k"), (col("id") * 3 % 97).cast("double").as("v"))
    val rows = df.groupBy("g")
      .agg(Kq.kq_state(col("v"), 256, col("k")).as("sk"))
      .select(col("g"), Kq.kq_quantile(col("sk"), 0.5).as("p50"))
      .as[(Long, Double)].collect().toMap
    val exact = df.as[(Long, Long, Double)].collect()
      .groupBy(_._1).map { case (g, rs) =>
        val vs = rs.map(_._3).sorted
        g -> vs(math.ceil(0.5 * vs.length).toInt - 1)
      }
    assert(rows == exact, s"below-k must be the exact quantile")
  }

  test("sample membership is partition-independent") {
    val df = spark.range(50000).select(col("id").as("k"),
      (col("id") % 1000).cast("double").as("v"))
    def run(parts: Int): Array[Byte] = df.repartition(parts)
      .agg(Kq.kq_state(col("v"), 128, col("k")).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(run(1), run(16)),
      "bottom-k sample must not depend on partitioning")
  }

  test("rollup merge is lossless: merged states equal the single-pass sketch") {
    val df = spark.range(30000).select((col("id") % 7).as("bucket"),
      col("id").as("k"), (col("id") % 353).cast("double").as("v"))
    val single = df.agg(Kq.kq_state(col("v"), 64, col("k")).as("sk"))
      .select(Kq.kq_quantile(col("sk"), 0.9)).head().getDouble(0)
    val rolled = df.groupBy("bucket")
      .agg(Kq.kq_state(col("v"), 64, col("k")).as("sk"))
      .agg(Kq.kq_merge(col("sk")).as("m"))
      .select(Kq.kq_quantile(col("m"), 0.9)).head().getDouble(0)
    assert(single == rolled,
      s"lossless merge violated: single $single vs rolled $rolled")
  }

  test("estimate stays within the sampling rank-error envelope") {
    // uniform values 0..9999: true p50 = 5000; k=256 => rank error
    // ~1/sqrt(k) ~ 6%; assert a generous 4-sigma band
    val df = spark.range(100000).select(col("id").as("k"),
      (col("id") % 10000).cast("double").as("v"))
    val p50 = df.agg(Kq.kq_state(col("v"), 256, col("k")).as("sk"))
      .select(Kq.kq_quantile(col("sk"), 0.5)).head().getDouble(0)
    assert(math.abs(p50 - 5000.0) < 2500.0,
      s"p50 estimate $p50 implausibly far from 5000")
  }

  test("mixed sample sizes refuse to merge") {
    val s8 = spark.range(100)
      .agg(Kq.kq_state(col("id").cast("double"), 8, col("id")).as("sk"))
    val s16 = spark.range(100)
      .agg(Kq.kq_state(col("id").cast("double"), 16, col("id")).as("sk"))
    val e = intercept[Exception] {
      s8.unionByName(s16).coalesce(1)
        .agg(Kq.kq_merge(col("sk")).as("m")).head()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("mixed sample sizes")),
      s"expected the mixed-k error, got: ${chain(e).mkString(" | ")}")
  }
}
