package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("isotonic fit pools adjacent violators (minimax ≡ PAVA)") {
    // bins 0..4, rates 0.2, 0.8, 0.4, 0.6, 1.0 with equal weights:
    // PAVA pools bins 1-3 (0.8, 0.4, 0.6 → 0.6) and leaves 0 and 4.
    val bins = Seq(
      (0L, 10L, 2L), (1L, 10L, 8L), (2L, 10L, 4L),
      (3L, 10L, 6L), (4L, 10L, 10L)).toDF("bin", "n", "p")
    val fit = Analytics.isotonicFitPpm(bins)
      .orderBy("bin")
      .select("bin", "raw_ppm", "fitted_ppm")
      .as[(Long, Long, Long)].collect().toSeq
    assert(fit.map(_._2) == Seq(200000L, 800000L, 400000L, 600000L,
      1000000L))
    assert(fit.map(_._3) == Seq(200000L, 600000L, 600000L, 600000L,
      1000000L), s"pooling wrong: $fit")
  }

  test("isotonic fit output is always monotone, weighted pooling exact") {
    // weighted violator: bin 1 heavy (0.9 × 30), bin 2 light (0.1 × 10)
    // → pooled rate = (27 + 1) / 40 = 0.7
    val bins = Seq((0L, 10L, 1L), (1L, 30L, 27L), (2L, 10L, 1L))
      .toDF("bin", "n", "p")
    val fit = Analytics.isotonicFitPpm(bins).orderBy("bin")
      .select("fitted_ppm").as[Long].collect().toSeq
    assert(fit == Seq(100000L, 700000L, 700000L), s"got $fit")
    assert(fit == fit.sorted, "fitted must be non-decreasing")
  }

  test("linreg recovers an exact linear relationship per group") {
    // g=a: y = 3x + 10 exactly; g=b: y = -2x + 5 exactly
    val rows =
      (1L to 50L).map(x => ("a", x, 3 * x + 10)) ++
        (1L to 40L).map(x => ("b", x, -2 * x + 5))
    val out = Analytics
      .linregByGroup(rows.toDF("g", "x", "y"), "g", col("x"), col("y"))
      .orderBy("g").collect()
    assert(out(0).getAs[Double]("slope") == 3.0)
    assert(out(0).getAs[Double]("intercept") == 10.0)
    assert(out(0).getAs[Long]("n") == 50L)
    assert(out(1).getAs[Double]("slope") == -2.0)
    assert(out(1).getAs[Double]("intercept") == 5.0)
  }

  test("linreg statistics are partitioning-invariant") {
    val rows = (1L to 400L).map(x => ("g", x * 7 % 100, x * 13 % 211))
    val one = Analytics.linregByGroup(
      rows.toDF("g", "x", "y").repartition(1), "g", col("x"), col("y"))
      .head()
    val many = Analytics.linregByGroup(
      rows.toDF("g", "x", "y").repartition(16), "g", col("x"), col("y"))
      .head()
    assert(one == many)
  }

  test("correlation is +1 / -1 for perfectly dependent columns") {
    val rows = (1L to 100L).map(x => (x, 2 * x + 1, 500 - 3 * x))
    val out = Analytics.correlationPairs(rows.toDF("a", "b", "c"),
      Seq("a" -> col("a"), "b" -> col("b"), "c" -> col("c")),
      Seq("a" -> "b", "a" -> "c", "b" -> "c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a_b") == 1.0)
    assert(out("a_c") == -1.0)
    assert(out("b_c") == -1.0)
  }

  test("independent-ish columns give |r| well below 1") {
    val rows = (1L to 1000L).map(x => (x % 97, (x * 31 + 7) % 89))
    val r = Analytics.correlationPairs(rows.toDF("a", "b"),
      Seq("a" -> col("a"), "b" -> col("b")), Seq("a" -> "b"))
      .head().getDouble(1)
    assert(math.abs(r) < 0.2)
  }
}
