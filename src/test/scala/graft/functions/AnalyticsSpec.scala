package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

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
