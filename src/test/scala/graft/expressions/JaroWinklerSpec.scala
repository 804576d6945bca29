package graft.expressions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerImpl.similarity(UTF8String.fromString(a),
      UTF8String.fromString(b))

  test("textbook values (Winkler 1990 / RapidFuzz semantics)") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(jw("same", "same") == 1.0)
    assert(jw("", "x") == 0.0)
    assert(jw("abc", "xyz") == 0.0)
  }

  test("prefix bonus gated at jaro > 0.7 (the DuckDB/RapidFuzz boost)") {
    // shares a 2-char prefix but jaro <= 0.7 → NO bonus applied
    val low = jw("smellyfish", "small ring")
    assert(math.abs(low - 2.0 / 3.0) < 1e-12,
      s"low-similarity pair must return raw jaro, got $low")
    // symmetric
    assert(jw("smellyfish", "small ring") == jw("small ring", "smellyfish"))
  }

  test("codegen path equals interpreted path on fixture names") {
    import JaroWinklerCol.jaro_winkler
    val c = spark.read.parquet(sf("sf0.001") + "/customer.parquet")
      .select(col("c_name")).limit(30)
    val pairs = c.as("a").crossJoin(c.as("b"))
      .select(col("a.c_name").as("x"), col("b.c_name").as("y"),
        jaro_winkler(col("a.c_name"), col("b.c_name")).as("s"))
      .as[(String, String, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (x, y, s) =>
      assert(s == jw(x, y), s"codegen/interpreted mismatch on ($x, $y)")
      assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("null inputs yield null") {
    import JaroWinklerCol.jaro_winkler
    val df = Seq(("a", Option("b")), ("c", None))
      .toDF("x", "y")
      .select(jaro_winkler(col("x"), col("y")).as("s"))
    val got = df.collect().map(r => Option(r.get(0)))
    assert(got.count(_.isEmpty) == 1)
  }
}
