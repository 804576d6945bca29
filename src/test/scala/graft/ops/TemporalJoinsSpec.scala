package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.SparkSpec

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin picks the latest at-or-before right row") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 12:00:00")),
      (2L, ts("2024-01-01 09:00:00"))).toDF("k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), "a"),
      (1L, ts("2024-01-01 11:00:00"), "b"),
      (2L, ts("2024-01-01 09:00:00"), "c")).toDF("k", "rt", "v")
    val out = TemporalJoins.asOfJoin(left, right, "k", "t", "rt", Seq("v"))
      .orderBy("k", "t").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("a", "b", "c"))
  }

  test("asOfJoin surfaces a NULL attribute of the latest observation " +
      "instead of an older non-null value") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"))).toDF("k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option("old")),
      (1L, ts("2024-01-01 11:00:00"), Option.empty[String]))
      .toDF("k", "rt", "v")
    val out = TemporalJoins.asOfJoin(left, right, "k", "t", "rt", Seq("v"))
      .collect()
    // the 11:00 row IS the as-of match; its v is null and must stay null
    assert(out.length == 1 && out.head.isNullAt(2))
  }

  test("asOfJoin leaves rows with no prior observation null") {
    val left = Seq((1L, ts("2024-01-01 08:00:00"))).toDF("k", "t")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), "later"))
      .toDF("k", "rt", "v")
    val out = TemporalJoins.asOfJoin(left, right, "k", "t", "rt", Seq("v"))
      .collect()
    assert(out.length == 1 && out.head.isNullAt(2))
  }

  test("rangeJoin bounds pairs to the window") {
    val left = Seq((1L, 100L), (1L, 200L)).toDF("k", "t")
    val right = Seq((1L, 95L), (1L, 40L), (1L, 199L)).toDF("k", "rt")
    val out = TemporalJoins.rangeJoin(left, right, "k", "t", "rt", 10L)
      .select("t", "rt").orderBy("t", "rt").collect()
    assert(out.toSeq == Seq(Row(100L, 95L), Row(200L, 199L)))
  }
}
