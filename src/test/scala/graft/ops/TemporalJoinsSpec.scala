package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

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

  test("asOfJoin forward picks the earliest at-or-after observation") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 11:00:00")),   // exactly simultaneous with b
      (1L, ts("2024-01-01 12:30:00"))).toDF("k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), "a"),
      (1L, ts("2024-01-01 11:00:00"), "b"),
      (1L, ts("2024-01-01 12:00:00"), "c")).toDF("k", "rt", "v")
    val out = TemporalJoins.asOfJoin(left, right, "k", "t", "rt", Seq("v"),
        direction = "forward")
      .orderBy("t").collect()
    // 10:00 → b (11:00 is next), 11:00 → b (>= includes equal),
    // 12:30 → nothing after
    assert(out.map(r => Option(r.getString(2))).toSeq ==
      Seq(Some("b"), Some("b"), None))
  }

  test("asOfJoin nearest minimizes |delta| and resolves ties backward") {
    val left = Seq(
      (1L, ts("2024-01-01 10:10:00")),  // 10 min after a, 50 before b
      (1L, ts("2024-01-01 10:30:00")),  // exact tie: 30/30 → backward a
      (1L, ts("2024-01-01 08:00:00")),  // before all → forward a
      (1L, ts("2024-01-01 13:00:00"))). // after all → backward b
      toDF("k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 11:00:00"), "b")).toDF("k", "rt", "v")
    val out = TemporalJoins.asOfJoin(left, right, "k", "t", "rt", Seq("v"),
        direction = "nearest")
      .orderBy("t").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("a", "a", "a", "b"))
  }

  test("rangeJoin bounds pairs to the window") {
    val left = Seq((1L, 100L), (1L, 200L)).toDF("k", "t")
    val right = Seq((1L, 95L), (1L, 40L), (1L, 199L)).toDF("k", "rt")
    val out = TemporalJoins.rangeJoin(left, right, "k", "t", "rt", 10L)
      .select("t", "rt").orderBy("t", "rt").collect()
    assert(out.toSeq == Seq(Row(100L, 95L), Row(200L, 199L)))
  }

  test("interpolateHourly lands grid points between observations") {
    // key a: obs at 00:00 (v=10) and 02:00 (v=30): grid 00/01/02 ->
    // 10, 20 (midpoint), and 30 only via the terminal aligned emit
    val rows = Seq(
      ("a", 0L, 10.0), ("a", 7200L, 30.0),
      // key b: obs at 00:30 and 01:30 -> single interior point at 01:00
      ("b", 1800L, 0.0), ("b", 5400L, 100.0))
    val df = rows.toDF("event_type", "e", "value")
      .withColumn("ts", col("e").cast("timestamp"))
    val out = TemporalJoins
      .interpolateHourly(df, "event_type", "ts", "value")
      .orderBy("event_type", "grid_epoch")
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("a", 0L, 10.0), ("a", 3600L, 20.0), ("a", 7200L, 30.0),
      ("b", 3600L, 50.0)), s"got $out")
  }

  test("interpolateHourly dedupes same-second observations with max") {
    val rows = Seq(("a", 0L, 1.0), ("a", 0L, 9.0), ("a", 3600L, 9.0))
    val df = rows.toDF("event_type", "e", "value")
      .withColumn("ts", col("e").cast("timestamp"))
    val out = TemporalJoins
      .interpolateHourly(df, "event_type", "ts", "value")
      .orderBy("grid_epoch").as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("a", 0L, 9.0), ("a", 3600L, 9.0)), s"got $out")
  }
}
