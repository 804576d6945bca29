package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(String, Long)]) =
    rows.toDF("k", "v")

  test("merged partial states equal the full recompute") {
    val all = (1 to 500).map(i => (s"k${i % 7}", (i * 37 % 1000).toLong))
    val (a, b) = all.splitAt(311)
    val merged = IncrementalAgg.mergeStates(
      IncrementalAgg.aggState(df(a), Seq("k"), col("v")),
      IncrementalAgg.aggState(df(b), Seq("k"), col("v")),
      Seq("k"))
    val full = IncrementalAgg.aggState(df(all), Seq("k"), col("v"))
    assert(merged.orderBy("k").collect().toSeq ==
      full.orderBy("k").collect().toSeq)
  }

  test("merge is commutative and handles keys unique to one side") {
    val a = df(Seq(("x", 1L), ("y", 5L)))
    val b = df(Seq(("y", 3L), ("z", 9L)))
    val sa = IncrementalAgg.aggState(a, Seq("k"), col("v"))
    val sb = IncrementalAgg.aggState(b, Seq("k"), col("v"))
    val ab = IncrementalAgg.mergeStates(sa, sb, Seq("k"))
      .orderBy("k").collect().toSeq
    val ba = IncrementalAgg.mergeStates(sb, sa, Seq("k"))
      .orderBy("k").collect().toSeq
    assert(ab == ba)
    val y = ab.find(_.getString(0) == "y").get
    assert(y.getLong(1) == 2L && y.getLong(2) == 8L &&
      y.getLong(3) == 3L && y.getLong(4) == 5L)
    val z = ab.find(_.getString(0) == "z").get
    assert(z.getLong(1) == 1L && z.getLong(2) == 9L)
  }

  test("readView derives the exact mean") {
    val st = IncrementalAgg.aggState(
      df(Seq(("a", 1L), ("a", 2L))), Seq("k"), col("v"))
    val row = IncrementalAgg.readView(st).head()
    assert(row.getAs[Double]("st_avg") == 1.5)
  }
}
