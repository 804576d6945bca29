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

  private def multiset(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  test("deltaJoin + old join equals the monolithic re-join, row for row") {
    val rng = new scala.util.Random(5)
    val l = (1 to 200).map(i =>
      ((rng.nextInt(30) + 1).toLong, i.toLong)).toDF("k", "lv")
    val r = (1 to 150).map(i =>
      ((rng.nextInt(40) + 1).toLong, 1000L + i)).toDF("k", "rv")
    val (bl, dl) = (l.filter($"lv" % 4 =!= 0), l.filter($"lv" % 4 === 0))
    val (br, dr) = (r.filter($"rv" % 3 =!= 0), r.filter($"rv" % 3 === 0))
    val incremental = bl.join(br, Seq("k"))
      .unionByName(IncrementalAgg.deltaJoin(bl, dl, br, dr, Seq("k")))
    assert(multiset(incremental) == multiset(l.join(r, Seq("k"))))
  }

  test("deltaJoin with empty deltas is empty; delta×delta pairs appear once") {
    val l = Seq((1L, 1L)).toDF("k", "lv")
    val r = Seq((1L, 2L)).toDF("k", "rv")
    val empty = l.limit(0)
    val emptyR = r.limit(0)
    assert(IncrementalAgg.deltaJoin(l, empty, r, emptyR, Seq("k"))
      .count() == 0)
    // both rows arrive IN the delta: exactly one joined row, produced
    // by the ΔL ⋈ (R ∪ ΔR) term, not duplicated by the L ⋈ ΔR term
    assert(IncrementalAgg.deltaJoin(empty, l, emptyR, r, Seq("k"))
      .count() == 1)
  }
}
