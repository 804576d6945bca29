package graft.expressions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

import graft.SparkSpec

class DtwDistanceSpec extends SparkSpec {
  import spark.implicits._

  private def dtw(a: Seq[Long], b: Seq[Long]): Long =
    DtwDistanceImpl.distance(
      new GenericArrayData(a.toArray),
      new GenericArrayData(b.toArray))

  /** Independent full-table DP (no rolling row, no min-side swap) —
    * the textbook recurrence the rolling implementation must match.
    */
  private def ref(a: Seq[Long], b: Seq[Long]): Long = {
    val n = a.length; val m = b.length
    val d = Array.ofDim[Long](n, m)
    for (i <- 0 until n; j <- 0 until m) {
      val c = math.abs(a(i) - b(j))
      d(i)(j) = c + ((i, j) match {
        case (0, 0) => 0L
        case (0, _) => d(0)(j - 1)
        case (_, 0) => d(i - 1)(0)
        case _ => math.min(d(i - 1)(j), math.min(d(i)(j - 1), d(i - 1)(j - 1)))
      })
    }
    d(n - 1)(m - 1)
  }

  test("hand-computed values") {
    // classic alignment win: shifted peak costs far less than L1
    assert(dtw(Seq(0L, 0L, 5L, 0L), Seq(0L, 5L, 0L, 0L)) == 0L)
    assert(dtw(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == 0L)
    assert(dtw(Seq(0L), Seq(7L)) == 7L)
    // monotone ramp vs flat: every cell on the best path pays the gap
    assert(dtw(Seq(1L, 2L, 3L), Seq(2L, 2L, 2L)) == 2L)
    assert(dtw(Seq(3L, 3L), Seq(1L)) == 4L)
  }

  test("degenerate inputs pinned: both empty = 0, one empty = -1") {
    assert(dtw(Seq.empty, Seq.empty) == 0L)
    assert(dtw(Seq(1L, 2L), Seq.empty) == -1L)
    assert(dtw(Seq.empty, Seq(9L)) == -1L)
  }

  test("rolling-row implementation matches the full-table DP on a sweep") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val n = 1 + rnd.nextInt(12)
      val m = 1 + rnd.nextInt(12)
      val a = Seq.fill(n)(rnd.nextInt(21).toLong - 10)
      val b = Seq.fill(m)(rnd.nextInt(21).toLong - 10)
      assert(dtw(a, b) == ref(a, b), s"mismatch on a=$a b=$b")
      // symmetry and identity (DTW has both, though not the triangle)
      assert(dtw(a, b) == dtw(b, a))
      assert(dtw(a, a) == 0L)
      assert(dtw(a, b) >= 0L)
      // endpoints are always aligned: their cost is a lower bound
      assert(dtw(a, b) >= math.abs(a.head - b.head))
      assert(dtw(a, b) >= math.abs(a.last - b.last))
    }
  }

  test("codegen path equals interpreted path over fixture profiles") {
    import DtwDistanceCol.dtw_distance
    val prof = spark.read.parquet(sf("sf0.001") + "/events.parquet")
      .groupBy(col("user_id"))
      .agg(array((0 until 24).map(h =>
        sum(when(hour(col("ts")) === h, 1L).otherwise(0L))): _*).as("p"))
      .limit(10)
    val got = prof.as("a").crossJoin(prof.as("b"))
      .select(col("a.p").as("x"), col("b.p").as("y"),
        dtw_distance(col("a.p"), col("b.p")).as("d"))
      .as[(Seq[Long], Seq[Long], Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (x, y, d) =>
      assert(d == ref(x, y), s"codegen/DP mismatch on ($x, $y)")
    }
  }
}
