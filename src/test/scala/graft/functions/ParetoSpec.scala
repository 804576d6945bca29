package graft.functions

import graft.SparkSpec

class ParetoSpec extends SparkSpec {
  import spark.implicits._

  private def bruteFront(pts: Seq[(Long, Long, Long)]) =
    pts.filterNot { case (_, x, y) =>
      pts.exists { case (_, x2, y2) => x2 > x && y2 > y }
    }.map(_._1).toSet

  test("band-pruned skyline equals the brute-force front") {
    // pseudo-random but deterministic point cloud, including ties on
    // both axes and duplicate points
    val pts = (1L to 400L).map { i =>
      (i, i * 131 % 97, i * 197 % 89)
    }
    val out = Curation.paretoFront(pts.toDF("id", "x", "y"),
      "id", "x", "y", bandWidth = 16L)
      .collect().map(_.getLong(0)).toSet
    assert(out == bruteFront(pts))
  }

  test("skyline is band-width independent") {
    val pts = (1L to 300L).map(i => (i, i * 37 % 211, i * 53 % 223))
    val df = pts.toDF("id", "x", "y")
    val w1 = Curation.paretoFront(df, "id", "x", "y", 1L)
      .collect().map(_.getLong(0)).toSet
    val w7 = Curation.paretoFront(df, "id", "x", "y", 7L)
      .collect().map(_.getLong(0)).toSet
    val w1000 = Curation.paretoFront(df, "id", "x", "y", 1000L)
      .collect().map(_.getLong(0)).toSet
    assert(w1 == w7 && w7 == w1000)
    assert(w1 == bruteFront(pts))
  }

  test("equal points are all kept (dominance is strict)") {
    val pts = Seq((1L, 5L, 5L), (2L, 5L, 5L), (3L, 5L, 4L), (4L, 4L, 5L),
      (5L, 6L, 4L), (6L, 4L, 6L))
    val out = Curation.paretoFront(pts.toDF("id", "x", "y"),
      "id", "x", "y", 4L)
      .collect().map(_.getLong(0)).toSet
    // (5,5) twins: kept (nothing strictly beats both coords);
    // (5,4): dominated by... x=6,y=4? not strict in y; by (5,5)? not
    // strict in x — kept. (4,5): dominated by (5,5)? x 5>4, y 5=5 not
    // strict — kept. (6,4) and (4,6): on the hull — kept.
    assert(out == Set(1L, 2L, 3L, 4L, 5L, 6L))
    val pts2 = pts :+ (7L, 7L, 7L) // dominates everything
    val out2 = Curation.paretoFront(pts2.toDF("id", "x", "y"),
      "id", "x", "y", 4L)
      .collect().map(_.getLong(0)).toSet
    assert(out2 == Set(7L))
  }

  test("negative coordinates are handled (floor-div banding)") {
    val pts = Seq((1L, -10L, 3L), (2L, -5L, 2L), (3L, 0L, 1L),
      (4L, -100L, 100L))
    val out = Curation.paretoFront(pts.toDF("id", "x", "y"),
      "id", "x", "y", 8L)
      .collect().map(_.getLong(0)).toSet
    assert(out == bruteFront(pts))
  }
}
