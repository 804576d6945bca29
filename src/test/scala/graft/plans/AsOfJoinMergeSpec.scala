package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TemporalJoins

class AsOfJoinMergeSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame) = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(col): _*).collect().map(_.toSeq).toSet
  }

  test("merge exec equals the union+window as-of join on random data") {
    val rng = new scala.util.Random(11)
    // keys with heavy reuse, times with deliberate ties, right keys
    // that never appear on the left and vice versa
    val left = (1 to 400).map { i =>
      (i.toLong, (rng.nextInt(12) + 1).toLong, rng.nextInt(50).toLong)
    }.toDF("l_id", "k", "t")
    val right = (1 to 300).map { i =>
      (1000L + i, (rng.nextInt(15) + 1).toLong, rng.nextInt(50).toLong,
        rng.nextInt(1000).toLong)
    }.toDF("r_id", "k", "rt", "v")

    val viaMerge = TemporalJoins.asOfJoinMerge(left, right, "k", "t",
      "rt", Seq("v", "rt"))
    val viaWindow = TemporalJoins.asOfJoin(left, right, "k", "t", "rt",
      Seq("v", "rt"))
    assert(canon(viaMerge) == canon(viaWindow))
    assert(viaMerge.count() == 400) // every left row survives
  }

  test("right-row ties on (key, time) resolve identically to the window form") {
    val left = Seq((1L, 1L, 10L)).toDF("l_id", "k", "t")
    val right = Seq((101L, 1L, 10L, 7L), (102L, 1L, 10L, 9L))
      .toDF("r_id", "k", "rt", "v")
    val m = canon(TemporalJoins.asOfJoinMerge(left, right, "k", "t", "rt",
      Seq("v")))
    val w = canon(TemporalJoins.asOfJoin(left, right, "k", "t", "rt",
      Seq("v")))
    assert(m == w)
  }

  test("null keys/times: left emits unmatched, right rows are skipped") {
    val left = Seq((1L, Some(1L), Some(10L)), (2L, None, Some(5L)),
      (3L, Some(2L), None))
      .toDF("l_id", "k", "t")
    val right = Seq((101L, Some(1L), Some(5L), 7L),
      (102L, Option.empty[Long], Some(1L), 8L),
      (103L, Some(2L), Option.empty[Long], 9L))
      .toDF("r_id", "k", "rt", "v")
    val got = TemporalJoins.asOfJoinMerge(left, right, "k", "t", "rt",
      Seq("v")).orderBy("l_id").collect()
    assert(got(0).getLong(3) == 7L)     // normal match
    assert(got(1).isNullAt(3))          // null left key
    assert(got(2).isNullAt(3))          // null left time; null right
                                        // rows never matched anything
  }

  test("plan contains the custom exec and no window/union") {
    val left = Seq((1L, 1L, 10L)).toDF("l_id", "k", "t")
    val right = Seq((101L, 1L, 5L, 7L)).toDF("r_id", "k", "rt", "v")
    val df = TemporalJoins.asOfJoinMerge(left, right, "k", "t", "rt",
      Seq("v"))
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfJoin"),
      s"expected AsOfJoinExec in plan:\n$physical")
    assert(!physical.contains("Window"),
      s"merge path must not plan a window:\n$physical")
  }

  test("pre-partitioned inputs are not re-shuffled (layout reuse)") {
    val left = (1 to 100).map(i => (i.toLong, (i % 7).toLong, i.toLong))
      .toDF("l_id", "k", "t").repartition(4, col("k"))
    val right = (1 to 50).map(i => (1000L + i, (i % 7).toLong, i.toLong,
      i.toLong)).toDF("r_id", "k", "rt", "v").repartition(4, col("k"))
    val df = TemporalJoins.asOfJoinMerge(left, right, "k", "t", "rt",
      Seq("v"))
    val nExchanges = df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    // the two explicit repartitions are the only exchanges — the exec
    // itself adds none
    assert(nExchanges == 2,
      s"expected only the 2 input repartitions:\n" +
        df.queryExecution.executedPlan)
    assert(canon(df) == canon(TemporalJoins.asOfJoin(
      left, right, "k", "t", "rt", Seq("v"))))
  }
}
