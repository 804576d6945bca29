package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data") {
    // 10k rows of one hot key + a long tail
    val left = spark.range(10000).select(lit(1L).as("k"),
        col("id").as("v"))
      .union(spark.range(100).select((col("id") + 2).as("k"),
        col("id").as("v")))
    val right = Seq((1L, "hot"), (2L, "a"), (50L, "b")).toDF("k", "name")

    val plain = left.join(right, Seq("k"), "inner")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("k").as[(Long, Long, Long)].collect().toSeq
    val salted = Scale.saltedJoin(left, right, "k", salts = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("k").as[(Long, Long, Long)].collect().toSeq
    assert(salted == plain)
    assert(salted.head._2 == 10000L)
  }

  test("saltedJoin left type keeps unmatched left rows") {
    val left = Seq((1L, "x"), (9L, "y")).toDF("k", "v")
    val right = Seq((1L, "r")).toDF("k", "r")
    val out = Scale.saltedJoin(left, right, "k", 4, "left")
      .orderBy("k").as[(Long, String, String)].collect().toSeq
    assert(out == Seq((1L, "x", "r"), (9L, "y", null)))
  }

  test("coPartition co-locates and the join avoids extra exchanges") {
    val (a, b) = Scale.coPartition(
      spark.range(1000).select(col("id").as("k"), col("id").as("va")),
      spark.range(500).select(col("id").as("k"), col("id").as("vb")),
      "k", 8)
    val joined = a.join(b, Seq("k"))
    assert(joined.count() == 500)
    // both sides already hash-partitioned on k: the join itself must not
    // introduce new SHUFFLES beyond the two repartitions (a broadcast
    // exchange of the small side is fine and not a shuffle)
    val exchanges = joined.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"expected <=2 shuffle exchanges, got $exchanges")
  }
}
