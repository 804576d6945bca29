package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  test("candidate set is a superset of items above n/(k+1)") {
    // zipf-ish stream: item i appears ~ N/i times
    val rows = (1 to 200).flatMap(i => Seq.fill(2000 / i)(s"item_$i"))
    val n = rows.length.toLong
    val k = 16
    val df = rows.toDF("item").repartition(8)
    val cands = df.agg(Frequent.mg_candidates(col("item"), k))
      .as[Seq[String]].head().toSet
    assert(cands.size <= k)
    val exact = rows.groupBy(identity).view.mapValues(_.length.toLong)
    val mustHave = exact.filter(_._2 * (k + 1) > n).keys.toSet
    assert(mustHave.subsetOf(cands),
      s"missing heavy hitters: ${mustHave -- cands}")
  }

  test("superset guarantee holds under any partitioning (merge safety)") {
    val rows = (1 to 500).flatMap(i => Seq.fill(5000 / i)(s"w$i"))
    val n = rows.length.toLong
    val k = 32
    val exact = rows.groupBy(identity).view.mapValues(_.length.toLong)
    val mustHave = exact.filter(_._2 * (k + 1) > n).keys.toSet
    for (parts <- Seq(1, 4, 32)) {
      val cands = rows.toDF("item").repartition(parts)
        .agg(Frequent.mg_candidates(col("item"), k))
        .as[Seq[String]].head().toSet
      assert(mustHave.subsetOf(cands),
        s"parts=$parts missing: ${mustHave -- cands}")
    }
  }

  test("uniform stream yields at most k candidates, no crash") {
    val df = spark.range(50000)
      .select(concat(lit("u"), col("id") % 5000).as("item"))
    val cands = df.agg(Frequent.mg_candidates(col("item"), 8))
      .as[Seq[String]].head()
    assert(cands.length <= 8)
    assert(cands == cands.sorted)
  }
}

class MgBufferSuite extends AnyFunSuite {
  test("weighted decrement-all keeps counters consistent") {
    val buf = new MgBuffer(2)
    buf.add("a", 10)
    buf.add("b", 4)
    buf.add("c", 6) // decrements by min(6, 4)=4: a->6, b evicted, c residual 2
    assert(buf.countOf("a") == 6L)
    assert(buf.countOf("b") == 0L)
    assert(buf.countOf("c") == 2L)
    assert(buf.size == 2)
  }

  test("PODS'12 merge reduces to k and preserves dominant items") {
    val a = new MgBuffer(3)
    val b = new MgBuffer(3)
    Seq("x" -> 100L, "y" -> 10L, "z" -> 5L).foreach { case (i, c) => a.add(i, c) }
    Seq("x" -> 80L, "w" -> 12L, "v" -> 4L).foreach { case (i, c) => b.add(i, c) }
    a.mergeWith(b)
    assert(a.size <= 3)
    assert(a.countOf("x") > 0L, "dominant item must survive merge")
  }

  test("state stays bounded at k during a high-cardinality stream") {
    val buf = new MgBuffer(16)
    (1 to 100000).foreach(i => buf.add(s"item_${i % 7919}"))
    assert(buf.size <= 16, s"unbounded state: ${buf.size} counters")
  }

  test("serialization round-trip preserves counters") {
    val buf = new MgBuffer(5)
    Seq("alpha" -> 7L, "beta" -> 3L, "gamma" -> 1L)
      .foreach { case (i, c) => buf.add(i, c) }
    val back = MgBuffer.fromBytes(buf.toBytes)
    assert(back.k == 5)
    assert(back.items.sorted.toSeq == buf.items.sorted.toSeq)
    buf.items.foreach(i => assert(back.countOf(i) == buf.countOf(i)))
  }
}
