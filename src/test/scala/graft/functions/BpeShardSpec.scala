package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeShardSpec extends SparkSpec {
  import spark.implicits._

  test("bpe pair counts weight pairs by word frequency") {
    // "abab" x3 and "abc" x1 → ab: 3*2+1=7? No: pairs of "abab" are
    // ab, ba, ab → ab counts twice per occurrence.
    val docs = Seq((1L, "abab abab abab abc")).toDF("doc_id", "text")
    val out = TextFunctions.bpePairCounts(docs, "text", 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("ab") == 3 * 2 + 1) // two per "abab" (3x), one in "abc"
    assert(out("ba") == 3)
    assert(out("bc") == 1)
  }

  test("case folding and non-alphanumeric splitting") {
    val docs = Seq((1L, "Hello, HELLO! world")).toDF("doc_id", "text")
    val out = TextFunctions.bpePairCounts(docs, "text", 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("he") == 2) // both hellos fold to the same word
    assert(out("wo") == 1)
    assert(!out.contains("o,")) // punctuation is a separator
  }

  test("top-k cut is deterministic under ties (count desc, pair asc)") {
    val docs = Seq((1L, "ab cd ef gh")).toDF("doc_id", "text")
    val out = TextFunctions.bpePairCounts(docs, "text", 2)
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("ab", "cd")) // all count 1 → lexicographic
  }

  test("shard manifest partitions every doc exactly once, stably") {
    val docs = (1L to 300L).map(i => (i, "x" * (i % 17 + 1).toInt))
      .toDF("doc_id", "text")
    val m = Packing.shardManifest(docs, "doc_id", "text", 8).collect()
    assert(m.map(_.getAs[Long]("n_docs")).sum == 300L)
    assert(m.map(_.getAs[Long]("total_chars")).sum ==
      (1L to 300L).map(_ % 17 + 1).sum)
    // growth stability: the first 300 docs keep their shard when 200
    // more arrive — hash assignment never reshuffles history
    val more = (1L to 500L).map(i => (i, "y")).toDF("doc_id", "text")
    val a = Packing.shardManifest(docs, "doc_id", "text", 8)
      .select("shard", "min_id").orderBy("shard").collect()
    val assignA = docs.select(col("doc_id"),
      pmod(xxhash64(col("doc_id")), lit(8L)).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val assignB = more.select(col("doc_id"),
      pmod(xxhash64(col("doc_id")), lit(8L)).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 300L).forall(i => assignA(i) == assignB(i)))
    assert(a.nonEmpty)
  }
}
