package graft.functions

import org.apache.spark.sql.functions.{col, element_at}

import graft.SparkSpec

/** [[Dedup.repeatedSpans]] — cross-document exact repeated-span
  * detection — and [[Dedup.sortedNeighborhoodPairs]] — Hernández–Stolfo
  * sorted-neighborhood candidate generation with exact verification.
  */
class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  test("repeated spans: counts distinct docs and total occurrences") {
    // span "a b c" in docs 1 (twice) and 2; "c d e" only in doc 1;
    // doc 3 too short to produce any 3-token span
    val docs = Seq(
      (1L, "a b c d e a b c"),
      (2L, "x a b c y"),
      (3L, "a b")
    ).toDF("doc_id", "text")
    val out = Dedup
      .repeatedSpans(docs, "doc_id", "text", spanTokens = 3, minDocs = 2)
      .select("span", "n_docs", "n_occ", "first_doc")
      .as[(String, Long, Long, Long)].collect().toList
    assert(out == List(("a b c", 2L, 3L, 1L)))
  }

  test("repeated spans: minDocs gates on document reach, not count") {
    // "p q r" occurs 3 times but only inside doc 7 — reach 1, filtered
    val docs = Seq((7L, "p q r p q r p q r")).toDF("doc_id", "text")
    val out = Dedup
      .repeatedSpans(docs, "doc_id", "text", spanTokens = 3, minDocs = 2)
    assert(out.count() == 0)
  }

  test("sorted neighborhood: rank window bounds the candidate set") {
    // one block (same key column); lengths force the rank order
    // 1 < 2 < 3 < 4; window = 1 compares only adjacent ranks, so the
    // high-Jaccard pair (1, 4) is OUT of the window — the classic SNM
    // trade — while the adjacent near-identical (1, 2) is found.
    val docs = Seq(
      (1L, "k", "a b c d"),
      (2L, "k", "a b c dd"),
      (3L, "k", "q r s t u v w x"),
      (4L, "k", "a b c d e f g h i")
    ).toDF("doc_id", "blk", "text")
    val out = Dedup
      .sortedNeighborhoodPairs(docs, "doc_id", "text",
        blockCols = Seq("blk"), window = 1, shingleN = 1, minSim = 0.5)
      .select("id_a", "id_b", "jac_ppm")
      .as[(Long, Long, Long)].collect().toList
    assert(out == List((1L, 2L, 600000L)))
  }

  test("sorted neighborhood: blocks never compare across keys") {
    val docs = Seq(
      (1L, "k1", "a b c d"),
      (2L, "k2", "a b c d") // identical text, different block
    ).toDF("doc_id", "blk", "text")
    val out = Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
      blockCols = Seq("blk"), window = 5, shingleN = 1, minSim = 0.1)
    assert(out.count() == 0)
  }

  test("leakage-safe split: near-dup pairs never straddle splits") {
    // the property the query exists for — every >= 0.5 candidate pair
    // must land in one split (doc-keyed hashing would violate this)
    val split = graft.SparkEntry.queries("split_leakage_safe")(
      spark, sf("sf0.01")).select("doc_id", "split")
    val pairs = Dedup.minHashCandidates(
        graft.Tables.load(spark, sf("sf0.01"), "documents"),
        "doc_id", "text")
      .filter(col("est_jaccard") >= 0.5)
      .select("id_a", "id_b")
    val straddling = pairs
      .join(split.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("split", "sp_a"), Seq("id_a"))
      .join(split.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("split", "sp_b"), Seq("id_b"))
      .filter(col("sp_a") =!= col("sp_b"))
    assert(pairs.count() > 0, "fixture lost its near-dup pairs")
    assert(straddling.count() == 0)
  }

  test("sorted neighborhood with content key finds label-crossing twins") {
    // the dedup_sorted_neighborhood wiring: first token as block key —
    // twins whose metadata differs still collide on content
    val docs = Seq(
      (1L, "a b c d", "en", "s1"),
      (2L, "a b c dd", "fr", "s2")
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("snm_key", element_at(Dedup.tokens(col("text")), 1))
    val out = Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
      blockCols = Seq("snm_key"), window = 5, shingleN = 1, minSim = 0.5)
    assert(out.count() == 1)
  }

  test("survivorship golden records match a driver-side union-find replay") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.expressions.JaroWinklerImpl

    val got = graft.SparkEntry.queries("link_survivorship")(
      spark, sf("sf0.001"))
      .as[(Long, Long, String, Long, String)].collect()
      .map(r => r._1 -> r).toMap

    // independent replay: collect the tiny fixture slice, rebuild the
    // match graph with the SAME scorer, union-find the clusters, and
    // apply each survivorship rule in plain Scala
    val rows = spark.read.parquet(sf("sf0.001") + "/customer.parquet")
      .filter(col("c_custkey") < 500)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        org.apache.spark.sql.functions.floor(col("c_acctbal") * 100)
          .cast("long").as("bal"), col("c_mktsegment"))
      .as[(Long, String, Long, Long, String)].collect()
    val parent = scala.collection.mutable.Map(
      rows.map(r => r._1 -> r._1).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    for {
      a <- rows; b <- rows
      if a._3 == b._3 && a._1 < b._1 &&
        JaroWinklerImpl.similarity(UTF8String.fromString(a._2),
          UTF8String.fromString(b._2)) > 0.955
    } {
      val (ra, rb) = (find(a._1), find(b._1))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val clusters = rows.filter(r => rows.exists(o =>
        find(o._1) == find(r._1) && o._1 != r._1))
      .groupBy(r => find(r._1))

    assert(got.keySet == clusters.keySet)
    clusters.foreach { case (k, ms) =>
      val (_, n, name, bal, seg) = got(k)
      assert(n == ms.length)
      val maxLen = ms.map(_._2.length).max
      assert(name == ms.filter(_._2.length == maxLen).map(_._2).min)
      assert(bal == ms.map(_._4).max)
      val segCnt = ms.groupBy(_._5).view.mapValues(_.length)
      val best = segCnt.values.max
      assert(seg == segCnt.collect {
        case (s, c) if c == best => s }.min)
    }
  }
}
