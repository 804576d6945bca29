package graft

/** t1-style smoke: every registered query runs at sf0.001 and returns a
  * sane frame; oracle keys stay aligned with query keys.
  */
class SparkEntrySmokeSpec extends SparkSpec {

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sf("sf0.001"))
      val n = df.count()
      // near-dup pair queries and highly selective filters may
      // legitimately match nothing at sf0.001; everything else should
      // produce rows on the fixture
      if (!Set("dedup_minhash", "dedup_simhash", "dedup_ngram_jaccard",
        "dedup_ngram_blocked", "dedup_embedding", "q7_volume_shipping",
        "q9_product_profit", "regexp_filter").contains(name)) {
        assert(n > 0, s"$name returned 0 rows")
      }
      assert(df.columns.nonEmpty)
    }
  }
}
