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

  test("no duplicate query/oracle keys in the SparkEntry source") {
    // Map literals silently keep the LAST duplicate key — a re-added
    // query name would shadow (or be shadowed by) the original with no
    // compiler diagnostic (this bit round 7: a second profile_benford).
    // Scan the source for entry keys and assert global uniqueness.
    val src = java.nio.file.Files.readString(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala"))
    val queryKey = """"([a-z0-9_]+)" -> \(\(s, dir\)""".r
    val qDupes = queryKey.findAllMatchIn(src).map(_.group(1)).toSeq
      .groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    assert(qDupes.isEmpty, s"duplicate query keys: $qDupes")
    // oracle entries: lines like  "name" -> <sql or builder>
    // count only names that exist as oracle keys to avoid false hits
    val oracleNames = SparkEntry.oracleSql.keySet
    val entryKey = """"([a-z0-9_]+)" ->""".r
    val oDupes = entryKey.findAllMatchIn(src).map(_.group(1)).toSeq
      .filter(oracleNames)
      .groupBy(identity)
      // each name appears once as a query entry and once as an oracle
      // entry; a third occurrence means a duplicate somewhere
      .collect { case (k, v) if v.size > 2 => k -> v.size }
    assert(oDupes.isEmpty, s"keys with extra entries: $oDupes")
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
