package graft

import org.apache.spark.sql.functions._

/** Guards for the generated DuckDB oracles (OracleSql).
  *
  * The xxhash64 emulation documents a scope: ASCII text and tokens of at
  * most 23 bytes (2 words + int + 3 tail bytes; the 32-byte stripe loop
  * is not emulated). These tests pin that scope against the fixture the
  * driver verifies with — if a future data generation violates it, the
  * oracles would silently hash differently, so fail HERE instead.
  */
class OracleSqlSpec extends SparkSpec {
  import spark.implicits._

  private def docs(sfDir: String) =
    Tables.load(spark, sf(sfDir), "documents")

  test("fixture tokens stay inside the emulated xxhash64 scope (sf0.01)") {
    val toks = docs("sf0.01").select(
      explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
    val maxLen = toks.select(max(octet_length(col("tok")))).as[Int].head()
    assert(maxLen <= 23, s"token of $maxLen bytes exceeds oracle scope")
  }

  test("fixture text is pure ASCII (ord == byte assumption) (sf0.01)") {
    val nonAscii = docs("sf0.01")
      .filter(col("text").rlike("[^\\x00-\\x7F]")).count()
    assert(nonAscii == 0, s"$nonAscii non-ASCII docs break byte emulation")
  }

  test("generated oracles are well-formed (no unrendered interpolation)") {
    val generated = Seq(
      OracleSql.dedupMinhash(), OracleSql.dedupNgramJaccard(),
      OracleSql.dedupSimhash(), OracleSql.dedupComponents(),
      OracleSql.multimodalFeatures(), OracleSql.simLshTopK(),
      OracleSql.simIvfTopK())
    generated.foreach { sql =>
      assert(sql.length > 500)
      assert(!sql.contains("$"), "unrendered interpolation")
      assert(sql.trim.startsWith("WITH"))
    }
    // every query has an oracle and vice versa
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }
}
