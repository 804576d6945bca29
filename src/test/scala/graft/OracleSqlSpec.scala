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

  private val GuardedSfs = Seq("sf0.001", "sf0.01", "sf0.1")

  test("events.ts loads as TIMESTAMP_LTZ under the pinned UTC session") {
    // The driver regenerates testdata between rounds, and the events
    // `ts` parquet logical type has already shifted once (NANOS →
    // µs/NTZ), silently breaking every event-time + streaming path
    // until Tables.load normalized it. This guard makes the NEXT
    // regeneration fail loudly here instead: whatever physical type
    // ships, the loaded column must come out TimestampType (LTZ).
    import org.apache.spark.sql.types.TimestampType
    GuardedSfs.foreach { s =>
      val ts = Tables.load(spark, sf(s), "events").schema("ts").dataType
      assert(ts == TimestampType,
        s"$s: events.ts loaded as $ts, not TimestampType — the driver " +
          "regenerated the fixture with a ts type Tables.load does not " +
          "normalize; extend the normalization before trusting any " +
          "event-time query")
    }
  }

  test("fixture tokens stay inside the emulated xxhash64 scope") {
    GuardedSfs.foreach { s =>
      val toks = docs(s).select(
        explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      val maxLen = toks.select(max(octet_length(col("tok")))).as[Int].head()
      assert(maxLen <= 23, s"$s: token of $maxLen bytes exceeds oracle scope")
    }
  }

  test("fixture text is pure ASCII (ord == byte assumption)") {
    GuardedSfs.foreach { s =>
      val nonAscii = docs(s)
        .filter(col("text").rlike("[^\\x00-\\x7F]")).count()
      assert(nonAscii == 0, s"$s: $nonAscii non-ASCII docs break emulation")
    }
  }

  test("fixture has no empty/whitespace-only docs (sentinel-signature gap)") {
    // Spark gives empty docs sentinel MinHash signatures (two empty docs
    // band-match with est 1.0) and SimHash 0L, while the oracle's token
    // CTE drops them entirely — equality holds only while no empty docs
    // exist, so pin that
    GuardedSfs.foreach { s =>
      val empty = docs(s).filter(length(trim(col("text"))) === 0).count()
      assert(empty == 0, s"$s: $empty empty docs would diverge from oracle")
    }
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
