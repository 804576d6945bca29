package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.3 J1-J4).
  *
  * Reference: the two left-enrichment joins at
  * `script/nh-etl-provider-transform.py:88,108`, the manifest anti-join at
  * `script/sync-drive-to-s3.py:47-48,108-111`, and allowlist routing at
  * `script/move_sources_files.py:19-24`.
  *
  * Scale notes: side tables (survey_summary, penalties_ext) are dimension-
  * sized, so [[leftEnrich]] broadcasts them by default — no shuffle of the
  * 100 TB fact side. The manifest is a ledger of file ids (tiny) — the
  * anti-join broadcasts it too.
  */
object Joins {

  /** J1/J2: left outer equi-join enriching a fact frame with a small side
    * table on a shared key. `broadcastRight=true` pins a broadcast-hash
    * join (the reference's side tables are ≪ the provider table).
    */
  def leftEnrich(fact: DataFrame, side: DataFrame, key: String,
                 broadcastRight: Boolean = true): DataFrame = {
    val rhs = if (broadcastRight) broadcast(side) else side
    fact.join(rhs, Seq(key), "left")
  }

  /** J3: manifest anti-join — keep only rows whose key is NOT in the
    * ledger (`sync-drive-to-s3.py:108-111` file-level dedup, modeled
    * relationally).
    */
  def antiJoin(incoming: DataFrame, ledger: DataFrame,
               key: String): DataFrame =
    incoming.join(broadcast(ledger.select(key).distinct()), Seq(key),
      "left_anti")

  /** J4: allowlist routing — split a frame into (allowed, rejected) by
    * set membership (`move_sources_files.py:19-24`).
    */
  def route(df: DataFrame, keyCol: String,
            allowlist: Seq[String]): (DataFrame, DataFrame) = {
    val inSet: Column = col(keyCol).isin(allowlist: _*)
    (df.filter(inSet), df.filter(!inSet))
  }

  /** Semi-join form of the allowlist when the allowlist is itself a
    * (potentially large) table: no row duplication, no right-side columns.
    */
  def semiJoin(df: DataFrame, allowed: DataFrame, key: String): DataFrame =
    df.join(allowed.select(key).distinct(), Seq(key), "left_semi")

  /** Bloom-pruned semi-join: exact `fact ⋉ dim` where a selective dim
    * predicate prunes the FACT side at its scan, before any exchange.
    *
    * Shape: (1) aggregate the dim keys into one serialized bloom filter
    * (`numBits/8` bytes — the only thing that crosses to the driver);
    * (2) filter the fact side with `bloom_contains` (map-only, inside
    * whole-stage codegen at the scan); (3) exact left-semi join to strip
    * the false positives. No false negatives ⇒ no lost rows ⇒ the result
    * equals the plain semi-join bit-for-bit, which is what the oracle
    * checks.
    *
    * At 100 TB this is the difference between shuffling the whole fact
    * table into the join and shuffling only `sel + fp` of it (dim
    * selectivity + bloom false-positive rate). Spark's runtime bloom
    * join (`spark.sql.optimizer.runtime.bloomFilter.enabled`) does this
    * adaptively; the explicit form lets the caller size the filter,
    * persist `filterBytes` across queries, and apply it to sources the
    * optimizer won't touch. The driver-side `head()` moves one bounded
    * binary, not data rows.
    */
  def bloomPrunedSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                          dimKey: String, numBits: Int = 1 << 20,
                          numHashes: Int = 5): DataFrame = {
    import graft.expressions.Blooms
    val keys = dim.select(col(dimKey)).distinct()
    val filterBytes = keys
      .agg(Blooms.bloom_agg(col(dimKey), numBits, numHashes).as("bf"))
      .head().getAs[Array[Byte]](0)
    fact
      .filter(Blooms.bloom_contains(lit(filterBytes), col(factKey)))
      .join(keys.withColumnRenamed(dimKey, factKey), Seq(factKey),
        "left_semi")
  }
}
