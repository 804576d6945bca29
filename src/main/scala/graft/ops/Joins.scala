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
}
