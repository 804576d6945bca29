package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: documents are concatenated
  * in id order and chunked into fixed token-budget context windows
  * ("packs") — each document labeled with the pack its first token
  * lands in and its offset inside that pack.
  *
  * Scale shape: packing is SHARD-LOCAL. A single global concatenation
  * order would force one total-order window (one task at 100 TB);
  * instead ids are bucketed into shards of `shardSize` consecutive ids
  * and each shard packs independently — one hash-shuffle on shard, a
  * per-shard window cumsum, embarrassingly parallel. Shard-local packing
  * is standard practice: pretraining mixes shard the corpus anyway, and
  * window boundaries only differ from a global pack at shard edges.
  *
  * Deterministic: pure integer arithmetic over (id, token count) — same
  * packs on every engine, every run, any partitioning.
  */
object Packing {

  /** @param tokenCount column with the document's token count
    * @param budgetTokens context-window size in tokens
    * @param shardSize    consecutive-id width of an independent shard
    * @return input columns + (shard, pack_in_shard, pack_offset)
    */
  def packForTraining(docs: DataFrame, idCol: String, tokenCount: Column,
                      budgetTokens: Long, shardSize: Long): DataFrame = {
    val withN = docs.withColumn("n_tokens", tokenCount.cast("long"))
      .withColumn("shard", floor(col(idCol) / shardSize).cast("long"))
    val w = Window.partitionBy("shard").orderBy(col(idCol))
    val start = sum(col("n_tokens")).over(w) - col("n_tokens")
    withN
      .withColumn("pack_in_shard",
        floor(start / budgetTokens).cast("long"))
      .withColumn("pack_offset",
        (start - col("pack_in_shard") * budgetTokens).cast("long"))
  }

  /** Length-bucketed inference batching: group documents of similar
    * token count (bucket = n_tokens / `bucketWidth`) and fill
    * token-budget batches within each bucket — similar-length batching
    * is what keeps padding waste low when serving variable-length
    * sequences.
    *
    * Batching is budget-quantized like [[packForTraining]]: batch
    * boundaries fall at cumulative-token multiples of `budgetTokens`
    * within a (bucket, shard), so a batch may exceed the budget by at
    * most its last document — deterministic pure-integer policy, no
    * first-fit state.
    *
    * Scale shape: batches are (bucket, SHARD)-local — a per-bucket
    * global cumsum would put each length bucket in one task; sharding
    * by id range keeps the window partitions bounded at `shardSize`
    * ids while staying deterministic. One hash shuffle, per-partition
    * window cumsum, embarrassingly parallel.
    */
  def batchByLength(docs: DataFrame, idCol: String, tokenCount: Column,
                    bucketWidth: Int, budgetTokens: Long,
                    shardSize: Long): DataFrame = {
    val withN = docs.withColumn("n_tokens", tokenCount.cast("long"))
      .withColumn("bucket", floor(col("n_tokens") / bucketWidth)
        .cast("long"))
      .withColumn("shard", floor(col(idCol) / shardSize).cast("long"))
    val w = Window.partitionBy("bucket", "shard").orderBy(col(idCol))
    val start = sum(col("n_tokens")).over(w) - col("n_tokens")
    withN.withColumn("batch_in_shard",
      floor(start / budgetTokens).cast("long"))
  }

  /** Output-shard manifest for a training export: every document is
    * assigned a shard by `xxhash64(id) mod nShards` (stable under
    * corpus growth and id distribution — new docs never move old ones
    * between shards), and the manifest row carries the per-shard
    * volume statistics a dataloader needs to plan epochs (doc count,
    * total characters, id range).
    *
    * Scale shape: map-only hash + length projection, then ONE
    * aggregation to `nShards` rows with map-side combine — the
    * manifest never materializes document text, and writing the actual
    * shards is `df.write.partitionBy("shard")` with this same hash
    * column, so manifest and data provably agree.
    */
  def shardManifest(docs: DataFrame, idCol: String, textCol: String,
                    nShards: Int): DataFrame =
    docs.select(
        pmod(xxhash64(col(idCol)), lit(nShards.toLong)).cast("int")
          .as("shard"),
        col(idCol).as("__id"),
        length(col(textCol)).cast("long").as("__chars"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("__chars").as("total_chars"),
        min("__id").as("min_id"),
        max("__id").as("max_id"))
}
