package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-provided synthetic star schema (TESTDATA.md).
  * One parquet file per table under the scale-factor directory.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  // Per-(session, dir, table) memo of the LOADED PLAN — metadata
  // caching only (file listing + parquet footer schema), the same
  // thing a catalog-registered table gives a session for free. A bare
  // `spark.read.parquet(path)` re-lists the directory and re-reads the
  // footer on EVERY call (~120 ms measured warm at sf0.1), and the
  // bench surface issues ~550 loads per run — ~60 s/run of pure
  // metadata overhead (optimization guide §6: repeated listings are a
  // known scan-planning tax; formats with manifest metadata exist to
  // kill it). Execution is untouched: every action on the memoized
  // frame still scans the parquet files from disk — no row, column or
  // result is cached (the frame is a logical plan, not data). Keyed on
  // the session object so isolated sessions never share plans; the
  // fixture dirs are immutable for a session's lifetime (driver
  // contract), which is the precondition a catalog table relies on
  // anyway.
  private val memo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    memo.computeIfAbsent((spark, sfDir, name),
      _ => doLoad(spark, sfDir, name))

  /** Fact tables whose scans carry real per-row work. The driver
    * fixtures are single-row-group parquet files, so their scans arrive
    * as ONE Spark partition and every query's scan+map stage ran
    * single-threaded regardless of core count. When (and only when) the
    * scan has fewer partitions than the session's default parallelism,
    * a hash repartition on the leading key spreads it — scale-honest:
    * at a real deployment the scan already has ≥ parallelism splits and
    * no shuffle is added (guide §6: minPartitionNum is the same idea,
    * but it cannot split a single row group). Dimension tables
    * (region/nation/customer/supplier/part) stay as-is: they broadcast,
    * and an extra exchange would only add a stage to the cheapest
    * queries. Hash (not round-robin) keeps the row→partition map
    * deterministic under retries; every declared query is
    * partitioning-independent by contract (the driver re-runs the bench
    * at a lower core count).
    */
  private val SpreadKeys: Map[String, String] = Map(
    "lineitem" -> "l_orderkey", "orders" -> "o_orderkey",
    "events" -> "event_id", "documents" -> "doc_id",
    "embeddings" -> "vec_id")

  private def doLoad(spark: SparkSession, sfDir: String,
                     name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    // reader rejects; sessions set spark.sql.legacy.parquet.nanosAsLong
    // so it arrives as a nanos-since-epoch long — normalize it back to a
    // proper TimestampType (µs, lossless for this data) here.
    val df0 = spark.read.parquet(s"$sfDir/$name.parquet")
    val df = SpreadKeys.get(name) match {
      case Some(key) if df0.schema.fieldNames.contains(key) =>
        val par = math.max(1, spark.sparkContext.defaultParallelism)
        if (df0.rdd.getNumPartitions >= par) df0
        else df0.repartition(par, col(key))
      case _ => df0
    }
    if (name == "events" &&
        df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType)) {
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else if (name == "events" &&
        df.schema.fields.exists(f =>
          f.name == "ts" && f.dataType == TimestampNTZType)) {
      // the fixture has also shipped as TIMESTAMP(µs) without UTC
      // adjustment, which Spark reads as TIMESTAMP_NTZ; sessions pin
      // timeZone=UTC, so the NTZ→LTZ cast reinterprets the wall clock
      // at the same instant. Streaming watermarks (and the Event
      // encoders) require TimestampType, so normalize here once.
      df.withColumn("ts", col("ts").cast(TimestampType))
    } else df
  }
}
