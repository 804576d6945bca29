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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    // reader rejects; sessions set spark.sql.legacy.parquet.nanosAsLong
    // so it arrives as a nanos-since-epoch long — normalize it back to a
    // proper TimestampType (µs, lossless for this data) here.
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
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
