package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.Tables

class EventsStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def eventsBatch = Tables.load(spark, sf("sf0.001"), "events")

  test("windowed agg over a parquet-backed stream matches the batch twin") {
    val dir = Files.createTempDirectory("graft-stream").toString
    // stage the events as a streaming source directory
    val batch = eventsBatch
    batch.write.mode("overwrite").parquet(s"$dir/in")

    val stream = spark.readStream
      .schema(batch.schema)
      .parquet(s"$dir/in")
    val streamed = EventsStreaming.drainToMemory(
      EventsStreaming.windowedCounts(stream),
      "win_agg", s"$dir/ckpt", OutputMode.Update)

    val expected = EventsStreaming.windowedCounts(batch)
    val got = streamed.orderBy("hour", "event_type")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSeq
    val want = expected.orderBy("hour", "event_type")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("windowed drift monitor matches the batch twin, exact ppm") {
    val dir = Files.createTempDirectory("graft-drift").toString
    val batch = eventsBatch
    batch.write.mode("overwrite").parquet(s"$dir/in")
    // "trained" baseline: uniform mix over the fixture's 5-type enum
    val base = Seq("view", "click", "purchase", "signup", "error")
      .map(_ -> 200000L).toMap
    val stream = spark.readStream.schema(batch.schema)
      .parquet(s"$dir/in")
    val streamed = EventsStreaming.drainToMemory(
      EventsStreaming.driftMonitorStream(stream, base),
      "drift_mon", s"$dir/ckpt", OutputMode.Update)
    val got = streamed.orderBy("hour")
      .as[(java.sql.Timestamp, Long, Long)].collect().toSeq
    val want = EventsStreaming.driftMonitorStream(batch, base)
      .orderBy("hour")
      .as[(java.sql.Timestamp, Long, Long)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // drift of a 5-type mix is bounded by 2e6 ppm and, being integer
    // math over real counts, strictly positive on the skewed fixture
    assert(got.forall { case (_, _, d) => d >= 0 && d <= 2000000 })
  }

  test("stream-static enrichment join matches the batch twin, stateless") {
    val dir = Files.createTempDirectory("graft-enrich").toString
    val batch = eventsBatch
    batch.write.mode("overwrite").parquet(s"$dir/in")
    // bounded dimension: a segment for EVEN user ids only, so the left
    // join provably has both matched rows and null-segment survivors
    val dim = batch.select(col("user_id")).distinct()
      .filter(pmod(col("user_id"), lit(2)) === 0)
      .select(col("user_id"),
        concat(lit("seg"), pmod(col("user_id"), lit(3))).as("segment"))

    val stream = spark.readStream.schema(batch.schema).parquet(s"$dir/in")
    val streamed = EventsStreaming.drainToMemory(
      EventsStreaming.enrichStream(stream, dim, "user_id")
        .select("user_id", "event_type", "d_segment"),
      "enrich", s"$dir/ckpt", OutputMode.Append)

    def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String)] =
      df.as[(Long, String, String)].collect().toSeq
        .sortBy(t => (t._1, t._2, String.valueOf(t._3)))
    val want = canon(EventsStreaming.enrichStream(batch, dim, "user_id")
      .select("user_id", "event_type", "d_segment"))
    assert(canon(streamed) == want)
    assert(want.nonEmpty)
    assert(want.exists(_._3 == null), "unmatched users must survive the left join")
    assert(want.exists(_._3 != null))
  }

  test("file stream drains a CSV landing dir incrementally (AvailableNow)") {
    val dir = Files.createTempDirectory("graft-fs").toString
    val schema = StructType(Seq(StructField("id", StringType),
      StructField("v", StringType)))
    Files.writeString(Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/land")).resolve("a.csv"), "id,v\n1,x\n2,y\n")

    // file sink supports checkpoint recovery (memory sink does not), so
    // incremental re-drains resume from the same checkpoint
    def drain(): Long = {
      val q = EventsStreaming.fileStream(spark, s"$dir/land", schema)
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(s"$dir/out").count()
    }
    assert(drain() == 2)
    // new file lands; a second drain from the SAME checkpoint adds only it
    Files.writeString(java.nio.file.Paths.get(s"$dir/land/b.csv"),
      "id,v\n3,z\n")
    assert(drain() == 3, "checkpoint should skip already-read files")
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    val dir = Files.createTempDirectory("graft-dedup-stream").toString
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val rows = Seq(
      EventsStreaming.Event(1, ts(0), 1L, "click", 1.0),
      EventsStreaming.Event(1, ts(1), 1L, "click", 1.0), // dup id
      EventsStreaming.Event(2, ts(2), 1L, "click", 2.0),
      EventsStreaming.Event(2, ts(3), 2L, "view", 9.0),  // dup id, later
      EventsStreaming.Event(3, ts(4), 2L, "click", 3.0))
    rows.toDS().write.mode("overwrite").parquet(s"$dir/in")

    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[EventsStreaming.Event]].schema)
      .parquet(s"$dir/in")
    val deduped = EventsStreaming.drainToMemory(
      EventsStreaming.dedupStream(stream, Seq("event_id")),
      "dedup_stream", s"$dir/ckpt", OutputMode.Append)

    val ids = deduped.select("event_id").as[Long].collect().toSeq.sorted
    assert(ids == Seq(1L, 2L, 3L), s"got $ids")
  }

  test("streaming near-dup candidates match batch banding across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-neardup").toString
    val docsDf = Tables.load(spark, sf("sf0.001"), "documents")
    val docs = docsDf.select($"doc_id", $"text")
      .as[(Long, String)].collect().toSeq
      .map { case (i, t) => EventsStreaming.DocIn(i, t) }
    val (b1, b2) = docs.splitAt(docs.length / 2)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val ms = MemoryStream[EventsStreaming.DocIn]
    val q = EventsStreaming
      .nearDupStream(ms.toDS(), maxPerBucket = Int.MaxValue)
      .writeStream.format("memory").queryName("near_dup")
      .outputMode(OutputMode.Append.toString.toLowerCase)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    ms.addData(b1)
    q.processAllAvailable()
    ms.addData(b2) // cross-batch pairs must surface via state
    q.processAllAvailable()
    q.stop()

    val got = spark.table("near_dup").distinct()
      .as[(Long, Long, Double)].collect().toSet
    val want = graft.functions.Dedup
      .minHashCandidates(docsDf, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want, s"stream=${got.size} batch=${want.size}")
    assert(got.nonEmpty)
    // cross-batch: at least one pair spans the two micro-batches
    val firstIds = b1.map(_.doc_id).toSet
    assert(got.exists { case (a, b, _) =>
      firstIds.contains(a) != firstIds.contains(b) })
  }

  test("streaming CEP sequence detection matches the batch query") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-cep").toString
    val evs = eventsBatch
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventsStreaming.Event].collect().toSeq
      .sortBy(e => (e.ts.getTime, e.event_id))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val want = graft.SparkEntry.queries("events_sequence_detect")(
        spark, sf("sf0.001"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(want.nonEmpty, "fixture must contain at least one sequence")
    // replay in event-time order, split right BEFORE some match's
    // purchase: that match's view/click prefix arrives in batch 1 and
    // must survive in state to complete in batch 2
    val somePid = want.head._4
    val splitAt = evs.indexWhere(_.event_id == somePid)
    val (b1, b2) = evs.splitAt(splitAt)
    val ms = MemoryStream[EventsStreaming.Event]
    val q = EventsStreaming.detectSequences(ms.toDS())
      .writeStream.format("memory").queryName("cep_seq")
      .outputMode(OutputMode.Append.toString.toLowerCase)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    ms.addData(b1)
    q.processAllAvailable()
    ms.addData(b2)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cep_seq")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == want, s"stream=${got.size} batch=${want.size}")
    assert(got.nonEmpty)
    // cross-batch: the targeted match completed after the split with
    // its prefix carried in state from batch 1
    val b1Ids = b1.map(_.event_id).toSet
    assert(got.exists { case (_, vId, cId, pId, _, _) =>
      (b1Ids.contains(vId) || b1Ids.contains(cId)) &&
        !b1Ids.contains(pId) },
      "expected a sequence whose prefix arrived in batch 1")
  }

  test("CEP EventTimeTimeout evicts expired prefixes and bounds state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val dir = Files.createTempDirectory("graft-cep-ttl").toString
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val ms = MemoryStream[EventsStreaming.Event]
    // 60 s window; watermarked input so event-time timeouts fire
    val q = EventsStreaming.detectSequences(
        ms.toDS().withWatermark("ts", "1 second"),
        windowSeconds = 60,
        timeout = GroupStateTimeout.EventTimeTimeout)
      .writeStream.format("memory").queryName("cep_ttl")
      .outputMode(OutputMode.Append.toString.toLowerCase)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    // batch 1: two users open prefixes (view only)
    ms.addData(Seq(
      EventsStreaming.Event(1, ts(0), 1L, "view", 1.0),
      EventsStreaming.Event(2, ts(0), 2L, "view", 1.0)))
    q.processAllAvailable()
    val afterB1 = q.lastProgress.stateOperators.apply(0).numRowsTotal
    assert(afterB1 == 2, s"expected 2 open prefixes, got $afterB1")
    // batch 2: a third user far in the future — the advancing watermark
    // passes users 1/2's 60 s horizon, so their state must be evicted
    ms.addData(Seq(
      EventsStreaming.Event(3, ts(10000), 3L, "view", 1.0)))
    q.processAllAvailable()
    // batch 3: user 3 completes in-window; users 1/2 stay gone
    ms.addData(Seq(
      EventsStreaming.Event(4, ts(10010), 3L, "click", 1.0),
      EventsStreaming.Event(5, ts(10020), 3L, "purchase", 9.0)))
    q.processAllAvailable()
    val afterB3 = q.lastProgress.stateOperators.apply(0).numRowsTotal
    q.stop()
    val got = spark.table("cep_ttl")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(3L), s"only user 3 should match: $got")
    assert(afterB3 == 1,
      s"expired prefixes must be evicted (want 1 state row, got $afterB3)")
  }

  test("stateful sessionization emits gap-separated sessions") {
    val dir = Files.createTempDirectory("graft-sess").toString
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val rows = Seq(
      EventsStreaming.Event(1, ts(0), 1L, "click", 1.0),
      EventsStreaming.Event(2, ts(5), 1L, "click", 2.0),
      EventsStreaming.Event(3, ts(90), 1L, "click", 4.0), // new session
      EventsStreaming.Event(4, ts(0), 2L, "click", 8.0))
    rows.toDS().write.mode("overwrite").parquet(s"$dir/in")

    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[EventsStreaming.Event]].schema)
      .parquet(s"$dir/in")
      .as[EventsStreaming.Event]
    implicit val s = spark
    val sessions = EventsStreaming.drainToMemory(
      EventsStreaming.sessionize(stream, gapSeconds = 1800).toDF(),
      "sessions", s"$dir/ckpt", OutputMode.Append)

    // user 1's FIRST session closes (a later event opened a new one);
    // open sessions (u1 second, u2 only) remain in state
    val got = sessions.select("user_id", "n_events", "total_value")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 3.0)))
  }

  test("streaming windowed KMV distinct matches the batch sketch") {
    val dir = Files.createTempDirectory("graft-kmv-stream").toString
    val batch = eventsBatch
    batch.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(batch.schema).parquet(s"$dir/in")
    val streamed = EventsStreaming.drainToMemory(
      EventsStreaming.windowedDistinctUsers(stream),
      "kmv_win", s"$dir/ckpt", OutputMode.Update)
    val got = streamed.orderBy("hour")
      .as[(java.sql.Timestamp, Long)].collect().toSeq
    val want = EventsStreaming.windowedDistinctUsers(batch).orderBy("hour")
      .as[(java.sql.Timestamp, Long)].collect().toSeq
    assert(got == want && got.nonEmpty,
      "stream sketch must equal the batch sketch (same KMV state)")
  }

  test("streaming windowed CMS sketch bytes equal the batch sketch") {
    val dir = Files.createTempDirectory("graft-cms-stream").toString
    val batch = eventsBatch
    batch.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(batch.schema).parquet(s"$dir/in")
    val streamed = EventsStreaming.drainToMemory(
      EventsStreaming.windowedFrequencySketch(stream),
      "cms_win", s"$dir/ckpt", OutputMode.Update)
    val got = streamed.orderBy("hour")
      .as[(java.sql.Timestamp, Array[Byte])].collect().toSeq
    val want = EventsStreaming.windowedFrequencySketch(batch)
      .orderBy("hour")
      .as[(java.sql.Timestamp, Array[Byte])].collect().toSeq
    assert(got.map(_._1) == want.map(_._1) && got.nonEmpty)
    got.zip(want).foreach { case ((h, a), (_, b)) =>
      assert(java.util.Arrays.equals(a, b),
        s"window $h: stream and batch sketch bytes differ")
    }
  }

  test("streaming windowed MG trending is a superset of exact heavy hitters") {
    val dir = Files.createTempDirectory("graft-mg-stream").toString
    val batch = eventsBatch
    batch.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(batch.schema).parquet(s"$dir/in")
    val k = 4
    val streamed = EventsStreaming.drainToMemory(
      EventsStreaming.windowedTrending(stream, k = k),
      "mg_win", s"$dir/ckpt", OutputMode.Update)
    val got = streamed
      .as[(java.sql.Timestamp, Seq[String])].collect()
      .map { case (h, c) => h -> c.toSet }.toMap
    assert(got.nonEmpty)
    // exact per-window type counts; every type above n/(k+1) must be
    // in that window's candidate set, and candidates stay bounded at k
    val exact = batch
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .as[(java.sql.Timestamp, String, Long)].collect()
      .groupBy(_._1)
    exact.foreach { case (hour, rows) =>
      val n = rows.map(_._3).sum
      val mustHave = rows.filter(_._3 * (k + 1) > n).map(_._2).toSet
      val cands = got.getOrElse(hour, Set.empty)
      assert(cands.size <= k)
      assert(mustHave.subsetOf(cands),
        s"window $hour missing ${mustHave -- cands}")
    }
  }

  test("streaming windowed user bitmaps OR-merge to the exact batch total") {
    val dir = Files.createTempDirectory("graft-bm-stream").toString
    val batch = eventsBatch
    batch.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(batch.schema).parquet(s"$dir/in")
    val streamed = EventsStreaming.drainToMemory(
      EventsStreaming.windowedUserBitmap(stream),
      "bm_win", s"$dir/ckpt", OutputMode.Update)
    // the stored per-window states answer the coarser question exactly:
    // OR-merging every window's bitmap = global distinct users
    val merged = streamed
      .agg(graft.expressions.Bitmaps.bitmap_merge_count(col("bm")))
      .as[Long].head()
    val exact = batch.select(countDistinct(col("user_id")))
      .as[Long].head()
    assert(merged == exact && exact > 0,
      s"merged window bitmaps ($merged) must equal exact distinct ($exact)")
  }

  test("stream-stream interval join matches the batch interval join") {
    val dir = Files.createTempDirectory("graft-ssjoin").toString
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val clicks = Seq(
      EventsStreaming.Event(1, ts(0), 1L, "click", 0.0),
      EventsStreaming.Event(2, ts(20), 1L, "click", 0.0),
      EventsStreaming.Event(3, ts(0), 2L, "click", 0.0))
    val buys = Seq(
      EventsStreaming.Event(10, ts(5), 1L, "purchase", 9.0),  // joins click 1
      EventsStreaming.Event(11, ts(25), 1L, "purchase", 5.0), // joins click 2
      EventsStreaming.Event(12, ts(55), 2L, "purchase", 7.0)) // outside window
    clicks.toDS().write.mode("overwrite").parquet(s"$dir/a")
    buys.toDS().write.mode("overwrite").parquet(s"$dir/b")

    val schema =
      implicitly[org.apache.spark.sql.Encoder[EventsStreaming.Event]].schema
    val sa = spark.readStream.schema(schema).parquet(s"$dir/a")
    val sb = spark.readStream.schema(schema).parquet(s"$dir/b")
    val joined = EventsStreaming.drainToMemory(
      EventsStreaming.intervalJoinStream(sa, sb, windowSeconds = 600)
        .select(col("event_id"), col("r_event_id"), col("r_value")),
      "ssjoin", s"$dir/ckpt", OutputMode.Append)

    val got = joined.as[(Long, Long, Double)].collect().toSet
    // batch twin over the same frames
    val want = EventsStreaming
      .intervalJoinStream(clicks.toDF(), buys.toDF(), windowSeconds = 600)
      .select(col("event_id"), col("r_event_id"), col("r_value"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want)
    assert(got == Set((1L, 10L, 9.0), (2L, 11L, 5.0)),
      s"attribution pairs wrong: $got")
  }

  test("throttle passes the first N per (key, window), quota survives batches") {
    val dir = Files.createTempDirectory("graft-throttle").toString
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    // hour windows, max 3 per user per window
    val batch1 = Seq(
      EventsStreaming.Event(1, ts(1), 1L, "view", 0.0),
      EventsStreaming.Event(2, ts(2), 1L, "view", 0.0),
      EventsStreaming.Event(3, ts(3), 1L, "view", 0.0),
      EventsStreaming.Event(4, ts(4), 1L, "view", 0.0), // over quota
      EventsStreaming.Event(10, ts(5), 2L, "view", 0.0))
    val batch2 = Seq(
      EventsStreaming.Event(5, ts(6), 1L, "view", 0.0),  // same window:
      EventsStreaming.Event(6, ts(70), 1L, "view", 0.0), // still over
      EventsStreaming.Event(11, ts(71), 2L, "view", 0.0))
    batch1.toDS().write.parquet(s"$dir/land/b0")

    val schema =
      implicitly[org.apache.spark.sql.Encoder[EventsStreaming.Event]].schema
    def drain(): Set[Long] = {
      val src = spark.readStream.schema(schema).parquet(s"$dir/land/*")
        .as[EventsStreaming.Event]
      val q = EventsStreaming.throttleStream(src, windowSeconds = 3600,
          maxPerKeyWindow = 3)
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode(OutputMode.Append)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(s"$dir/out").select("event_id")
        .as[Long].collect().toSet
    }

    assert(drain() == Set(1L, 2L, 3L, 10L)) // 4 dropped: 4th in window
    batch2.toDS().write.parquet(s"$dir/land/b1")
    val all = drain()
    // 5 hits the carried quota; 6 and 11 open a new hour window
    assert(all == Set(1L, 2L, 3L, 10L, 6L, 11L), s"got $all")

    // batch twin: row_number over (user, window) in (ts, event_id)
    // order, <= 3
    import org.apache.spark.sql.expressions.Window
    val twin = (batch1 ++ batch2).toDS()
      .withColumn("w", (col("ts").cast("long") / 3600).cast("long"))
      .withColumn("rn", row_number().over(Window
        .partitionBy("user_id", "w").orderBy("ts", "event_id")))
      .filter(col("rn") <= 3).select("event_id").as[Long].collect().toSet
    assert(all == twin)
  }

  test("left-outer interval join emits null-padded rows after watermark") {
    val dir = Files.createTempDirectory("graft-ssojoin").toString
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    // user 1's click converts; user 2's click never does
    Seq(EventsStreaming.Event(1, ts(0), 1L, "click", 0.0),
        EventsStreaming.Event(2, ts(0), 2L, "click", 0.0))
      .toDS().write.parquet(s"$dir/a/b0")
    Seq(EventsStreaming.Event(10, ts(5), 1L, "purchase", 9.0))
      .toDS().write.parquet(s"$dir/b/b0")

    val schema =
      implicitly[org.apache.spark.sql.Encoder[EventsStreaming.Event]].schema
    // a parquet sink (unlike the memory sink) resumes from its
    // checkpoint, so repeated drains accumulate into one output dir
    def drain(): Set[(Long, Option[Long])] = {
      val sa = spark.readStream.schema(schema).parquet(s"$dir/a/*")
      val sb = spark.readStream.schema(schema).parquet(s"$dir/b/*")
      val q = EventsStreaming.intervalJoinOuterStream(sa, sb,
          windowSeconds = 600)
        .select(col("event_id"), col("r_event_id"))
        .writeStream
        .format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode(OutputMode.Append)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(s"$dir/out").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSet
    }

    val emitted = scala.collection.mutable.Set[(Long, Option[Long])]()
    emitted ++= drain()
    // the matched pair may emit immediately; the outer row CANNOT —
    // "no match" is only final once the watermark passes the interval
    assert(!emitted.contains((2L, None)),
      s"outer row emitted before the watermark allowed it: $emitted")
    // push both watermarks past click-time + window + lateness with
    // far-future sentinels; outer emission happens on state eviction,
    // which uses the watermark committed by the PREVIOUS batch — so
    // up to two more drains may be needed
    var round = 0
    while (!emitted.contains((2L, None)) && round < 3) {
      round += 1
      val far = 300 + 300 * round
      Seq(EventsStreaming.Event(90L + round, ts(far), 9L, "click", 0.0))
        .toDS().write.parquet(s"$dir/a/s$round")
      Seq(EventsStreaming.Event(190L + round, ts(far), 9L, "purchase", 0.0))
        .toDS().write.parquet(s"$dir/b/s$round")
      emitted ++= drain()
    }
    assert(emitted.contains((1L, Some(10L))),
      s"matched pair missing: $emitted")
    assert(emitted.contains((2L, None)),
      s"unmatched click never emitted null-padded: $emitted")
  }
}
