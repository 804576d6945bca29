package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming operators (SURVEY.md §2.6).
  *
  * The reference is pure scheduled batch — its only incremental behavior
  * is the file-manifest anti-join (`sync-drive-to-s3.py:108-111`). The
  * idiomatic Spark counterparts provided here:
  *
  *  - [[fileStream]]: `readStream` over a landing directory — Spark's
  *    checkpointed file index subsumes the manifest ledger (exactly-once
  *    per file, no JSON bookkeeping), `Trigger.AvailableNow` reproduces
  *    the daily-batch cadence;
  *  - [[windowedCounts]]: watermarked tumbling-window aggregation — the
  *    streaming twin of the `events_hourly` batch query;
  *  - [[sessionize]]: `flatMapGroupsWithState` gap-based sessionization —
  *    the streaming twin of the `window_lag_sessionize` batch query.
  *
  * All transforms are written against unbounded Datasets, so the same
  * code runs batch (tests drive them with `MemoryStream`-free batch
  * frames where possible) and streaming.
  */
object EventsStreaming {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String, value: Double)

  final case class SessionSummary(user_id: Long, session_start: java.sql.Timestamp,
                                  session_end: java.sql.Timestamp, n_events: Long,
                                  total_value: Double)

  /** Per-user open-session state for [[sessionize]]. */
  final case class SessionState(start: Long, end: Long, n: Long, total: Double)

  final case class CepView(id: Long, us: Long)
  final case class CepClick(id: Long, us: Long, view: Option[CepView])
  /** Per-user CEP state for [[detectSequences]] — O(1): the latest
    * view, and the latest click together with the view that was
    * current (and in-window) when that click arrived.
    */
  final case class CepState(view: Option[CepView], click: Option[CepClick])
  final case class SeqMatch(user_id: Long, v_id: Long, c_id: Long,
                            p_id: Long, gap1_s: Long, gap2_s: Long)

  /** Streaming CEP sequence detection — the unbounded twin of the
    * `events_sequence_detect` batch query: per user, view → click →
    * purchase with each step within `windowSeconds` of the previous,
    * LAST-match semantics. Because events are processed in event-time
    * order per user (micro-batches sorted; replay in order), the O(1)
    * per-user state (latest view; latest click + its view) reproduces
    * the batch windows EXACTLY: at any purchase, the state's click IS
    * the latest in-window click, and its stored view IS the latest
    * view in-window of that click — the stream≡batch equivalence the
    * suite asserts. State is 5 longs per user regardless of stream
    * length; passing `EventTimeTimeout` (input must carry a watermark)
    * bounds the USER SET too: the state's timeout timestamp is set to
    * the window horizon of the user's newest prefix event, and once the
    * watermark passes it the state is dropped — an expired prefix can
    * never complete a match, so eviction is lossless. The stream≡batch
    * equivalence additionally assumes per-user event-time-ordered
    * arrival across micro-batches (ordered replay); out-of-order
    * arrival across batch boundaries can miss matches the batch query
    * finds.
    */
  def detectSequences(events: Dataset[Event], windowSeconds: Long = 43200,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)(
      implicit spark: SparkSession): Dataset[SeqMatch] = {
    import spark.implicits._
    val win = windowSeconds * 1000000L
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000 + (t.getNanos / 1000) % 1000
    def update(userId: Long, rows: Iterator[Event],
               state: GroupState[CepState]): Iterator[SeqMatch] = {
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var st = state.getOption.getOrElse(CepState(None, None))
      val out = Seq.newBuilder[SeqMatch]
      sorted.foreach { e =>
        val us = micros(e.ts)
        e.event_type match {
          case "view" =>
            st = st.copy(view = Some(CepView(e.event_id, us)))
          case "click" =>
            val v = st.view.filter(v => v.us < us && us - v.us <= win)
            st = st.copy(click = Some(CepClick(e.event_id, us, v)))
          case "purchase" =>
            for (c <- st.click if c.us < us && us - c.us <= win;
                 v <- c.view)
              out += SeqMatch(userId, v.id, c.id, e.event_id,
                (c.us - v.us) / 1000000L, (us - c.us) / 1000000L)
          case _ => ()
        }
      }
      if (state.hasTimedOut || (st.view.isEmpty && st.click.isEmpty)) {
        state.remove()
      } else {
        state.update(st)
        if (timeout == GroupStateTimeout.EventTimeTimeout) {
          // Evict once the watermark passes the newest prefix event's
          // window horizon — past that point no purchase can still
          // chain to this prefix, so dropping the state is lossless.
          // Clamp to watermark+1: admitted-late data older than the
          // window would otherwise compute a horizon BEHIND the
          // watermark, and setTimeoutTimestamp(past) throws — crashing
          // the whole streaming query instead of evicting one group
          // (ADVICE r7). The clamped state dies at the next trigger.
          val lastUs = (st.view.map(_.us).toSeq ++ st.click.map(_.us)).max
          val horizon = lastUs / 1000L + windowSeconds * 1000L
          state.setTimeoutTimestamp(
            math.max(horizon, state.getCurrentWatermarkMs() + 1))
        }
      }
      out.result().iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(update)
  }

  /** S5-as-stream: checkpointed incremental file ingest of a landing
    * directory. `maxFilesPerTrigger` bounds per-batch work; with
    * `Trigger.AvailableNow` a scheduled run drains whatever is new and
    * stops — the reference's daily incremental sync, minus the manifest.
    */
  def fileStream(spark: SparkSession, dir: String, schema: StructType,
                 format: String = "csv", maxFilesPerTrigger: Int = 1000): DataFrame =
    spark.readStream
      .format(format)
      .schema(schema)
      .option("header", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)

  /** Watermarked tumbling-window aggregation. 1-hour windows, late data
    * accepted up to `lateness`. State is bounded: watermark eviction
    * drops windows older than the horizon — required at 100 TB/day.
    */
  def windowedCounts(events: DataFrame, lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      // exact cents: a double sum is association-order-dependent, and
      // micro-batch order differs from batch order — the bigint sum is
      // order-invariant and the single int->double division build-exact
      .agg(count(lit(1)).as("n"),
        (sum(expr("cast(round(value * 100) as bigint)")).cast("double")
          / 100.0).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"),
        col("total_value"))

  /** Streaming exact dedup — the unbounded twin of `Dedup.exact`: at most
    * one row per key emitted, duplicates dropped across micro-batches.
    * `dropDuplicatesWithinWatermark` keys the state on `keyCols` and
    * EVICTS entries once the watermark passes them, so state is bounded
    * by the lateness horizon instead of growing with the stream — the
    * only shape that survives 100 TB/day (a plain `dropDuplicates` on a
    * stream accumulates state forever).
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  tsCol: String = "ts",
                  lateness: String = "30 minutes"): DataFrame =
    events.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Gap-based sessionization with explicit state: sessions close after
    * `gapSeconds` of inactivity per user. Emits one summary row per
    * closed session; ProcessingTimeTimeout flushes idle users.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800,
                 timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)(
      implicit spark: SparkSession): Dataset[SessionSummary] = {
    import spark.implicits._

    def update(userId: Long, rows: Iterator[Event],
               state: GroupState[SessionState]): Iterator[SessionSummary] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var cur = state.getOption
      val closed = Seq.newBuilder[SessionSummary]
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.end <= gapSeconds * 1000 &&
              t >= s.start - gapSeconds * 1000 =>
            // a late event from an earlier micro-batch may have t < s.end
            // (or even slightly < s.start): extend the envelope, never
            // shrink it. The lower bound keeps an arbitrarily-old late
            // event from dragging session_start unboundedly backward.
            cur = Some(s.copy(start = math.min(s.start, t),
              end = math.max(s.end, t), n = s.n + 1, total = s.total + e.value))
          case Some(s) if t < s.start - gapSeconds * 1000 =>
            // out-of-envelope late event: older than the open session's
            // reach — emit as its own single-event session, keep the open
            // session untouched
            closed += SessionSummary(userId, new java.sql.Timestamp(t),
              new java.sql.Timestamp(t), 1, e.value)
          case Some(s) =>
            closed += SessionSummary(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.end), s.n, s.total)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      if (state.hasTimedOut) {
        cur.foreach(s => closed += SessionSummary(userId,
          new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end),
          s.n, s.total))
        state.remove()
      } else {
        cur.foreach { s =>
          state.update(s)
          if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
            state.setTimeoutDuration(gapSeconds * 1000)
        }
      }
      closed.result().iterator
    }

    // NoTimeout by default: open sessions stay in state at drain end —
    // right for a Trigger.AvailableNow daily drain. Pass
    // ProcessingTimeTimeout for continuous streams that must flush idle
    // users (it schedules extra timeout batches, so avoid under
    // AvailableNow).
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(update)
  }

  final case class DocIn(doc_id: Long, text: String)
  final case class DupCand(id_a: Long, id_b: Long, est_jaccard: Double)
  /** Per-bucket LSH state: (doc_id, minhash signature) of bucket members
    * seen so far, newest first, capped.
    */
  final case class BucketState(ids: List[Long], sigs: List[Seq[Long]])

  /** Streaming NEAR-dup candidates — the unbounded twin of
    * `Dedup.minHashCandidates`: each arriving document is checked
    * against every previously-seen document that shares a MinHash band
    * bucket, WITHOUT ever joining the stream against its own history.
    *
    * Shape: signature + band-explode are map-only (the same native
    * `minhash_sig` expression as batch); state lives per (band,
    * band_hash) key and holds the bucket's members — exactly the rows a
    * batch band-join would have grouped. An arrival emits one candidate
    * per bucket member (pair ordered id_a < id_b, signature-estimated
    * Jaccard, same rounding as batch), then joins the bucket.
    *
    * State is bounded per bucket by `maxPerBucket` (FIFO eviction,
    * newest kept): a bucket at 100 TB/day is either small (true near-dup
    * cluster — fine) or a degenerate hot bucket (boilerplate shingles)
    * whose members are mutual near-dups anyway; capping trades recall
    * against those oldest members for hard state bounds. A pair sharing
    * several bands is emitted once per band — downstream `distinct()`
    * (or `dropDuplicatesWithinWatermark` on (id_a, id_b) for continuous
    * streams) collapses them, the batch operator's `distinct()` twin.
    */
  def nearDupStream(docs: Dataset[DocIn], shingleN: Int = 3,
                    numHashes: Int = 16, rowsPerBand: Int = 2,
                    maxPerBucket: Int = 64)(
      implicit spark: SparkSession): Dataset[DupCand] = {
    import spark.implicits._
    val numBands = numHashes / rowsPerBand
    val banded = docs
      .select(col("doc_id"),
        graft.expressions.exprs
          .minhash_sig(col("text"), shingleN, numHashes).as("sig"))
      .select(col("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(numBands - 1)),
          b => xxhash64(slice(col("sig"), b * rowsPerBand + 1,
            lit(rowsPerBand))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
      .as[(Long, Seq[Long], Int, Long)]

    def estJ(a: Seq[Long], b: Seq[Long]): Double = {
      // same exact-grid 4-dp emission as batch Dedup.estJaccard:
      // integer half-up, then one exact division (stream ≡ batch).
      var eq = 0L; var i = 0
      while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
      val n = a.length.toLong
      ((2L * eq * 10000L + n) / (2L * n)).toDouble / 10000.0
    }

    def update(key: (Int, Long), rows: Iterator[(Long, Seq[Long], Int, Long)],
               state: GroupState[BucketState]): Iterator[DupCand] = {
      val st = state.getOption.getOrElse(BucketState(Nil, Nil))
      var ids = st.ids
      var sigs = st.sigs
      val out = Seq.newBuilder[DupCand]
      // deterministic within-batch order (micro-batch rows are unordered)
      rows.toSeq.sortBy(_._1).foreach { case (id, sig, _, _) =>
        if (!ids.contains(id)) {
          ids.iterator.zip(sigs.iterator).foreach { case (pid, psig) =>
            out += DupCand(math.min(id, pid), math.max(id, pid),
              estJ(sig, psig))
          }
          ids = (id :: ids).take(maxPerBucket)
          sigs = (sig :: sigs).take(maxPerBucket)
        }
      }
      state.update(BucketState(ids, sigs))
      out.result().iterator
    }

    banded.groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Watermarked per-window approximate distinct users — the KMV
    * sketch as a STREAMING aggregate. Where `approx_count_distinct`
    * would also work, the engine's own sketch keeps the state contract
    * explicit: ≤k longs per open window (map-side partials included),
    * exact below k distinct, and the same estimator the batch queries
    * oracle-check bit-exactly. Watermark eviction closes windows, so
    * total state is windows-in-horizon × 8k bytes — bounded at any
    * stream volume.
    */
  def windowedDistinctUsers(events: DataFrame,
                            lateness: String = "30 minutes",
                            k: Int = 256): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.expressions.Sketches.kmv_distinct(col("user_id"), k)
        .as("approx_users"))
      .select(col("window.start").as("hour"), col("approx_users"))

  /** Watermarked per-window event-mix drift monitor — the STREAMING
    * twin of the batch `events_drift` query: each closed 1-hour window
    * emits the L1 distance (in ppm) between ITS event-type
    * distribution and a static baseline trained offline (e.g. last
    * month's mix). The alert feed for "did the ingest mix silently
    * change", running against live traffic.
    *
    * Single streaming aggregation (stacked aggs are illegal in a
    * stream): per-type counts come from conditional sums over the
    * KNOWN type enum, the L1 folds in the same projection — exact
    * integer arithmetic end to end, so window results are replayable
    * bit-for-bit. State per open window is |enum| longs, evicted by
    * the watermark.
    */
  def driftMonitorStream(events: DataFrame,
                         baselinePpm: Map[String, Long],
                         lateness: String = "30 minutes"): DataFrame = {
    val types = baselinePpm.keys.toSeq.sorted
    val counted = events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("total"),
        types.map(t => sum(when(col("event_type") === t, 1L)
          .otherwise(0L)).as(s"c_$t")): _*)
    val l1 = types.map { t =>
      abs(expr(s"(`c_$t` * 1000000L) div total") - lit(baselinePpm(t)))
    }.reduce(_ + _)
    counted.select(col("window.start").as("hour"), col("total"),
      l1.cast("long").as("l1_drift_ppm"))
  }

  /** Watermarked per-window count-min frequency sketch — the streaming
    * sketch-store writer: each closed window emits one mergeable BINARY
    * state (`d × w` grid, deterministic bytes), so downstream batch
    * jobs can answer "how often did X occur in any window range" by
    * `cms_merge`-style OR-ing stored states instead of rescanning the
    * stream. State per open window is the fixed `d·w·8`-byte grid —
    * bounded at any stream volume, evicted by the watermark.
    *
    * The same expression the batch `heavy_hitters_cms` query
    * oracle-checks bit-exactly, so the stored bytes are
    * engine-reproducible.
    */
  def windowedFrequencySketch(events: DataFrame,
                              lateness: String = "30 minutes",
                              d: Int = 4, w: Int = 32): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.expressions.Cms.cms_state(col("event_type"), d, w)
        .as("cms"))
      .select(col("window.start").as("hour"), col("cms"))

  /** Watermarked per-window Misra–Gries trending summary: each closed
    * window emits the ≤ k candidate items guaranteed (superset bound,
    * see [[graft.expressions.MisraGriesAgg]]) to contain every item
    * above `n/(k+1)` of that window's stream — the "what's trending
    * this hour" feed. State per open window is k counters, evicted by
    * the watermark; candidate order inside the summary depends on
    * arrival order (inherent to MG), so consumers treat the array as a
    * SET and verify counts downstream exactly like the batch
    * `heavy_hitters_mg` query.
    */
  def windowedTrending(events: DataFrame,
                       lateness: String = "30 minutes",
                       k: Int = 16): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.expressions.Frequent.mg_candidates(col("event_type"), k)
        .as("trending"))
      .select(col("window.start").as("hour"), col("trending"))

  /** Watermarked per-window EXACT user bitmap — the streaming writer
    * for the [[graft.expressions.BitmapStateAgg]] sketch-store: one
    * compressed bitmap per closed window, OR-mergeable downstream into
    * any coarser window (day, rolling 7-day) at zero error — the
    * streaming twin of the batch `events_rolling_dau` pattern. State
    * is proportional to distinct users in the open window (1 bit/user
    * in dense pages), evicted by the watermark.
    */
  def windowedUserBitmap(events: DataFrame,
                         lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.expressions.Bitmaps.bitmap_state(col("user_id"))
        .as("bm"))
      .select(col("window.start").as("hour"), col("bm"))

  /** Watermarked stream-stream interval join: each left event pairs
    * with right-stream events for the same key inside
    * `[l.ts, l.ts + windowSeconds]` — e.g. purchases attributed to the
    * click that preceded them. Right columns come back `r_`-prefixed.
    *
    * Both sides carry a watermark AND the join condition bounds the
    * time delta in both directions, which is what lets Spark EVICT join
    * state: a buffered left row can stop waiting once the right
    * watermark passes `l.ts + windowSeconds`, and vice versa. Without
    * the interval bound the state grows with the stream — the same
    * unbounded-state cliff `dedupStream` documents, and the reason this
    * is the only stream-stream join shape that survives 100 TB/day.
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
                         key: String = "user_id", tsCol: String = "ts",
                         windowSeconds: Long = 600,
                         lateness: String = "30 minutes"): DataFrame =
    intervalJoin(left, right, key, tsCol, windowSeconds, lateness, "inner")

  /** Left-outer variant of [[intervalJoinStream]]: left events with NO
    * right match inside the interval still emit — with null `r_`
    * columns — once the right watermark passes `l.ts + windowSeconds`
    * (only then can "no match" be final under late data). The outer
    * rows therefore trail the watermark by `lateness`; a funnel that
    * wants "purchases WITHOUT a preceding click" gets them exactly one
    * watermark delay late, never provisionally wrong.
    *
    * Same bounded-state shape as the inner join: the two-sided time
    * bound is what lets buffered rows be evicted (and, here, what
    * triggers the null-padded emission on eviction).
    */
  def intervalJoinOuterStream(left: DataFrame, right: DataFrame,
                              key: String = "user_id", tsCol: String = "ts",
                              windowSeconds: Long = 600,
                              lateness: String = "30 minutes"): DataFrame =
    intervalJoin(left, right, key, tsCol, windowSeconds, lateness,
      "leftOuter")

  private def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                           tsCol: String, windowSeconds: Long,
                           lateness: String, joinType: String): DataFrame = {
    val l = left.withWatermark(tsCol, lateness)
    val r = right.toDF(right.columns.map("r_" + _): _*)
      .withWatermark(s"r_$tsCol", lateness)
    l.join(r, expr(
      s"$key = r_$key AND r_$tsCol >= $tsCol AND " +
        s"r_$tsCol <= $tsCol + interval $windowSeconds seconds"), joinType)
  }

  /** Stream-static enrichment join: every micro-batch of the stream is
    * left-joined against a bounded dimension table — the streaming
    * analogue of the reference's left-enrich joins
    * (`nh-etl-provider-transform.py:87-95`), and the most common
    * production stream shape (events + user/facility dimension).
    *
    * Scale shape: the static side is broadcast, so the join is map-only
    * per micro-batch — no shuffle of the stream, no join state to
    * watermark (the stateless join shape; contrast
    * [[intervalJoinStream]]). The dimension is re-resolvable per batch,
    * so a slowly-changing dim picked up between batches is reflected
    * without a restart. Keep it genuinely broadcast-sized; a 100 GB
    * "dimension" belongs in a shuffled join with the stream bucketed on
    * the key instead.
    */
  def enrichStream(events: DataFrame, dim: DataFrame,
                   key: String): DataFrame = {
    val d = dim.toDF(dim.columns.map(c =>
      if (c == key) c else s"d_$c"): _*)
    events.join(broadcast(d), Seq(key), "left")
  }

  /** One throttled-through event (see [[throttleStream]]). */
  final case class ThrottleOut(user_id: Long, event_id: Long,
                               ts: java.sql.Timestamp)

  /** Per-key rate limiting: at most `maxPerKeyWindow` events pass per
    * (key, tumbling window), chosen deterministically — lowest
    * (ts, event_id) first — the ingestion-protection / cost-cap
    * operator in front of an expensive downstream (enrichment API,
    * model scoring). Batch twin: `row_number() over (key, window
    * ORDER BY ts, event_id) <= max` — the equality the spec checks,
    * including quota continuation across micro-batches.
    *
    * Bounded state by construction: one (windowStart → count) entry
    * per key, capped at the `retainWindows` NEWEST windows (an event
    * older than the retained horizon is dropped — the conservative
    * choice for a rate cap: never re-admit what may already be over
    * quota). No per-event state, no watermark needed.
    */
  def throttleStream(events: Dataset[Event], windowSeconds: Long = 3600,
                     maxPerKeyWindow: Int = 3,
                     retainWindows: Int = 8): Dataset[ThrottleOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(windowSeconds > 0 && maxPerKeyWindow > 0 && retainWindows > 0)
    val wMs = windowSeconds * 1000L

    def update(userId: Long, it: Iterator[Event],
               state: GroupState[Map[Long, Int]]): Iterator[ThrottleOut] = {
      val counts = scala.collection.mutable.Map[Long, Int]() ++=
        state.getOption.getOrElse(Map.empty)
      val out = Seq.newBuilder[ThrottleOut]
      val horizon =
        if (counts.isEmpty) Long.MinValue
        else counts.keys.max - (retainWindows - 1) * wMs
      for (e <- it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))) {
        val w = math.floorDiv(e.ts.getTime, wMs) * wMs
        if (w >= horizon) {
          val c = counts.getOrElse(w, 0)
          if (c < maxPerKeyWindow) {
            out += ThrottleOut(userId, e.event_id, e.ts)
            counts(w) = c + 1
          }
        }
      }
      val retained = counts.toSeq.sortBy(-_._1).take(retainWindows).toMap
      state.update(retained)
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Exactly-once versioned lake sink: every micro-batch commits as a
    * new [[graft.ops.VersionedTable]] snapshot version, keyed by batch
    * id — Spark re-delivers the last batch after a crash-restart, and
    * [[graft.ops.VersionedTable.commitBatch]] makes that replay a
    * no-op, so the lake sees each batch exactly once. Readers get
    * snapshot isolation (they pin a version while batches land) and
    * time travel over the stream's history for free.
    *
    * 100 TB shape: the sink writes each batch once, never rewrites
    * history, and the idempotence check reads two tiny metadata files
    * — no output-log scan, no reconciliation join.
    */
  def versionedSink(events: DataFrame, root: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.VersionedTable.commitBatch(batch, root, batchId)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Drive a streaming frame to completion against a memory sink —
    * batch-style execution of a streaming plan (used by tests and the
    * AvailableNow "daily drain" mode).
    */
  def drainToMemory(df: DataFrame, queryName: String, checkpoint: String,
                    mode: OutputMode = OutputMode.Update): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(mode)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(queryName)
  }
}
