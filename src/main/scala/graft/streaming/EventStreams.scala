package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §1.3 stretch goal; the batch
  * analogs are q18/q19 in the query registry).
  *
  * The same event-time semantics run in two modes:
  *  - [[tumblingStream]]: `readStream` → watermark → windowed agg. At scale
  *    this is the standard micro-batch pipeline: state store keyed by
  *    (user_id, window), watermark bounds state size, shuffle only on the
  *    grouping key.
  *  - [[sessionCountsStream]]: `flatMapGroupsWithState` with per-user session
  *    state and a processing-time-free, event-time gap rule identical to the
  *    batch lag+cumsum query (q19).
  */
object EventStreams {

  /** On-disk events schema, inferred from the batch reader so the file
    * stream tolerates both physical `ts` layouts (raw ns Long under
    * nanosAsLong, or a plain µs timestamp — see [[graft.Tables.tsNs]]).
    * readStream requires an explicit schema; inferring it from one batch
    * footer read is the standard recipe and costs one metadata round-trip
    * at query start, not per micro-batch. */
  def eventsSchema(spark: SparkSession, dir: String): StructType = {
    ensureNanosConf(spark)
    spark.read.parquet(s"$dir/events.parquet").schema
  }

  /** SESSION-WIDE side effect, on purpose: the TIMESTAMP(NANOS) physical
    * layout is unreadable without the legacy flag, so the events readers
    * flip it before touching the file. Flipping it affects every later
    * parquet read of a NANOS file in the session (they return raw Longs
    * instead of failing), which is exactly what `Tables.tsNs` — the ONLY
    * sanctioned way to read `ts` — is built to normalize; set it at
    * session construction (Verify/Bench do) to make the dependency
    * explicit. Kept in one place so the two reader entry points can't
    * drift. */
  private def ensureNanosConf(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** `(ts_ns, user_id, value)` projection off the raw events frame,
    * normalizing either `ts` layout to epoch-ns Long. */
  private def tsNsProjection(raw: DataFrame): DataFrame =
    raw.select(graft.Tables.tsNs(raw.schema).as("ts_ns"), col("user_id"), col("value"))

  /** ns → µs event time + the standard 2 h lateness watermark — the shared
    * prologue of every windowed agg here; ONE definition so the watermark
    * delay cannot silently diverge between operators. */
  private def withEventTime(df: DataFrame): DataFrame =
    // floor division like Tables.events: `div` truncates toward zero,
    // rounding pre-1970 nanos up a microsecond
    df.withColumn("ts_us", timestamp_micros(
        expr("(ts_ns div 1000) - (CASE WHEN ts_ns % 1000 < 0 THEN 1 ELSE 0 END)")))
      .withWatermark("ts_us", "2 hours")

  /** Deterministic money sum (integer-cents, order-independent under
    * partial aggregation) — shared by the three windowed aggs. */
  private def sumCents: Column =
    round(sum(round(col("value") * 100, 0).cast("long")).cast("double") / 100.0, 4)
      .as("sum_value")

  /** The events file stream: explicit schema (readStream requires one) +
    * single-file glob — shared by the three *Stream entry points. */
  private def eventsFileStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventsSchema(spark, dir))
      .option("pathGlobFilter", "events.parquet") // single-file source: stream the parent dir
      .parquet(dir)

  final case class Ev(event_id: Long, ts_ns: Long, user_id: Long, value: Double)
  final case class SessState(lastTs: Long, sessions: Long, events: Long)
  final case class SessOut(user_id: Long, n_sessions: Long, n_events: Long)

  private val GapNs = 1800000000000L // 30 min

  /** The watermarked tumbling agg itself, over any frame carrying
    * (ts_ns, user_id, value) — the file stream and the late-data test
    * harness (MemoryStream) share this exact plan; on a BATCH frame the
    * watermark is Spark's documented no-op, so the same function is its own
    * batch oracle. */
  def tumblingAgg(events: DataFrame): DataFrame =
    withEventTime(events)
      .groupBy(col("user_id"), window(col("ts_us"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        sumCents)
      .select(col("user_id"), col("window.start").as("win_start"), col("n_events"), col("sum_value"))

  /** Streaming tumbling 1-hour window counts per user. */
  def tumblingStream(spark: SparkSession, dir: String): DataFrame =
    tumblingAgg(tsNsProjection(
      eventsFileStream(spark, dir)))

  /** The sliding (2 h window / 1 h slide) twin of [[tumblingAgg]] and batch
    * t95: each event lands in exactly 2 overlapping windows (constant
    * expansion in a Generate node before the agg — partials still apply),
    * state store keyed by window start, watermark bounds it to the trailing
    * 2 h + 2 h of open windows. Same function is its own batch oracle
    * (watermark is a no-op on a batch frame). */
  def slidingAgg(events: DataFrame): DataFrame =
    withEventTime(events)
      .groupBy(window(col("ts_us"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        sumCents)
      .select(col("window.start").as("win_start"), col("n_events"), col("sum_value"))

  /** Exactly-once over a NON-transactional sink via idempotent foreachBatch:
    * the write is keyed by batchId (one overwritten directory per batch), so
    * foreachBatch's documented at-least-once re-invocation after a crash
    * lands on the SAME path and replaces rather than duplicates. This is the
    * standard recipe for stores with no transaction log (plain object
    * stores, JDBC upserts keyed by (batchId, pk), …); the file sink's own
    * log (proven elsewhere in StreamingSpec) is the transactional
    * alternative. `onBatch` exists so tests can observe replays.
    */
  def startIdempotentSink(
      src: DataFrame, path: String, ckpt: String,
      onBatch: Long => Unit = _ => ()): StreamingQuery =
    src.writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        onBatch(batchId)
        df.write.mode("overwrite").parquet(s"$path/batch=$batchId")
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

  /** Native session-window aggregation — the same operator as batch t103,
    * shared plan for both modes (the tumblingAgg pattern): dynamic-gap
    * sessions merged by the session aggregation, emitting the session
    * bounds. On a stream the watermark both bounds the per-user open
    * sessions kept in the state store AND finalizes a session once the
    * watermark passes its end — the streaming lifecycle q19's lag+cumsum
    * shape cannot express. */
  def sessionWindowAgg(events: DataFrame): DataFrame =
    withEventTime(events)
      .groupBy(col("user_id"), session_window(col("ts_us"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sumCents)
      .select(col("user_id"), col("sw.start").as("sess_start"),
        col("sw.end").as("sess_end"), col("n_events"), col("sum_value"))

  /** Streaming native session windows over the events file stream. */
  def sessionStream(spark: SparkSession, dir: String): DataFrame =
    sessionWindowAgg(tsNsProjection(
      eventsFileStream(spark, dir)))

  /** Streaming sliding-window counts over the events file stream. */
  def slidingStream(spark: SparkSession, dir: String): DataFrame =
    slidingAgg(tsNsProjection(
      eventsFileStream(spark, dir)))

  /** Per-user session counting with explicit keyed state — the streaming twin
    * of q19's lag + cumulative-sum. In batch mode Spark runs the same
    * function once per group. Events are buffered and sorted by event time
    * within the group; at scale the buffer is bounded by per-user event
    * volume per micro-batch, and the watermark-driven timeout would evict
    * idle users' state.
    */
  def sessionCounts(spark: SparkSession, events: Dataset[Ev]): Dataset[SessOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessState]) =>
          val sorted = evs.toArray.sortBy(e => (e.ts_ns, e.event_id))
          var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val newSession = st.lastTs == Long.MinValue || e.ts_ns - st.lastTs > GapNs
            st = SessState(e.ts_ns, st.sessions + (if (newSession) 1 else 0), st.events + 1)
          }
          state.update(st)
          Iterator(SessOut(user, st.sessions, st.events))
      }
  }

  final case class EvT(event_id: Long, ts_ns: Long, user_id: Long, value: Double,
      ts_us: java.sql.Timestamp)
  final case class SessFinal(user_id: Long, n_sessions: Long, n_events: Long, closed: Boolean)

  /** Sessionization with REAL state eviction — the production lifecycle
    * [[sessionCounts]]'s scaladoc only gestures at. State carries an
    * event-time timeout at lastSeen + gap: when the watermark passes it,
    * the group's final row is emitted with `closed = true` and the state
    * is REMOVED — so state size tracks active users, not all users ever
    * seen, which is the difference between bounded and unbounded state on
    * a year-long stream. A user who returns after eviction starts a fresh
    * session from zero (proven in StreamingSpec), exactly what
    * re-keying-by-epoch would give a batch recompute.
    *
    * `lateness` is the watermark delay: cross-micro-batch disorder within
    * it is tolerated (a zero delay silently DROPS any event older than the
    * watermark — correct only for perfectly ordered replays), at the price
    * of evictions lagging by the same bound.
    */
  def sessionCountsEvicting(
      spark: SparkSession,
      events: Dataset[EvT],
      lateness: String = "2 hours"): Dataset[SessFinal] = {
    import spark.implicits._
    events
      .withWatermark("ts_us", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessFinal](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, evs: Iterator[EvT], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator(SessFinal(user, st.sessions, st.events, closed = true))
          } else {
            val sorted = evs.toArray.sortBy(e => (e.ts_ns, e.event_id))
            var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
            sorted.foreach { e =>
              val newSession = st.lastTs == Long.MinValue || e.ts_ns - st.lastTs > GapNs
              st = SessState(e.ts_ns, st.sessions + (if (newSession) 1 else 0), st.events + 1)
            }
            state.update(st)
            // evict when the watermark passes the session gap after the
            // last event. ns → ms rounds UP: flooring lastTs would fire the
            // timeout up to 999 µs early, so a boundary event the gap rule
            // assigns to the SAME session (ts == lastTs + gap exactly)
            // could find its state already evicted on µs-granular data
            state.setTimeoutTimestamp((st.lastTs + GapNs + 999999L) / 1000000L)
            Iterator(SessFinal(user, st.sessions, st.events, closed = false))
          }
      }
  }

  final case class TypeEv(user_id: Long, ts_ns: Long, event_id: Long, event_type: String)
  final case class Scd2State(curType: String, validFrom: Long, ver: Long, nEvents: Long)
  final case class Scd2Closed(user_id: Long, ver: Long, event_type: String,
      valid_from: Long, valid_to: Long, n_events: Long)

  /** Live SCD type-2 maintenance — the streaming twin of batch t115: each
    * user's keyed state holds the OPEN dimension version (current type,
    * valid_from, version counter, event count); when an arriving event
    * changes the type, the closed version row is emitted with its
    * [valid_from, valid_to) bounds and the state rolls forward. Emitted
    * rows are append-only and final (a version closes exactly once), which
    * is what makes this expressible in Append mode; the open version lives
    * only in state until its closing event arrives. Events are sorted
    * within each micro-batch; cross-batch order is the source's contract
    * (same as [[sessionCounts]] — a replayable log delivers per-key
    * in-order). StreamingSpec proves the emitted closed rows equal batch
    * t115's closed rows regardless of the micro-batch split. */
  def scd2Stream(spark: SparkSession, events: Dataset[TypeEv]): Dataset[Scd2Closed] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Closed](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[TypeEv], state: GroupState[Scd2State]) =>
          val sorted = evs.toArray.sortBy(e => (e.ts_ns, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Closed]
          var st = state.getOption.orNull
          sorted.foreach { e =>
            if (st == null)
              st = Scd2State(e.event_type, e.ts_ns, 1L, 1L)
            else if (e.event_type != st.curType) {
              out += Scd2Closed(user, st.ver, st.curType, st.validFrom, e.ts_ns, st.nEvents)
              st = Scd2State(e.event_type, e.ts_ns, st.ver + 1L, 1L)
            } else st = st.copy(nEvents = st.nEvents + 1L)
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** Streaming ingest dedup — the streaming twin of exact dedup (q24/t34)
    * for at-least-once sources that replay events on recovery. State is
    * bounded by the watermark: an event_id is remembered only until the
    * watermark passes its event time (dropDuplicatesWithinWatermark), which
    * is exactly the replay horizon a resumed source can produce — unbounded
    * dropDuplicates state would OOM a year-long stream. Output rows keep
    * the Ev shape so downstream operators are dedup-transparent.
    */
  def dedupEventsStream(spark: SparkSession, events: Dataset[Ev]): Dataset[Ev] = {
    import spark.implicits._
    withEventTime(events.toDF())
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("ts_ns"), col("user_id"), col("value"))
      .as[Ev]
  }

  /** Stream-static enrichment join — the third standard streaming shape
    * next to windowed aggs and keyed state: each micro-batch joins a STATIC
    * dimension (here a user→segment map, e.g. read from parquet) and counts
    * per segment. Spark re-resolves the static side per micro-batch, so a
    * slowly-changing dimension re-read from storage is picked up without
    * restarting the query; the dim is broadcast when small (the usual
    * case), so the stream side never shuffles for the join. Left join:
    * events from users missing in the dim land in an explicit "unknown"
    * bucket instead of silently dropping. */
  def enrichedSegmentCounts(events: Dataset[Ev], userSegments: DataFrame): DataFrame =
    events.toDF()
      .join(userSegments, Seq("user_id"), "left")
      .groupBy(coalesce(col("segment"), lit("unknown")).as("segment"))
      .agg(count(lit(1)).as("n_events"))

  /** Stream–stream interval join — the fourth streaming shape: correlate
    * two live streams (here high-value events to each user's subsequent
    * events within 1 hour) on an equi-key plus an event-time range. BOTH
    * sides carry watermarks and the range is two-sided, so Spark can bound
    * the join state: a buffered trigger row is dropped once the follow
    * stream's watermark passes its time + 1h — without the time bounds the
    * state grows forever and the query is rejected in Append mode. Output
    * rows pair (trigger event, follow event, lag); the aggregation to
    * follow-counts per trigger is left to the caller so the join itself
    * stays append-only.
    */
  def triggerFollowJoin(triggers: DataFrame, follows: DataFrame): DataFrame = {
    val t = triggers
      .withColumn("t_us", timestamp_micros(
        expr("(ts_ns div 1000) - (CASE WHEN ts_ns % 1000 < 0 THEN 1 ELSE 0 END)")))
      .withWatermark("t_us", "2 hours")
      .select(col("event_id").as("trigger_id"), col("user_id"), col("t_us"))
    val f = follows
      .withColumn("f_us", timestamp_micros(
        expr("(ts_ns div 1000) - (CASE WHEN ts_ns % 1000 < 0 THEN 1 ELSE 0 END)")))
      .withWatermark("f_us", "2 hours")
      .select(col("event_id").as("follow_id"), col("user_id").as("f_user"), col("f_us"))
    t.join(f,
      col("user_id") === col("f_user") &&
        col("f_us") > col("t_us") &&
        col("f_us") <= col("t_us") + expr("INTERVAL 1 HOUR"))
      .select(col("trigger_id"), col("follow_id"), col("user_id"),
        (unix_micros(col("f_us")) - unix_micros(col("t_us"))).as("lag_us"))
  }

  def eventsDataset(spark: SparkSession, dir: String): Dataset[Ev] = {
    import spark.implicits._
    ensureNanosConf(spark)
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.select(col("event_id"), graft.Tables.tsNs(raw.schema).as("ts_ns"),
        col("user_id"), col("value"))
      .as[Ev]
  }

  /** Incremental bottom-k uniform sample — the live twin of the t134
    * sampler and the EXECUTABLE proof of its mergeability claim: each
    * micro-batch's bottom-k folds into the persisted sample via
    * [[graft.operators.BottomKSample.merge]] (union → (h, c) dedup →
    * re-cut at k), so after any arrival slicing the sample table equals
    * the one-shot batch sample of everything seen — proven against the
    * batch sampler in StreamingSpec. Replayed micro-batches are no-ops
    * (the dedup half of merge), so the sink is idempotent under
    * foreachBatch's at-least-once contract. The merged k rows are
    * localCheckpoint-materialized BEFORE the overwrite, so the read and
    * the rewrite of the same path never race. `events` must carry
    * (event_id, value).
    */
  def sampleStream(events: DataFrame, k: Int, path: String, ckpt: String): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val fresh = graft.operators.BottomKSample.sample(
          batch, col("event_id"), round(col("value") * 100, 0).cast("long"), k, salt = "qk:")
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val merged =
          if (fs.exists(new org.apache.hadoop.fs.Path(path)))
            graft.operators.BottomKSample.merge(spark.read.parquet(path), fresh, k)
          else fresh
        // eager checkpoint pins the k merged rows BEFORE the overwrite (the
        // read and rewrite share the path); freed via CkTracker because
        // Dataset.unpersist() is a no-op on checkpoint blocks
        val tracker = new graft.operators.CkTracker(batch)
        val (pinned, ids) = tracker.ck(merged)
        pinned.write.mode("overwrite").parquet(path)
        tracker.free(ids)
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()
}
