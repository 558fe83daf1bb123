package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams

/** Structured Streaming vs batch equivalence on the events table. */
class StreamingSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("streaming tumbling window agg equals batch q18") {
    val stream = EventStreams.tumblingStream(spark, dir)
    val q = stream.writeStream
      .format("memory")
      .queryName("tumbling_test")
      .outputMode(OutputMode.Complete())
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.sql("SELECT * FROM tumbling_test").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSet

    val batch = SparkEntry.queries("q18_event_window")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming sliding window agg equals batch t95") {
    val stream = EventStreams.slidingStream(spark, dir)
    val q = stream.writeStream
      .format("memory")
      .queryName("sliding_test")
      .outputMode(OutputMode.Complete())
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.sql("SELECT * FROM sliding_test").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet

    val batch = SparkEntry.queries("t95_sliding_window")(spark, dir).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("native session windows: streaming equals batch t103") {
    val stream = EventStreams.sessionStream(spark, dir)
    val q = stream.writeStream
      .format("memory")
      .queryName("session_test")
      .outputMode(OutputMode.Complete())
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.sql("SELECT * FROM session_test").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet

    val batch = SparkEntry.queries("t103_session_window")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("idempotent foreachBatch sink: crash-replayed batch lands exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fb_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_fb_sink").toString
    val h = 3600L * 1000000000L
    val input = MemoryStream[EventStreams.Ev]
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
    def start() = EventStreams.startIdempotentSink(
      input.toDS().toDF(), outDir, ckpt,
      bid => seen.merge(bid, 1, (a, b) => a + b))

    val q1 = start()
    try {
      input.addData(EventStreams.Ev(1, 1 * h, 7, 1.0), EventStreams.Ev(2, 1 * h, 8, 1.0))
      q1.processAllAvailable()
    } finally q1.stop()

    // simulate a crash BETWEEN the sink write and the commit: remove the
    // newest commit marker so the restarted query re-executes that batch
    val commits = new java.io.File(ckpt, "commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    assert(commits.last.delete())
    // the local checksummed FS keeps a .N.crc sidecar next to the marker;
    // a real crash would have written neither — remove it too
    new java.io.File(ckpt + "/commits", "." + commits.last.getName + ".crc").delete()

    val q2 = start()
    try {
      q2.processAllAvailable() // replays the uncommitted batch
      input.addData(EventStreams.Ev(3, 2 * h, 7, 1.0))
      q2.processAllAvailable()
    } finally q2.stop()

    val replayed = seen.getOrDefault(commits.last.getName.toLong, 0)
    assert(replayed >= 2, s"expected the uncommitted batch to re-execute, invocations=$seen")
    val ids = spark.read.parquet(outDir).select("event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == Seq(1L, 2L, 3L),
      s"batchId-keyed overwrite must make the replay idempotent, got $ids")
  }

  test("flatMapGroupsWithState sessionization equals batch q19") {
    val evs = EventStreams.eventsDataset(spark, dir)
    val got = EventStreams.sessionCounts(spark, evs).collect()
      .map(s => (s.user_id, s.n_sessions, s.n_events)).toSet
    val batch = SparkEntry.queries("q19_sessionize")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("streaming ingest dedup drops replayed event_ids across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Ev]
    val deduped = EventStreams.dedupEventsStream(spark, input.toDS())
    val q = deduped.writeStream.format("memory").queryName("dedup_inc")
      .outputMode(OutputMode.Append()).start()
    try {
      val h = 3600L * 1000000000L
      input.addData(EventStreams.Ev(1, 1 * h, 7, 1.0), EventStreams.Ev(2, 1 * h + 1000, 7, 2.0))
      q.processAllAvailable()
      // batch 2 replays event 2 (source recovery) and delivers new event 3
      input.addData(EventStreams.Ev(2, 1 * h + 1000, 7, 2.0), EventStreams.Ev(3, 2 * h, 7, 3.0))
      q.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dedup_inc").collect().map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("late-data oracle: within-watermark late rows aggregate, past-watermark rows drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val h = 3600L * 1000000000L // 1 hour in ns
    def ev(id: Long, tHours: Double) = EventStreams.Ev(id, (tHours * h).toLong, 7L, 1.0)

    val input = MemoryStream[EventStreams.Ev]
    val agg = EventStreams.tumblingAgg(input.toDF().select(col("ts_ns"), col("user_id"), col("value")))
    val q = agg.writeStream.format("memory").queryName("late_tumble")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: three on-time events; max event time 2.5h → watermark 0.5h
      input.addData(ev(1, 1.0), ev(2, 1.5), ev(3, 2.5)); q.processAllAvailable()
      // batch 2: advance to 6h → watermark 4h; windows [1,2) [2,3) finalize
      input.addData(ev(4, 6.0)); q.processAllAvailable()
      // batch 3 delivers LATE data against watermark 4h:
      //  - ev5 at 4.5h: window [4,5) ends after the watermark → must count
      //  - ev6 at 1.2h: window [1,2) ended long before it → must be dropped
      input.addData(ev(5, 4.5), ev(6, 1.2)); q.processAllAvailable()
      // batch 4: advance to 10h → watermark 8h; [4,5) and [6,7) finalize
      input.addData(ev(7, 10.0)); q.processAllAvailable()

      val emitted = spark.sql("SELECT user_id, win_start, n_events, sum_value FROM late_tumble")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSet

      // the drop happened: window [1,2) counts 2 events, not 3
      val w1 = emitted.filter(_._2.getTime == 1 * 3600 * 1000L)
      assert(w1.map(_._3) == Set(2L), s"late ev6 must be dropped, got $w1")
      // the within-watermark late row was accepted: [4,5) exists with 1 event
      val w4 = emitted.filter(_._2.getTime == 4 * 3600 * 1000L)
      assert(w4.map(_._3) == Set(1L), s"late-but-within ev5 must count, got $w4")

      // final emissions == the BATCH recompute over (delivered \ dropped),
      // restricted to windows the final watermark (8h) has finalized
      val union = Seq(ev(1, 1.0), ev(2, 1.5), ev(3, 2.5), ev(4, 6.0), ev(5, 4.5), ev(7, 10.0))
      val oracle = EventStreams.tumblingAgg(
        union.toDF().select(col("ts_ns"), col("user_id"), col("value")))
        .filter(col("win_start") < timestamp_millis(lit(8L * 3600 * 1000)))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSet
      assert(emitted == oracle, s"emitted=$emitted oracle=$oracle")
    } finally q.stop()
  }

  test("stream-static enrichment join equals batch recompute; missing users bucket as unknown") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val segments = Seq((7L, "paid"), (8L, "free")).toDF("user_id", "segment")
    val h = 3600L * 1000000000L
    val b1 = Seq(EventStreams.Ev(1, 1 * h, 7, 1.0), EventStreams.Ev(2, 1 * h, 8, 1.0))
    val b2 = Seq(EventStreams.Ev(3, 2 * h, 7, 1.0), EventStreams.Ev(4, 2 * h, 99, 1.0)) // 99 not in dim

    val input = MemoryStream[EventStreams.Ev]
    val counts = EventStreams.enrichedSegmentCounts(input.toDS(), segments)
    val q = counts.writeStream.format("memory").queryName("seg_counts")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.sql("SELECT segment, n_events FROM seg_counts").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      val batch = EventStreams.enrichedSegmentCounts((b1 ++ b2).toDS(), segments).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(streamed == Set(("paid", 2L), ("free", 1L), ("unknown", 1L)))
    } finally q.stop()

    // the static side broadcasts: the stream side must not shuffle for the join
    val plan = EventStreams.enrichedSegmentCounts((b1 ++ b2).toDS(), segments)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("stream-stream interval join pairs triggers with follows inside the hour, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val h = 3600L * 1000000000L
    def ev(id: Long, tHours: Double, u: Long) =
      EventStreams.Ev(id, (tHours * h).toLong, u, 1.0)

    val trig = MemoryStream[EventStreams.Ev]
    val fol = MemoryStream[EventStreams.Ev]
    val joined = EventStreams.triggerFollowJoin(trig.toDF(), fol.toDF())
    val q = joined.writeStream.format("memory").queryName("tf_join")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: trigger for user 7 at t=1h; one follow in range at 1.5h
      trig.addData(ev(1, 1.0, 7)); fol.addData(ev(10, 1.5, 7)); q.processAllAvailable()
      // batch 2 (cross-batch match): follow at 1.9h still joins the buffered
      // trigger; 2.5h is past the 1h bound; user 8 never matches
      fol.addData(ev(11, 1.9, 7), ev(12, 2.5, 7), ev(13, 1.2, 8)); q.processAllAvailable()
      val got = spark.sql("SELECT trigger_id, follow_id, lag_us FROM tf_join").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((1L, 10L, 1800000000L), (1L, 11L, 3240000000L)), s"got $got")

      // batch equivalence: the same function on static frames
      val tb = Seq(ev(1, 1.0, 7)).toDF()
      val fb = Seq(ev(10, 1.5, 7), ev(11, 1.9, 7), ev(12, 2.5, 7), ev(13, 1.2, 8)).toDF()
      val batch = EventStreams.triggerFollowJoin(tb, fb).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      assert(batch == got, s"batch=$batch stream=$got")
    } finally q.stop()
  }

  test("event-time timeout evicts session state; a returning user starts fresh") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val h = 3600L * 1000000000L
    def ev(id: Long, tHours: Double, u: Long) = EventStreams.EvT(
      id, (tHours * h).toLong, u, 1.0,
      new java.sql.Timestamp((tHours * 3600L * 1000L).toLong))

    val input = MemoryStream[EventStreams.EvT]
    val out = EventStreams.sessionCountsEvicting(spark, input.toDS())
    val q = out.writeStream.format("memory").queryName("sess_evict")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 42, two events in one session
      input.addData(ev(1, 1.0, 42), ev(2, 1.1, 42)); q.processAllAvailable()
      // batch 2: unrelated user at t=5h → watermark 5h > 1.1h + 30min gap
      // → user 42's state times out: closed row emitted, state removed
      input.addData(ev(3, 5.0, 7)); q.processAllAvailable()
      // MicroBatchExecution fires timeouts on the NEXT batch after the
      // watermark advance; an empty-ish tick triggers it deterministically
      input.addData(ev(4, 5.1, 7)); q.processAllAvailable()
      val closed42 = spark.sql(
        "SELECT n_sessions, n_events FROM sess_evict WHERE user_id = 42 AND closed").collect()
      assert(closed42.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)),
        s"expected user 42's final (1 session, 2 events), got ${closed42.toSeq}")

      // user 42 returns at 9h: state was REMOVED, so counts restart at 1/1
      input.addData(ev(5, 9.0, 42)); q.processAllAvailable()
      val fresh = spark.sql(
        "SELECT n_sessions, n_events FROM sess_evict WHERE user_id = 42 AND NOT closed " +
          "ORDER BY n_events DESC").collect()
      assert(fresh.map(r => (r.getLong(0), r.getLong(1))).contains((1L, 1L)),
        s"returning user must start from evicted (fresh) state, got ${fresh.toSeq}")
    } finally q.stop()
  }

  test("parquet sink + checkpoint: stop/restart resumes exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val h = 3600L * 1000000000L
    val input = MemoryStream[EventStreams.Ev]

    def startQuery() = input.toDS().writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

    val q1 = startQuery()
    try {
      input.addData(EventStreams.Ev(1, 1 * h, 7, 1.0), EventStreams.Ev(2, 1 * h, 8, 1.0))
      q1.processAllAvailable()
    } finally q1.stop()

    // restart against the same checkpoint: committed offsets must not be
    // re-emitted, new data must land — exactly-once across the restart
    val q2 = startQuery()
    try {
      input.addData(EventStreams.Ev(3, 2 * h, 7, 1.0))
      q2.processAllAvailable()
    } finally q2.stop()

    val ids = spark.read.parquet(outDir).select("event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == Seq(1L, 2L, 3L),
      s"sink must hold each event exactly once across restart, got $ids")
  }

  test("incremental streaming via MemoryStream sees late-batch arrivals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Ev]
    val sessions = EventStreams.sessionCounts(spark, input.toDS())
    val q = sessions.writeStream.format("memory").queryName("sess_inc")
      .outputMode(OutputMode.Append()).start()
    try {
      val h = 3600L * 1000000000L
      input.addData(EventStreams.Ev(1, 1 * h, 42, 1.0), EventStreams.Ev(2, 1 * h + 1000, 42, 1.0))
      q.processAllAvailable()
      input.addData(EventStreams.Ev(3, 3 * h, 42, 1.0)) // > 30 min gap -> new session
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM sess_inc WHERE user_id = 42").collect()
      // last emitted state: 2 sessions, 3 events
      assert(rows.map(r => (r.getLong(1), r.getLong(2))).contains((2L, 3L)))
    } finally q.stop()
  }

  test("streaming admission over micro-batches equals one-shot batch t96") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.queries.Similarity
    import graft.streaming.DocStreams

    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // static side: the persisted corpus index (built once, probed per batch)
    val corpusSh = Similarity.shingleDocs(docs.filter(col("doc_id") % 10 =!= 0))
      .localCheckpoint()
    val index = Similarity.bandIndex(corpusSh).localCheckpoint()

    val batchDocs = docs.filter(col("doc_id") % 10 === 0).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(batchDocs.nonEmpty)

    val out = java.nio.file.Files.createTempDirectory("graft_adm_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_adm_ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = DocStreams.admissionStream(
      input.toDS().toDF("doc_id", "text"), index, corpusSh, out, ckpt)
    try {
      // two micro-batches: the verdicts must not depend on the batch split
      val (b1, b2) = batchDocs.splitAt(batchDocs.length / 2)
      input.addData(b1.toSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), Option(r.get(2)), r.getBoolean(3))
    val streamed = spark.read.parquet(out)
      .select("doc_id", "n_dups", "best_jac", "admitted").collect().map(key).toSet
    val oneShot = SparkEntry.queries("t96_incremental_dedup")(spark, dir)
      .collect().map(key).toSet
    assert(streamed == oneShot,
      s"streamed verdicts diverge from batch: ${streamed.diff(oneShot)} / ${oneShot.diff(streamed)}")
  }

  test("self-maintaining admission: later micro-batches dedup against earlier admissions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.queries.Similarity
    import graft.streaming.DocStreams

    val base = java.nio.file.Files.createTempDirectory("graft_selfadm").toString
    // bootstrap: a one-doc seed corpus in the persisted index + shingle store
    val seed = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val seedSh = Similarity.shingleDocs(seed).localCheckpoint()
    Similarity.writeBandIndex(seedSh, "selfadm_idx", s"$base/idx", overwrite = true)
    Similarity.writeShingleStore(seedSh, "selfadm_sh", s"$base/sh", overwrite = true)

    val novel1 = "the quick brown fox jumps over the lazy dog while rain falls on the plain"
    val novel2 = "completely different content about catalyst optimizer internals and shuffles"

    val out = java.nio.file.Files.createTempDirectory("graft_selfadm_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_selfadm_ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = DocStreams.selfMaintainingAdmissionStream(
      input.toDS().toDF("doc_id", "text"),
      "selfadm_idx", s"$base/idx", "selfadm_sh", s"$base/sh", out, ckpt)
    try {
      // batch 1: a novel doc — admitted, and its signatures join the index
      input.addData((10L, novel1))
      q.processAllAvailable()
      // batch 2: a duplicate of the doc ADMITTED IN BATCH 1 (not in the
      // seed corpus) must now be rejected; an unrelated doc still admits
      input.addData((20L, novel1), (21L, novel2))
      q.processAllAvailable()
    } finally q.stop()

    val v = spark.read.parquet(out)
      .select("doc_id", "n_dups", "admitted").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(v(10L) == ((0L, true)), s"novel doc vs seed corpus must admit: $v")
    assert(v(20L)._1 >= 1L && !v(20L)._2,
      s"dup of a doc admitted in an EARLIER micro-batch must be rejected: $v")
    assert(v(21L) == ((0L, true)), s"unrelated doc must still admit: $v")

    // the index grew by exactly the admitted docs — the rejected one is absent
    val idxDocs = spark.table("selfadm_idx")
      .select("doc_id2").distinct().as[Long].collect().toSet
    assert(idxDocs == Set(1L, 10L, 21L), s"index docs: $idxDocs")
    val storeDocs = spark.table("selfadm_sh")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(storeDocs == idxDocs, s"shingle store must track the index: $storeDocs")
  }

  test("self-maintaining admission cold-starts on an EMPTY corpus (no pre-seeded tables)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.DocStreams

    // no writeBandIndex/writeShingleStore bootstrap: batch 0 must probe an
    // empty index (admit everything) instead of dying on a missing table,
    // and batch 1 must then dedup against batch 0's appended signatures
    val base = java.nio.file.Files.createTempDirectory("graft_coldadm").toString
    val out = java.nio.file.Files.createTempDirectory("graft_coldadm_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_coldadm_ckpt").toString
    val body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val input = MemoryStream[(Long, String)]
    val q = DocStreams.selfMaintainingAdmissionStream(
      input.toDS().toDF("doc_id", "text"),
      "coldadm_idx", s"$base/idx", "coldadm_sh", s"$base/sh", out, ckpt)
    try {
      input.addData((1L, body))
      q.processAllAvailable()
      input.addData((2L, body))
      q.processAllAvailable()
    } finally q.stop()
    val v = spark.read.parquet(out)
      .select("doc_id", "admitted").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(v == Map(1L -> true, 2L -> false),
      s"cold start must admit batch 0 and reject its batch-1 duplicate: $v")
  }

  test("streaming SCD2 maintenance emits exactly batch t115's closed versions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evs = Tables.events(spark, dir).filter(col("user_id") < 10)
      .select(col("user_id"), col("ts_ns"), col("event_id"), col("event_type"))
      .orderBy("ts_ns", "event_id")
      .as[EventStreams.TypeEv].collect()
    assert(evs.nonEmpty)

    val input = MemoryStream[EventStreams.TypeEv]
    val stream = EventStreams.scd2Stream(spark, input.toDS())
    val q = stream.writeStream
      .format("memory").queryName("scd2_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // three in-order micro-batches with splits landing mid-run
      val (b1, rest) = evs.splitAt(evs.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5))
    val streamed = spark.sql(
      "SELECT user_id, ver, event_type, valid_from, valid_to, n_events FROM scd2_test")
      .collect().map(key).toSet
    val batchClosed = SparkEntry.queries("t115_scd2_history")(spark, dir)
      .filter(col("valid_to").isNotNull)
      .select("user_id", "ver", "event_type", "valid_from", "valid_to", "n_events")
      .collect().map(key).toSet
    assert(streamed == batchClosed,
      s"diverged: ${streamed.diff(batchClosed).take(3)} / ${batchClosed.diff(streamed).take(3)}")
    assert(streamed.nonEmpty)
  }

  test("streaming DSIR weighting over micro-batches equals one-shot batch t114") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dsir
    import graft.streaming.DocStreams

    val docs = Tables.documents(spark, dir)
    val lam = Dsir.lambdaTable(
      Dsir.bucketed(docs.filter(col("lang") === "en"), "doc_id", "text", 256),
      Dsir.bucketed(docs.filter(col("lang") =!= "en"), "doc_id", "text", 256),
      256).localCheckpoint()

    val allDocs = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val out = java.nio.file.Files.createTempDirectory("graft_dsir_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_dsir_ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = DocStreams.dsirWeightStream(
      input.toDS().toDF("doc_id", "text"), lam, 256, out, ckpt)
    try {
      val (b1, b2) = allDocs.splitAt(allDocs.length / 2)
      Seq(b1, b2).foreach { b =>
        input.addData(b.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val streamed = spark.read.parquet(out)
      .select("doc_id", "n_tok", "logw_micro").collect().map(key).toSet
    val oneShot = SparkEntry.queries("t114_dsir_weights")(spark, dir)
      .collect().map(key).toSet
    assert(streamed == oneShot)
    assert(streamed.nonEmpty)
  }

  test("streaming LM-quality scoring over micro-batches equals one-shot batch t113") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.LmScore
    import graft.streaming.DocStreams

    val docs = Tables.documents(spark, dir)
    // static LM fitted once on the English slice (the t113 contract)
    val lm = LmScore.vocab(
      LmScore.tokens(docs.filter(col("lang") === "en"), "doc_id", "text")).localCheckpoint()
    val tv = LmScore.totals(lm).localCheckpoint()

    val allDocs = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val out = java.nio.file.Files.createTempDirectory("graft_lm_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_lm_ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = DocStreams.qualityScoreStream(
      input.toDS().toDF("doc_id", "text"), lm, tv, out, ckpt)
    try {
      // three micro-batches: scores must not depend on the batch split
      val (b1, rest) = allDocs.splitAt(allDocs.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val streamed = spark.read.parquet(out)
      .select("doc_id", "n_tok", "avg_nll_micro").collect().map(key).toSet
    val oneShot = SparkEntry.queries("t113_lm_quality")(spark, dir)
      .collect().map(key).toSet
    assert(streamed == oneShot,
      s"streamed scores diverge from batch: ${streamed.diff(oneShot).take(3)} / ${oneShot.diff(streamed).take(3)}")
    assert(streamed.nonEmpty)
  }

  test("incremental bottom-k sample equals the one-shot batch sample under any slicing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = EventStreams.eventsDataset(spark, dir).collect()
    assert(evs.length > 200, "fixture too small for a k=64 sample to be a strict subset")
    val path = s"${java.nio.file.Files.createTempDirectory("graft_smp").toString}/sample"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_smp_ckpt").toString
    val input = MemoryStream[EventStreams.Ev]
    val q = EventStreams.sampleStream(input.toDS().toDF(), 64, path, ckpt)
    try {
      // three uneven micro-batches, then one REPLAYED slice: the merge's
      // (h, c) dedup must make the at-least-once delivery a no-op
      val slices = evs.grouped(math.max(1, evs.length / 3)).toSeq
      slices.foreach { sl =>
        input.addData(sl.toSeq: _*)
        q.processAllAvailable()
      }
      input.addData(slices.head.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(path)
      .select("h", "c").as[(Long, Long)].collect().toSet
    val oneShot = graft.operators.BottomKSample.sample(
        evs.toSeq.toDF("event_id", "ts_ns", "user_id", "value"),
        col("event_id"), round(col("value") * 100, 0).cast("long"), k = 64, salt = "qk:")
      .select("h", "c").as[(Long, Long)].collect().toSet
    assert(streamed.size === 64)
    assert(streamed === oneShot,
      s"streamed sample diverges from batch: ${streamed.diff(oneShot).take(3)} / ${oneShot.diff(streamed).take(3)}")
  }

  test("streaming blocklist gate over micro-batches equals one-shot batch t145") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.DocStreams

    val allDocs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val out = java.nio.file.Files.createTempDirectory("graft_bl_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_bl_ckpt").toString
    val input = MemoryStream[(Long, String)]
    // the exact t145 pattern list and threshold
    val q = DocStreams.blocklistStream(
      input.toDS().toDF("doc_id", "text"),
      Seq("slow", "low", "table", "merge batch"), threshold = 4L, out, ckpt)
    try {
      val (b1, rest) = allDocs.splitAt(allDocs.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getInt(2))
    val streamed = spark.read.parquet(out)
      .select("doc_id", "n_hits", "blocked").collect().map(key).toSet
    val oneShot = SparkEntry.queries("t145_blocklist_scan")(spark, dir)
      .collect().map(key).toSet
    assert(streamed == oneShot,
      s"streamed verdicts diverge from batch: ${streamed.diff(oneShot).take(3)} / ${oneShot.diff(streamed).take(3)}")
    assert(streamed.nonEmpty)
  }

  test("streaming crawl triage over micro-batches equals one-shot batch, and replays idempotently") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.queries.Similarity
    import graft.streaming.DocStreams

    // t156's corpus split: doc_id % 3 == 0 is the existing corpus, the
    // rest is the incoming crawl
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 3 === 0)
    val fpIndex = corpus.select(Similarity.canonicalFp(col("text")).as("fp"))
      .distinct().localCheckpoint()
    val corpusSh = Similarity.shingleDocs(corpus).localCheckpoint()
    val index = Similarity.bandIndex(corpusSh).localCheckpoint()

    val newDocs = docs.filter(col("doc_id") % 3 =!= 0).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(newDocs.nonEmpty)
    val out = java.nio.file.Files.createTempDirectory("graft_triage_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_triage_ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = DocStreams.triageStream(
      input.toDS().toDF("doc_id", "text"), fpIndex, index, corpusSh, out, ckpt)
    val (b1, b2) = newDocs.splitAt(newDocs.length / 2)
    try {
      Seq(b1, b2).foreach { b =>
        input.addData(b.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getString(1))
    def sinkRows() =
      spark.read.parquet(out).select("doc_id", "verdict").collect().map(key)
    val streamed = sinkRows()
    val oneShot = Similarity
      .triage(docs.filter(col("doc_id") % 3 =!= 0), fpIndex, index, corpusSh)
      .collect().map(key)
    assert(streamed.toSet == oneShot.toSet,
      s"streamed verdicts diverge from batch: ${streamed.toSet.diff(oneShot.toSet).take(3)} " +
        s"/ ${oneShot.toSet.diff(streamed.toSet).take(3)}")
    assert(streamed.length == oneShot.length, "per-doc verdicts must not duplicate")
    // the decision must actually discriminate on this fixture
    assert(streamed.map(_._2).distinct.length >= 2,
      s"degenerate fixture: all verdicts = ${streamed.map(_._2).distinct.toSeq}")

    // replay: a fresh checkpoint re-delivers b1 as batch 0 — the
    // batch-id-keyed overwrite must land on the same path with identical
    // verdicts, leaving the sink byte-for-byte equivalent (no dup rows)
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_triage_ckpt2").toString
    val input2 = MemoryStream[(Long, String)]
    val q2 = DocStreams.triageStream(
      input2.toDS().toDF("doc_id", "text"), fpIndex, index, corpusSh, out, ckpt2)
    try {
      input2.addData(b1.toSeq: _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val replayed = sinkRows()
    assert(replayed.sorted.toSeq == streamed.sorted.toSeq,
      "replaying batch 0 must be a no-op on the sink")
  }

  test("self-maintaining chunk index: micro-batches dedup blobs against earlier ingests, replays idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.queries.Multimodal
    import graft.streaming.DocStreams
    import org.apache.spark.sql.DataFrame

    spark.sql("DROP TABLE IF EXISTS chunkidx_store")
    val payloads = Multimodal.mediaPayload(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val (b1, rest) = payloads.splitAt(payloads.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    val base = java.nio.file.Files.createTempDirectory("graft_chunkidx").toString
    val out = s"$base/out"
    def drive(ckpt: String)(bs: Seq[(Long, Array[Byte])]*): Unit = {
      val input = MemoryStream[(Long, Array[Byte])]
      val q = DocStreams.chunkIndexStream(
        input.toDS().toDF("doc_id", "payload"),
        "chunkidx_store", s"$base/store", out, ckpt)
      try bs.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
    }
    drive(s"$base/ckpt")(b1.toSeq, b2.toSeq, b3.toSeq)
    def batchRows(i: Int) =
      spark.read.parquet(s"$out/batch=$i")
        .select("doc_id", "n_chunks", "n_dup_chunks", "dup_bytes")
    def keys(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    // each batch's report must equal the BATCH computation against the
    // chunks of strictly earlier batches (per-doc purity of the verdict;
    // the replayed duplicate rows in the store must not perturb it)
    var prior: DataFrame = null
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      val chunks = Multimodal.chunkFps(b.toSeq.toDF("doc_id", "payload")).localCheckpoint()
      val store = if (prior == null) chunks.limit(0) else prior
      val want = keys(Multimodal.chunkDedupAgainst(chunks, store)
        .select("doc_id", "n_chunks", "n_dup_chunks", "dup_bytes"))
      val got = keys(batchRows(i))
      assert(got == want, s"batch $i diverged: ${got.diff(want).take(3)} / ${want.diff(got).take(3)}")
      prior = if (prior == null) chunks else prior.union(chunks)
    }
    // the dedup must actually fire: the fixture corpus repeats content, so
    // SOME later-batch doc shares chunks with an earlier batch
    val later = batchRows(1).union(batchRows(2))
    assert(later.filter(col("n_dup_chunks") > 0).count() > 0,
      "no cross-batch chunk dups found — degenerate fixture or broken probe")

    // replay-idempotence mechanism: re-deliver b1 on a fresh checkpoint.
    // The store now holds b1's OWN chunks (the append-then-crash window);
    // the doc_id exclusion must keep them invisible, so the recomputed
    // stats equal the batch computation against the OTHER batches' chunks
    // only — were the exclusion broken, every chunk would dup against
    // itself and n_dup_chunks would equal n_chunks on every doc
    val chunks1 = Multimodal.chunkFps(b1.toSeq.toDF("doc_id", "payload")).localCheckpoint()
    val others = Multimodal.chunkFps((b2 ++ b3).toSeq.toDF("doc_id", "payload"))
    val wantReplay = keys(Multimodal.chunkDedupAgainst(chunks1, others)
      .select("doc_id", "n_chunks", "n_dup_chunks", "dup_bytes"))
    drive(s"$base/ckpt2")(b1.toSeq)
    assert(keys(batchRows(0)) == wantReplay,
      "replayed batch must exclude its own previously-appended chunks")
  }

  test("audio trim stream: micro-batch union equals the one-shot batch report") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.queries.Multimodal
    import graft.streaming.DocStreams

    val payloads = Multimodal.mediaPayload(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val (b1, b2) = payloads.splitAt(payloads.length / 3) // uneven on purpose
    val base = java.nio.file.Files.createTempDirectory("graft_audiotrim").toString
    val input = MemoryStream[(Long, Array[Byte])]
    val q = DocStreams.audioTrimStream(
      input.toDS().toDF("doc_id", "payload"), s"$base/out", s"$base/ckpt")
    try Seq(b1, b2).foreach { b => input.addData(b.toSeq: _*); q.processAllAvailable() }
    finally q.stop()
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (0 to 6).map(r.getLong).toList).toSet
    val streamed = keys(spark.read.parquet(s"$base/out"))
    val batch = keys(Multimodal.audioTrimReport(
      payloads.toSeq.toDF("doc_id", "payload")))
    assert(streamed == batch && streamed.size == payloads.length)
  }

  test("image phash stream: admitted signatures gate later batches, replays idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.queries.Multimodal
    import graft.streaming.DocStreams
    import org.apache.spark.sql.DataFrame

    spark.sql("DROP TABLE IF EXISTS phash_store")
    val payloads = Multimodal.rasterPayload(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val (b1, rest) = payloads.splitAt(payloads.length / 3)
    val (b2, b3tail) = rest.splitAt(rest.length / 2)
    // plant a guaranteed cross-batch near-dup: a byte-identical copy of a
    // batch-1 raster under a fresh id — batch 1 probes an empty store so
    // its original is ALWAYS admitted, making the copy's rejection
    // deterministic rather than fixture luck
    val b3 = b3tail :+ ((900001L, b1.head._2))
    val base = java.nio.file.Files.createTempDirectory("graft_phash").toString
    val out = s"$base/out"
    def drive(ckpt: String)(bs: Seq[(Long, Array[Byte])]*): Unit = {
      val input = MemoryStream[(Long, Array[Byte])]
      val q = DocStreams.imagePhashStream(
        input.toDS().toDF("doc_id", "payload"),
        "phash_store", s"$base/store", out, ckpt)
      try bs.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
    }
    drive(s"$base/ckpt")(b1.toSeq, b2.toSeq, b3.toSeq)
    def batchRows(i: Int) =
      spark.read.parquet(s"$out/batch=$i").select("doc_id", "n_dups", "admitted")
    def keys(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

    // each batch's verdicts must equal phashAdmission against the admitted
    // signatures of strictly earlier batches (per-doc purity + the
    // self-maintenance loop)
    var store: DataFrame = null
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      val sigs = Multimodal.aHashBands(b.toSeq.toDF("doc_id", "payload")).localCheckpoint()
      val st = if (store == null) sigs.limit(0) else store
      val want = Multimodal.phashAdmission(sigs, st).localCheckpoint()
      assert(keys(batchRows(i)) == keys(want.select("doc_id", "n_dups", "admitted")),
        s"batch $i diverged from the sequential reference fold")
      val adm = sigs.join(want.filter(col("admitted")).select("doc_id"), Seq("doc_id"))
      store = if (store == null) adm.localCheckpoint() else store.union(adm).localCheckpoint()
    }
    assert(!batchRows(2).filter(col("doc_id") === 900001L).head().getBoolean(2),
      "the planted byte-identical copy must be rejected against the store")
    assert(batchRows(0).filter(!col("admitted")).count() == 0,
      "batch 1 probes an empty store: everything admits")

    // replay: fresh checkpoint re-delivers b1 as batch 0. The store holds
    // b1's OWN batch-0 signatures (the append-then-crash window) — the
    // (doc_id, batch_id) exclusion must hide exactly those, so verdicts
    // equal admission against the OTHER batches' admitted signatures
    val sigs1 = Multimodal.aHashBands(b1.toSeq.toDF("doc_id", "payload")).localCheckpoint()
    val others = store.join(sigs1.select("doc_id"), Seq("doc_id"), "left_anti")
    val wantReplay = keys(Multimodal.phashAdmission(sigs1, others)
      .select("doc_id", "n_dups", "admitted"))
    drive(s"$base/ckpt2")(b1.toSeq)
    assert(keys(batchRows(0)) == wantReplay,
      "replayed batch must exclude its own previously-appended signatures")
  }

  test("IVF ingest stream: probes equal the rebuild after every batch; replay duplicates are probe-invisible") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.queries.Similarity
    import graft.streaming.VecStreams

    spark.sql("DROP TABLE IF EXISTS ivf_stream")
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
      .localCheckpoint()
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .localCheckpoint()
    val vecs = e.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val (b1, b2) = vecs.splitAt(vecs.length / 2)
    val base = java.nio.file.Files.createTempDirectory("graft_ivf_stream").toString

    def probe(lists: org.apache.spark.sql.DataFrame) =
      Similarity.ivfProbe(queries, lists, cents, nprobe = 4, k = 5)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    // appends land from the stream's CLONED session; this session's relation
    // cache still holds the old file listing — readers refresh between
    // batches (the VecStreams reader contract)
    def liveLists() = {
      spark.catalog.refreshTable("ivf_stream")
      spark.table("ivf_stream")
    }
    def rebuildOf(bs: Array[(Long, Array[Float])]) =
      Similarity.ivfAssign(bs.toSeq.toDF("vec_id", "embedding"), cents)

    val input = MemoryStream[(Long, Array[Float])]
    val q = VecStreams.ivfIngestStream(
      input.toDS().toDF("vec_id", "embedding"), cents,
      "ivf_stream", s"$base/store", s"$base/ckpt")
    try {
      input.addData(b1.toSeq: _*); q.processAllAvailable()
      assert(probe(liveLists()) == probe(rebuildOf(b1)),
        "after batch 1 the streamed index must answer like the rebuild")
      input.addData(b2.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val afterAll = probe(liveLists())
    assert(afterAll == probe(rebuildOf(b1 ++ b2)),
      "after batch 2 the streamed index must answer like the rebuild of the union")
    assert(afterAll.nonEmpty)

    // replay: a fresh checkpoint re-delivers b1 — the store now carries b1's
    // rows TWICE. Probes must not move: ivfProbe dedups candidates by
    // (cid, neighbor_id), so replay duplicates are invisible until the
    // compaction rewrite drops them for good
    val input2 = MemoryStream[(Long, Array[Float])]
    val q2 = VecStreams.ivfIngestStream(
      input2.toDS().toDF("vec_id", "embedding"), cents,
      "ivf_stream", s"$base/store", s"$base/ckpt2")
    try { input2.addData(b1.toSeq: _*); q2.processAllAvailable() } finally q2.stop()
    val dupRows = liveLists().count()
    assert(dupRows == (b1.length * 2 + b2.length).toLong,
      s"replay should leave duplicate rows in the append-only store, got $dupRows")
    assert(probe(liveLists()) == afterAll,
      "replay-duplicated list rows must not change any probe answer")
  }

  test("chunk index: crash mid PARTIAL append replays clean; later re-ingestion stays visible") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.queries.Multimodal
    import graft.streaming.DocStreams
    import org.apache.spark.sql.DataFrame

    spark.sql("DROP TABLE IF EXISTS chunkidx_store2")
    val payloads = Multimodal.mediaPayload(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val (b1, b2) = payloads.splitAt(payloads.length / 2)
    val base = java.nio.file.Files.createTempDirectory("graft_chunkidx2").toString
    def drive(ckpt: String, out: String)(bs: Seq[(Long, Array[Byte])]*): Unit = {
      val input = MemoryStream[(Long, Array[Byte])]
      val q = DocStreams.chunkIndexStream(
        input.toDS().toDF("doc_id", "payload"),
        "chunkidx_store2", s"$base/store", out, ckpt)
      try bs.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
    }
    def keys(df: DataFrame) =
      df.select("doc_id", "n_chunks", "n_dup_chunks", "dup_bytes")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    // incarnation 1: b1 lands as batch 0 and its chunks enter the store
    drive(s"$base/ckpt1", s"$base/out1")(b1.toSeq)

    // crash-mid-batch: a fresh incarnation starts delivering b2 as ITS
    // batch 0, appends only PART of b2's chunk rows, and dies before the
    // sink write — simulated by appending a deterministic half directly
    val chunks2 = Multimodal.chunkFps(b2.toSeq.toDF("doc_id", "payload")).localCheckpoint()
    chunks2.select(col("doc_id"), col("fp")).distinct()
      .filter(abs(hash(col("fp"))) % 2 === 0)
      .withColumn("batch_id", lit(0L))
      .write.mode("append").option("path", s"$base/store")
      .bucketBy(8, "fp").saveAsTable("chunkidx_store2")

    // replay: b2 re-delivers as batch 0 on a fresh checkpoint. The partial
    // rows carry (batch_id=0, b2 doc_ids) and must be invisible; b1's
    // batch-0 rows are for OTHER doc_ids and must stay visible — so the
    // report equals the batch computation against b1's chunks exactly
    val chunks1 = Multimodal.chunkFps(b1.toSeq.toDF("doc_id", "payload"))
    drive(s"$base/ckpt2", s"$base/out2")(b2.toSeq)
    assert(keys(spark.read.parquet(s"$base/out2/batch=0")) ==
      keys(Multimodal.chunkDedupAgainst(chunks2, chunks1)),
      "partial-append replay must hide only the crashed batch's own rows")

    // later LEGITIMATE re-ingestion of b1's doc_ids (arrives as batch 1 of
    // a new stream): their earlier store rows carry batch_id 0 ≠ 1, so the
    // probe must still see them — every chunk dups against itself. The old
    // doc_id-only exclusion would hide them and misreport b1 as fully novel
    drive(s"$base/ckpt3", s"$base/out3")(b2.toSeq, b1.toSeq)
    val reingested = spark.read.parquet(s"$base/out3/batch=1")
    assert(reingested.filter(col("n_dup_chunks") =!= col("n_chunks")).count() == 0,
      "re-ingested doc's earlier chunks must stay visible to the probe")
    assert(reingested.count() == b1.length)

    // cross-incarnation collision, resolved by rebase: without it, a NEW
    // stream re-ingesting b1 as ITS batch 0 would collide with b1's
    // original batch_id=0 rows and misreport the blobs as novel. Rebase
    // re-stamps committed rows to batch_id=-1 (and compacts duplicates);
    // the fresh-lineage batch 0 then sees them all — full self-dup
    spark.sql("DROP TABLE IF EXISTS chunkidx_store2r")
    DocStreams.rebaseChunkStore(spark, "chunkidx_store2", "chunkidx_store2r", s"$base/store_r")
    assert(spark.table("chunkidx_store2r").filter(col("batch_id") =!= -1L).count() == 0)
    val input4 = MemoryStream[(Long, Array[Byte])]
    val q4 = DocStreams.chunkIndexStream(
      input4.toDS().toDF("doc_id", "payload"),
      "chunkidx_store2r", s"$base/store_r", s"$base/out4", s"$base/ckpt4")
    try { input4.addData(b1.toSeq: _*); q4.processAllAvailable() } finally q4.stop()
    val rebased = spark.read.parquet(s"$base/out4/batch=0")
    assert(rebased.filter(col("n_dup_chunks") =!= col("n_chunks")).count() == 0,
      "after rebase, a new lineage's batch 0 must see all committed chunks")
  }

  test("template df stream: store compacts to the rebuild, promotions fire once, replays idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.TemplateGrams
    import graft.streaming.DocStreams

    spark.sql("DROP TABLE IF EXISTS tpl_store")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (b1, rest) = docs.splitAt(docs.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    val base = java.nio.file.Files.createTempDirectory("graft_tpl_stream").toString
    val out = s"$base/out"
    def drive(ckpt: String)(bs: Seq[(Long, String)]*): Unit = {
      val input = MemoryStream[(Long, String)]
      val q = DocStreams.templateDfStream(
        input.toDS().toDF("doc_id", "text"), "tpl_store", s"$base/store", out, ckpt)
      try bs.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
    }
    drive(s"$base/ckpt")(b1.toSeq, b2.toSeq, b3.toSeq)

    def dfOf(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    def partial(b: Seq[(Long, String)]) = dfOf(
      TemplateGrams.partialDf(b.toDF("doc_id", "text"), "doc_id", "text", 4)
        .select(col("h"), col("df_part")))

    // 1) the compacted store equals the one-shot full-corpus rebuild —
    //    df partials from disjoint batches are associative
    val rebuild = dfOf(
      TemplateGrams.partialDf(docs.toSeq.toDF("doc_id", "text"), "doc_id", "text", 4)
        .select(col("h"), col("df_part")))
    assert(dfOf(TemplateGrams.mergedDf(spark.table("tpl_store"))) == rebuild,
      "compacted store must equal the batch rebuild")

    // 2) each batch's promotion report equals the sequential expectation,
    //    and no gram promotes twice (df never decreases)
    var cum = Map.empty[Long, Long]
    val expProm = scala.collection.mutable.Map[Int, Set[(Long, Long, Long)]]()
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      val p = partial(b.toSeq)
      expProm(i) = p.collect {
        case (h, dp) if cum.getOrElse(h, 0L) < 3 && cum.getOrElse(h, 0L) + dp >= 3 =>
          (h, cum.getOrElse(h, 0L), cum.getOrElse(h, 0L) + dp)
      }.toSet
      cum = cum ++ p.map { case (h, dp) => h -> (cum.getOrElse(h, 0L) + dp) }
    }
    def promRows(i: Int) = spark.read.parquet(s"$out/batch=$i")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    (0 to 2).foreach { i =>
      assert(promRows(i) == expProm(i), s"batch $i promotions diverged")
    }
    assert((0 to 2).map(expProm(_).size).sum > 0, "no promotions — degenerate fixture")
    val promoted = (0 to 2).flatMap(i => promRows(i).toSeq.map(_._1))
    assert(promoted.distinct.size == promoted.size, "a gram promoted twice")

    // 3) replay: a fresh checkpoint re-delivers b1 as batch 0 while the
    //    store already holds b1's own batch_id=0 rows (append-then-crash
    //    window). The exclusion must keep them invisible: df_before comes
    //    from b2 ∪ b3 only. Were it broken, every b1 gram would count
    //    itself and the report would shift wholesale.
    val pB1 = partial(b1.toSeq)
    val p2 = partial(b2.toSeq); val p3 = partial(b3.toSeq)
    val others = (p2.keySet ++ p3.keySet).iterator
      .map(h => h -> (p2.getOrElse(h, 0L) + p3.getOrElse(h, 0L))).toMap
    val wantReplay = pB1.collect {
      case (h, dp) if others.getOrElse(h, 0L) < 3 && others.getOrElse(h, 0L) + dp >= 3 =>
        (h, others.getOrElse(h, 0L), others.getOrElse(h, 0L) + dp)
    }.toSet
    drive(s"$base/ckpt2")(b1.toSeq)
    assert(promRows(0) == wantReplay,
      "replayed batch must exclude its own previously-appended partials")
    // the literal duplicate rows the replay appended must collapse
    assert(dfOf(TemplateGrams.mergedDf(spark.table("tpl_store"))) == rebuild,
      "replay-duplicated partials must be compaction-invisible")

    // 4) rebase onto a fresh lineage = the store's compaction
    spark.sql("DROP TABLE IF EXISTS tpl_store_r")
    DocStreams.rebaseTemplateStore(spark, "tpl_store", "tpl_store_r", s"$base/store_r")
    assert(spark.table("tpl_store_r").filter(col("batch_id") =!= -1L).count() == 0)
    assert(dfOf(TemplateGrams.mergedDf(spark.table("tpl_store_r"))) == rebuild,
      "rebased store must still compact to the rebuild")
  }
}
