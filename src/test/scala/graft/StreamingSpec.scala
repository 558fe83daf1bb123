package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
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
}
