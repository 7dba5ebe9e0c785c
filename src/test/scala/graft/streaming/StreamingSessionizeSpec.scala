package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)

class StreamingSessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def ev(u: Long, at: String, v: Double) = Ev(u, ts(at), v)

  test("sessionAggregates groups batch events into gap windows") {
    // batch mode: session_window works identically without a stream
    val df = Seq(
      ev(1, "2024-01-01 10:00:00", 1.0),
      ev(1, "2024-01-01 10:10:00", 2.0),
      ev(1, "2024-01-01 11:00:00", 4.0), // 50 min gap -> new session
      ev(2, "2024-01-01 09:00:00", 8.0)
    ).toDF()
    val got = StreamingSessionize
      .sessionAggregates(df, "user_id", "ts", "30 minutes", "1 hour", "value")
      .orderBy("user_id", "session_start")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      (1L, ts("2024-01-01 10:00:00"), 2L, 3.0),
      (1L, ts("2024-01-01 11:00:00"), 1L, 4.0),
      (2L, ts("2024-01-01 09:00:00"), 1L, 8.0)))
  }

  test("annotateSessions closes on gap, numbers sessions, flushes on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingSessionize
      .annotateSessions(input.toDF(), "user_id", "ts", "value",
        delay = "10 minutes", gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("ss_annot")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: one session forming for user 1
      input.addData(
        ev(1, "2024-01-01 10:00:00", 1.0),
        ev(1, "2024-01-01 10:05:00", 2.0))
      q.processAllAvailable()
      assert(spark.table("ss_annot").count() === 0) // still open

      // batch 2: an in-gap event extends it; a far event closes it
      input.addData(
        ev(1, "2024-01-01 10:10:00", 4.0),
        ev(1, "2024-01-01 12:00:00", 8.0))
      q.processAllAvailable()
      val afterClose = spark.table("ss_annot").as[ClosedRow].collect()
      assert(afterClose.toSeq === Seq(
        ClosedRow(1L, 1L, ts("2024-01-01 10:00:00").getTime,
          ts("2024-01-01 10:10:00").getTime, 3L, 7.0)))

      // batch 3: advance the watermark far past session 2's last event
      // + gap -> the open session flushes via event-time timeout
      input.addData(ev(2, "2024-01-01 15:00:00", 1.5))
      q.processAllAvailable()
      input.addData(ev(2, "2024-01-01 15:01:00", 1.5))
      q.processAllAvailable()
      val seqs = spark.table("ss_annot").as[ClosedRow].collect()
        .filter(_.key == 1L).map(r => (r.sessionSeq, r.nEvents, r.totalValue))
      assert(seqs.toSet === Set((1L, 3L, 7.0), (2L, 1L, 8.0)))
    } finally q.stop()
  }

  test("session numbering continues after a timeout flush (counter retained)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingSessionize
      .annotateSessions(input.toDF(), "user_id", "ts", "value",
        delay = "1 minute", gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("ss_seq")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ev(1, "2024-01-01 10:00:00", 1.0))
      q.processAllAvailable()
      // advance the watermark far past 10:00 + gap -> session 1 flushes
      // via event-time timeout (needs a batch to advance, one to fire)
      input.addData(ev(99, "2024-01-01 14:00:00", 0.0))
      q.processAllAvailable()
      input.addData(ev(99, "2024-01-01 14:01:00", 0.0))
      q.processAllAvailable()
      assert(spark.table("ss_seq").as[ClosedRow].collect()
        .exists(r => r.key == 1L && r.sessionSeq == 1L))
      // user 1 comes back: the retained counter must number this 2, not 1
      input.addData(ev(1, "2024-01-01 15:00:00", 4.0))
      q.processAllAvailable()
      input.addData(ev(99, "2024-01-01 20:00:00", 0.0))
      q.processAllAvailable()
      input.addData(ev(99, "2024-01-01 20:01:00", 0.0))
      q.processAllAvailable()
      val u1 = spark.table("ss_seq").as[ClosedRow].collect()
        .filter(_.key == 1L).map(r => (r.sessionSeq, r.totalValue)).toSet
      assert(u1 === Set((1L, 1.0), (2L, 4.0)))
    } finally q.stop()
  }

  test("annotateSessions equals batch sessions under shuffled micro-batch slicings") {
    // session bounds, splits, and numbering are event-time facts, so
    // they must be independent of how arrivals slice into micro-batches
    // and of cross-batch reordering within the watermark — the exact
    // failure mode of eager single-pass sessionization (a late in-gap
    // event arriving after its session closed). A seeded shuffle
    // delivers every user's history out of order across many triggers.
    implicit val sqlCtx = spark.sqlContext
    val base = ts("2024-01-01 08:00:00").getTime
    // per-user minute offsets -> sessions at gap 10 min:
    // {0,3,5} {20,22} {40,41,43,44} {70,71} {95}
    val offsets = Seq(0, 3, 5, 20, 22, 40, 41, 43, 44, 70, 71, 95)
    val events = (for { u <- 1L to 4L; (m, i) <- offsets.zipWithIndex } yield
      Ev(u, new java.sql.Timestamp(base + (m * 60L + u * 7) * 1000L),
        i * 1.0 + u)).toVector
    val rnd = new scala.util.Random(23)
    val slices = rnd.shuffle(events).grouped(6).toSeq
    val input = MemoryStream[Ev]
    val q = StreamingSessionize
      .annotateSessions(input.toDF(), "user_id", "ts", "value",
        delay = "4 hours", gapMs = 10L * 60 * 1000)
      .writeStream.format("memory").queryName("ss_shuf")
      .outputMode(OutputMode.Append).start()
    try {
      for (s <- slices) { input.addData(s: _*); q.processAllAvailable() }
      input.addData(ev(99, "2024-01-02 00:00:00", 0.0))
      q.processAllAvailable()
      input.addData(ev(99, "2024-01-02 01:00:00", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("ss_shuf").as[ClosedRow].collect()
        .filter(_.key != 99L)
        .map(r => (r.key, r.sessionSeq, r.nEvents, r.totalValue)).toSet
      val batch = graft.etl.Sessionize.sessionStats(
          events.toDF().withColumn("event_id",
            org.apache.spark.sql.functions.col("user_id")),
          "user_id", "ts", 10L * 60 * 1000000, "event_id", "value")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
        .toSet
      assert(streamed === batch,
        s"diverged: ${streamed.diff(batch)} vs ${batch.diff(streamed)}")
    } finally q.stop()
  }

  test("annotateSessions matches batch Sessionize on a replayed stream") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      ev(1, "2024-01-01 10:00:00", 1.0),
      ev(1, "2024-01-01 10:20:00", 2.0),
      ev(1, "2024-01-01 11:30:00", 4.0),
      ev(3, "2024-01-01 10:00:00", 16.0),
      ev(3, "2024-01-01 10:29:00", 32.0))
    val input = MemoryStream[Ev]
    val q = StreamingSessionize
      .annotateSessions(input.toDF(), "user_id", "ts", "value",
        delay = "1 minute", gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("ss_replay")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      // push the watermark far ahead so every session closes
      input.addData(ev(99, "2024-02-01 00:00:00", 0.0))
      q.processAllAvailable()
      input.addData(ev(99, "2024-02-01 00:00:01", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("ss_replay").as[ClosedRow].collect()
        .filter(_.key != 99L)
        .map(r => (r.key, r.sessionSeq, r.nEvents, r.totalValue)).toSet
      val batch = graft.etl.Sessionize.sessionStats(
          events.toDF().withColumn("event_id",
            org.apache.spark.sql.functions.col("user_id")),
          "user_id", "ts", 30L * 60 * 1000000, "event_id", "value")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
        .toSet
      assert(streamed === batch)
    } finally q.stop()
  }
}

case class ClosedRow(
    key: Long, sessionSeq: Long, startMs: Long, endMs: Long,
    nEvents: Long, totalValue: Double)
