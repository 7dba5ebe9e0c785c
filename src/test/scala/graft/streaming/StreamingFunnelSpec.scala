package graft.streaming

import graft.SparkSpec
import graft.etl.Funnel
import graft.sources.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class FEv(user_id: Long, ts: java.sql.Timestamp, event_type: String)

class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def ev(u: Long, at: String, t: String) = FEv(u, ts(at), t)

  private val steps = Seq("view", "click", "purchase")

  private def runStream(batches: Seq[Seq[FEv]], name: String): Map[(Long, Int), String] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FEv]
    val q = StreamingFunnel
      .stepEvents(input.toDF(), "user_id", "ts", "event_type", steps,
        delay = "10 minutes")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getAs[Long]("key"), r.getAs[Int]("step")) ->
          r.getAs[String]("stepName")).toMap
    } finally q.stop()
  }

  test("strict succession: advances in order, same-timestamp does not count") {
    val got = runStream(Seq(Seq(
      ev(1, "2024-01-01 10:00:00", "view"),
      ev(1, "2024-01-01 10:00:00", "click"),    // NOT strictly after view
      ev(1, "2024-01-01 10:05:00", "click"),
      ev(1, "2024-01-01 10:06:00", "purchase"),
      ev(2, "2024-01-01 09:00:00", "click"),    // no view yet -> ignored
      ev(2, "2024-01-01 09:30:00", "view"),
      ev(3, "2024-01-01 09:00:00", "view")
    )), "sf_strict")
    assert(got === Map(
      (1L, 1) -> "view", (1L, 2) -> "click", (1L, 3) -> "purchase",
      (2L, 1) -> "view", (3L, 1) -> "view"))
  }

  test("completed funnel tombstone: replays never re-emit a step") {
    val got = runStream(Seq(
      Seq(ev(1, "2024-01-01 10:00:00", "view"),
        ev(1, "2024-01-01 10:05:00", "click"),
        ev(1, "2024-01-01 10:06:00", "purchase")),
      // second batch replays the whole funnel — must add nothing
      Seq(ev(1, "2024-01-01 10:00:00", "view"),
        ev(1, "2024-01-01 10:05:00", "click"),
        ev(1, "2024-01-01 10:06:00", "purchase"))), "sf_replay")
    assert(got.size === 3)
  }

  test("out-of-order WITHIN a batch is sorted before advancing") {
    val got = runStream(Seq(Seq(
      ev(1, "2024-01-01 10:06:00", "purchase"),
      ev(1, "2024-01-01 10:00:00", "view"),
      ev(1, "2024-01-01 10:05:00", "click")
    )), "sf_ooo")
    assert(got.keySet === Set((1L, 1), (1L, 2), (1L, 3)))
  }

  test("cross-batch late step event within the watermark recovers the full funnel") {
    // batch 1 delivers view + purchase (purchase unusable: no click
    // yet); the click arrives one BATCH later but earlier in event time,
    // still inside the 10-minute watermark. The buffered re-walk must
    // then emit click AND the previously unusable purchase — the exact
    // case the pre-round-8 two-scalar frontier could never recover
    // (it had already consumed and discarded the purchase).
    val got = runStream(Seq(
      Seq(ev(1, "2024-01-01 10:00:00", "view"),
        ev(1, "2024-01-01 10:06:00", "purchase")),
      Seq(ev(1, "2024-01-01 10:05:00", "click"))), "sf_late")
    assert(got === Map(
      (1L, 1) -> "view", (1L, 2) -> "click", (1L, 3) -> "purchase"))
  }

  test("step counts match batch funnelCounts under shuffled micro-batch slicings") {
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_type").as[FEv]
      .collect()
    // seeded shuffle, four arbitrary slices: cross-batch order must not
    // matter as long as the watermark (here: wider than the table's
    // whole time span) drops nothing
    val shuffled = new scala.util.Random(8).shuffle(events.toVector)
    val chunks = shuffled.grouped(math.max(shuffled.length / 4, 1)).toSeq
    val input = MemoryStream[FEv]
    val q = StreamingFunnel
      .stepEvents(input.toDF(), "user_id", "ts", "event_type", steps,
        delay = "3650 days")
      .writeStream.format("memory").queryName("sf_shuf")
      .outputMode(OutputMode.Append).start()
    val streamed =
      try {
        chunks.foreach { c => input.addData(c.toSeq: _*); q.processAllAvailable() }
        StreamingFunnel.stepCounts(spark.table("sf_shuf").as[StreamingFunnel.StepReached])
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      } finally q.stop()
    val batch = Funnel.funnelCounts(Tables.events(spark, sfDir),
        "user_id", "ts", "event_type", steps)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(batch.filter(_._2 > 0) === streamed,
      s"shuffled-slicing step counts $streamed != batch $batch")
  }

  test("step counts match batch funnelCounts on the events table (in-order feed)") {
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_type").as[FEv]
      .collect().sortBy(_.ts.getTime)
    // feed in three in-order chunks so state crosses micro-batches
    val chunks = events.grouped(math.max(events.length / 3, 1)).toSeq
    val input = MemoryStream[FEv]
    val q = StreamingFunnel
      .stepEvents(input.toDF(), "user_id", "ts", "event_type", steps,
        delay = "1 minute")
      .writeStream.format("memory").queryName("sf_parity")
      .outputMode(OutputMode.Append).start()
    val streamed =
      try {
        chunks.foreach { c => input.addData(c.toSeq: _*); q.processAllAvailable() }
        StreamingFunnel.stepCounts(spark.table("sf_parity").as[StreamingFunnel.StepReached])
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      } finally q.stop()
    val batch = Funnel.funnelCounts(Tables.events(spark, sfDir),
        "user_id", "ts", "event_type", steps)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // batch reports every step (zeros included); the stream emits only
    // reached steps — compare on the batch's non-zero entries
    assert(batch.filter(_._2 > 0) === streamed,
      s"streaming step counts $streamed != batch $batch")
  }
}
