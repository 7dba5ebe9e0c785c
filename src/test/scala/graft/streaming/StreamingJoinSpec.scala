package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class Imp(ad_id: Long, ts: java.sql.Timestamp, campaign: String)
case class Clk(ad_id: Long, ts: java.sql.Timestamp, user: String)

class StreamingJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("intervalJoin attributes clicks to impressions within the window") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Imp]
    val clks = MemoryStream[Clk]
    val joined = StreamingJoin.intervalJoin(
      clks.toDF(), imps.toDF(), keyCol = "ad_id", tsCol = "ts",
      delay = "1 hour", beforeMs = 10L * 60 * 1000, afterMs = 0L)
    val q = joined.writeStream.format("memory").queryName("sj_attr")
      .outputMode(OutputMode.Append).start()
    try {
      imps.addData(
        Imp(1L, ts("2024-01-01 10:00:00"), "camp-a"),
        Imp(2L, ts("2024-01-01 10:00:00"), "camp-b"))
      clks.addData(
        Clk(1L, ts("2024-01-01 10:05:00"), "u1"),  // 5 min after imp -> match
        Clk(2L, ts("2024-01-01 10:20:00"), "u2"),  // 20 min after -> no match
        Clk(3L, ts("2024-01-01 10:05:00"), "u3"))  // no impression at all
      q.processAllAvailable()
      val rows = spark.table("sj_attr").collect()
      assert(rows.length === 1)
      val r = rows.head
      assert(r.getAs[Long]("ad_id") === 1L)
      assert(r.getAs[String]("user") === "u1")
      assert(r.getAs[String]("campaign_r") === "camp-a")
    } finally q.stop()
  }

  test("intervalJoin works identically on batch frames") {
    val clicks = Seq(
      Clk(1L, ts("2024-01-01 10:05:00"), "u1"),
      Clk(1L, ts("2024-01-01 11:00:00"), "u2")).toDF()
    val imps = Seq(Imp(1L, ts("2024-01-01 10:00:00"), "camp-a")).toDF()
    val got = StreamingJoin.intervalJoin(clicks, imps, "ad_id", "ts",
        delay = "1 hour", beforeMs = 10L * 60 * 1000, afterMs = 0L)
      .collect()
    assert(got.length === 1)
    assert(got.head.getAs[String]("user") === "u1")
  }

  test("appended output is invariant to micro-batch slicing of both sides") {
    // The interval join buffers each side in the state store until both
    // watermarks prove no more matches can arrive, so ANY slicing of the
    // same rows into micro-batches — including arrival orders where a
    // click precedes its impression by several batches — must converge
    // to exactly the batch join. Event times span < 1 h and the delay is
    // 2 h, so no shuffled ordering can make a row late; parity is exact,
    // not best-effort. A seeded shuffle drives uneven, interleaved
    // slices of BOTH sides through the streaming path.
    val imps = (0 until 12).map(i =>
      Imp(i % 5, ts(f"2024-01-01 10:${i * 4}%02d:00"), s"camp-${i % 3}"))
    val clks = (0 until 18).map(i =>
      Clk(i % 6, ts(f"2024-01-01 10:${(i * 3 + 2) % 60}%02d:00"), s"u$i"))
    val want = StreamingJoin.intervalJoin(clks.toDF(), imps.toDF(),
        "ad_id", "ts", delay = "2 hours",
        beforeMs = 10L * 60 * 1000, afterMs = 0L)
      .selectExpr("ad_id", "user", "campaign_r", "cast(ts as string)",
        "cast(ts_r as string)")
      .collect().map(_.toSeq).sortBy(_.toString)

    val rnd = new scala.util.Random(47)
    val impSlices = rnd.shuffle(imps.toVector).grouped(5).toSeq
    val clkSlices = rnd.shuffle(clks.toVector).grouped(4).toSeq
    implicit val sqlCtx = spark.sqlContext
    val si = MemoryStream[Imp]
    val sc = MemoryStream[Clk]
    val joined = StreamingJoin.intervalJoin(sc.toDF(), si.toDF(),
      "ad_id", "ts", delay = "2 hours",
      beforeMs = 10L * 60 * 1000, afterMs = 0L)
    val q = joined.writeStream.format("memory").queryName("sj_slices")
      .outputMode(OutputMode.Append).start()
    try {
      // interleave the two sides' slices so neither is fully present
      // before the other starts arriving
      val n = math.max(impSlices.length, clkSlices.length)
      for (i <- 0 until n) {
        if (i < clkSlices.length) sc.addData(clkSlices(i): _*)
        if (i < impSlices.length) si.addData(impSlices(i): _*)
        q.processAllAvailable()
      }
      val got = spark.table("sj_slices")
        .selectExpr("ad_id", "user", "campaign_r", "cast(ts as string)",
          "cast(ts_r as string)")
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(got.toSeq === want.toSeq)
    } finally q.stop()
  }

  test("a match arriving batches after its partner still attributes") {
    // Cross-batch pairing in BOTH directions: the click for imp 1
    // arrives two batches after the impression, and the impression for
    // click 2 arrives a batch after the click. Both are within the
    // watermark delay, so the state store must hold each unmatched side
    // until its partner lands.
    implicit val sqlCtx = spark.sqlContext
    val si = MemoryStream[Imp]
    val sc = MemoryStream[Clk]
    val joined = StreamingJoin.intervalJoin(sc.toDF(), si.toDF(),
      "ad_id", "ts", delay = "1 hour",
      beforeMs = 10L * 60 * 1000, afterMs = 0L)
    val q = joined.writeStream.format("memory").queryName("sj_late")
      .outputMode(OutputMode.Append).start()
    try {
      si.addData(Imp(1L, ts("2024-01-01 10:00:00"), "camp-a")) // batch 0
      q.processAllAvailable()
      sc.addData(Clk(2L, ts("2024-01-01 10:06:00"), "u2"))     // batch 1
      q.processAllAvailable()
      assert(spark.table("sj_late").count() === 0)
      sc.addData(Clk(1L, ts("2024-01-01 10:05:00"), "u1"))     // batch 2
      si.addData(Imp(2L, ts("2024-01-01 10:01:00"), "camp-b")) // batch 2
      q.processAllAvailable()
      val got = spark.table("sj_late")
        .selectExpr("user", "campaign_r").orderBy("user")
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(got.toSeq === Seq(("u1", "camp-a"), ("u2", "camp-b")))
    } finally q.stop()
  }
}
