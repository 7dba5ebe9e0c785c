package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class Tick(ts: java.sql.Timestamp, k: String, v: Double)

class StreamAggregatesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("watermarked tumbling window finalizes once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val agg = StreamAggregates.windowedAgg(
      input.toDF(), "ts", "5 minutes", "10 minutes", Seq("k"), "v")
    val q = agg.writeStream
      .format("memory").queryName("winagg").outputMode("append").start()
    try {
      input.addData(
        Tick(ts("2024-01-01 00:01:00"), "a", 1.0),
        Tick(ts("2024-01-01 00:04:00"), "a", 2.0),
        Tick(ts("2024-01-01 00:07:00"), "b", 5.0))
      q.processAllAvailable()
      // nothing final yet: watermark has not passed the window end
      assert(spark.table("winagg").count() === 0)

      // an event far enough ahead pushes the watermark past 00:10
      input.addData(Tick(ts("2024-01-01 00:21:00"), "a", 9.0))
      q.processAllAvailable()
      val rows = spark.table("winagg")
        .selectExpr("k", "n_events", "sum_value").orderBy("k")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq === Seq(("a", 2L, 3.0), ("b", 1L, 5.0)))
    } finally q.stop()
  }

  test("finalized windows are invariant to micro-batch slicing") {
    // Tumbling-window count/sum is a commutative-associative fold per
    // (window, key), so any slicing of the same rows into micro-batches
    // must finalize the same windows with the same totals. Event times
    // span < 1 h against a 2 h delay, so no shuffled arrival order can
    // make a row late — parity with the batch group-by is exact. A
    // sentinel far in the future (sent last) pushes the watermark past
    // every real window's end so the append-mode sink emits them all;
    // its own window stays open and is excluded from the comparison.
    val rows = (for (i <- 0 until 48) yield
      Tick(ts(f"2024-01-01 00:${i % 55}%02d:${(i * 7) % 60}%02d"),
        Seq("a", "b", "c")(i % 3), (i % 9) + 0.5)).toVector
    val sentinel = Tick(ts("2024-01-08 00:00:00"), "zz", 0.0)
    val want = rows.toDF()
      .groupBy(org.apache.spark.sql.functions.window(
        org.apache.spark.sql.functions.col("ts"), "10 minutes"),
        org.apache.spark.sql.functions.col("k"))
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_events"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("v")).as("sum_value"))
      .selectExpr("cast(window.start as string)", "k", "n_events",
        "sum_value")
      .collect().map(_.toSeq).sortBy(_.toString)

    val shuffled = new scala.util.Random(53).shuffle(rows)
    val slices = Seq(shuffled.take(3), shuffled.slice(3, 20),
      shuffled.slice(20, 20), shuffled.slice(20, 48)) // incl. an empty one
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val agg = StreamAggregates.windowedAgg(
      input.toDF(), "ts", "2 hours", "10 minutes", Seq("k"), "v")
    val q = agg.writeStream
      .format("memory").queryName("winagg_slices").outputMode("append")
      .start()
    try {
      for (b <- slices if b.nonEmpty) {
        input.addData(b: _*); q.processAllAvailable()
      }
      input.addData(sentinel); q.processAllAvailable()
      // one more batch so the watermark computed from the sentinel's
      // batch finalizes the real windows
      input.addData(sentinel); q.processAllAvailable()
      val got = spark.table("winagg_slices")
        .where("k <> 'zz'")
        .selectExpr("cast(window.start as string)", "k", "n_events",
          "sum_value")
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(got.toSeq === want.toSeq)
    } finally q.stop()
  }
}
