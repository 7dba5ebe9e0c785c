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
}
