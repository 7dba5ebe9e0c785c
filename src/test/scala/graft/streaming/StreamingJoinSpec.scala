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
}
