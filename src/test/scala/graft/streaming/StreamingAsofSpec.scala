package graft.streaming

import graft.SparkSpec
import graft.etl.AsofJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

case class LeftEvt(k: Long, id: Long, ts: Timestamp)
case class RightRef(k: Long, rts: Timestamp, payload: String)

/** Streaming as-of enrichment must match the batch operator
  * ([[graft.etl.AsofJoin]], q79's kernel) on in-order delivery —
  * including ≤-tie visibility, carry ACROSS trigger boundaries, and
  * left events with no preceding reference. */
class StreamingAsofSpec extends SparkSpec {
  import spark.implicits._

  private def t(ms: Long) = new Timestamp(ms)

  test("stream enrichment equals the batch as-of join on in-order delivery") {
    // references and events interleaved across THREE triggers so the
    // carry must survive the state store, not just a sort
    val rights = Seq(
      Seq(RightRef(1, t(1000), "a1"), RightRef(2, t(1000), "b1")),
      Seq(RightRef(1, t(3000), "a2")),
      Seq())
    val lefts = Seq(
      Seq(LeftEvt(1, 10, t(500)),          // before any ref -> NULL
        LeftEvt(1, 11, t(1000)),           // tie -> sees a1 (<= semantics)
        LeftEvt(2, 20, t(2000))),          // b1
      Seq(LeftEvt(1, 12, t(2500)),         // still a1
        LeftEvt(1, 13, t(3000))),          // tie with a2 -> a2
      Seq(LeftEvt(1, 14, t(9000)),         // carry across empty-right trigger
        LeftEvt(3, 30, t(9000))))          // key with no refs at all -> NULL

    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[LeftEvt]
    val rIn = MemoryStream[RightRef]
    val q = StreamingAsof.enrich(lIn.toDF(), rIn.toDF(),
        "k", "id", "ts", "rts", "payload", delay = "0 seconds")
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    for ((lb, rb) <- lefts.zip(rights)) {
      if (rb.nonEmpty) rIn.addData(rb: _*)
      if (lb.nonEmpty) lIn.addData(lb: _*)
      q.processAllAvailable()
    }
    q.stop()

    val streamed = spark.table("asof_out").collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
        Option(r.getTimestamp(3)).map(_.getTime), Option(r.getString(4)))
    }.toSet

    val batchOut = AsofJoin.asofJoin(
        lefts.flatten.toDF(), rights.flatten.toDF(),
        Seq("k"), "ts", "rts", Seq("payload"))
      .collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
          Option(r.getTimestamp(3)).map(_.getTime), Option(r.getString(4)))
      }.toSet

    assert(streamed === batchOut)
    // spot-check the interesting rows explicitly
    val byId = streamed.map(x => x._2 -> x).toMap
    assert(byId(10L)._5 === None)              // no preceding ref
    assert(byId(11L)._5 === Some("a1"))        // <= tie visibility
    assert(byId(13L)._5 === Some("a2"))        // tie with newer ref
    assert(byId(14L)._5 === Some("a2"))        // carried across triggers
    assert(byId(30L)._5 === None)              // key never referenced
  }

  test("multiple reference updates inside one trigger apply in event order") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[LeftEvt]
    val rIn = MemoryStream[RightRef]
    val q = StreamingAsof.enrich(lIn.toDF(), rIn.toDF(),
        "k", "id", "ts", "rts", "payload", delay = "0 seconds")
      .writeStream.format("memory").queryName("asof_out2")
      .outputMode("append").start()
    // one trigger carrying refs at 1s and 2s plus events straddling them
    rIn.addData(RightRef(7, t(1000), "v1"), RightRef(7, t(2000), "v2"))
    lIn.addData(LeftEvt(7, 1, t(1500)), LeftEvt(7, 2, t(2500)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("asof_out2").collect()
      .map(r => r.getLong(1) -> r.getString(4)).toMap
    assert(got === Map(1L -> "v1", 2L -> "v2"))
  }
}
