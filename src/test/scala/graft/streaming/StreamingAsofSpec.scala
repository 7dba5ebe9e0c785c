package graft.streaming

import graft.SparkSpec
import graft.etl.AsofJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

case class LeftEvt(k: Long, id: Long, ts: Timestamp)
case class RightRef(k: Long, rts: Timestamp, payload: String)

/** Streaming as-of enrichment must match the batch operator
  * ([[graft.etl.AsofJoin]], q79's kernel) — including ≤-tie
  * visibility, carry ACROSS trigger boundaries, left events with no
  * preceding reference, and (the round-8 contract) ANY cross-batch
  * reordering the watermark lets through: left events flush only once
  * the watermark passes them, so every reference that can legally
  * arrive has arrived.
  *
  * Test plumbing note: the query watermark is the MIN across both
  * sides' watermark nodes (Spark's default multi-watermark policy), so
  * an idle side stalls it and buffered lefts would never flush inside
  * a test. Real deployments advance idle sides with heartbeats (or opt
  * into the `max` policy); these specs append a far-future heartbeat
  * row on a throwaway key for the same effect, and exclude it from the
  * comparison. */
class StreamingAsofSpec extends SparkSpec {
  import spark.implicits._

  private def t(ms: Long) = new Timestamp(ms)

  private def runAsof(
      lefts: Seq[Seq[LeftEvt]],
      rights: Seq[Seq[RightRef]],
      name: String,
      delay: String): Set[(Long, Long, Long, Option[Long], Option[String])] = {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[LeftEvt]
    val rIn = MemoryStream[RightRef]
    val q = StreamingAsof.enrich(lIn.toDF(), rIn.toDF(),
        "k", "id", "ts", "rts", "payload", delay = delay)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      for ((lb, rb) <- lefts.zipAll(rights, Seq.empty[LeftEvt], Seq.empty[RightRef])) {
        if (rb.nonEmpty) rIn.addData(rb: _*)
        if (lb.nonEmpty) lIn.addData(lb: _*)
        q.processAllAvailable()
      }
      spark.table(name).collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
          Option(r.getTimestamp(3)).map(_.getTime), Option(r.getString(4)))
      }.toSet
    } finally q.stop()
  }

  private def batchAsof(lefts: Seq[LeftEvt], rights: Seq[RightRef])
      : Set[(Long, Long, Long, Option[Long], Option[String])] =
    AsofJoin.asofJoin(lefts.toDF(), rights.toDF(),
        Seq("k"), "ts", "rts", Seq("payload"))
      .collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
          Option(r.getTimestamp(3)).map(_.getTime), Option(r.getString(4)))
      }.toSet

  test("stream enrichment equals the batch as-of join on in-order delivery") {
    // references and events interleaved across THREE triggers so the
    // carry must survive the state store, not just a sort; the final
    // trigger's heartbeat (key 99 far in the future, both sides)
    // advances the min-watermark past every real event
    val rights = Seq(
      Seq(RightRef(1, t(1000), "a1"), RightRef(2, t(1000), "b1")),
      Seq(RightRef(1, t(3000), "a2")),
      Seq(RightRef(99, t(100000), "hb")))
    val lefts = Seq(
      Seq(LeftEvt(1, 10, t(500)),          // before any ref -> NULL
        LeftEvt(1, 11, t(1000)),           // tie -> sees a1 (<= semantics)
        LeftEvt(2, 20, t(2000))),          // b1
      Seq(LeftEvt(1, 12, t(2500)),         // still a1
        LeftEvt(1, 13, t(3000))),          // tie with a2 -> a2
      Seq(LeftEvt(1, 14, t(9000)),         // carry across empty-right trigger
        LeftEvt(3, 30, t(9000)),           // key with no refs at all -> NULL
        LeftEvt(99, 990, t(100000))))      // heartbeat (excluded below)

    val streamed = runAsof(lefts, rights, "asof_out", delay = "0 seconds")
      .filter(_._1 != 99L)
    val batchOut = batchAsof(lefts.flatten.filter(_.k != 99L),
      rights.flatten.filter(_.k != 99L))

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
    val rights = Seq(
      Seq(RightRef(7, t(1000), "v1"), RightRef(7, t(2000), "v2"),
        RightRef(99, t(100000), "hb")))
    val lefts = Seq(
      Seq(LeftEvt(7, 1, t(1500)), LeftEvt(7, 2, t(2500)),
        LeftEvt(99, 990, t(100000))))
    val got = runAsof(lefts, rights, "asof_out2", delay = "0 seconds")
      .filter(_._1 != 99L).map(x => x._2 -> x._5.orNull).toMap
    assert(got === Map(1L -> "v1", 2L -> "v2"))
  }

  test("cross-batch late reference within the watermark still attaches") {
    // the motivating out-of-order case: a left event arrives FIRST, its
    // matching (earlier-timestamped) reference arrives one batch LATER,
    // still inside the watermark. Eager emission would have answered
    // NULL / stale; the flush-after-watermark contract answers exactly
    // as the batch join does.
    val rights = Seq(
      Seq(RightRef(5, t(1000), "old")),
      Seq(RightRef(5, t(4000), "late")),     // ts < the left seen in batch 1
      Seq(RightRef(99, t(100000), "hb")))
    val lefts = Seq(
      Seq(LeftEvt(5, 50, t(5000))),          // would match "old" eagerly
      Seq(),
      Seq(LeftEvt(99, 990, t(100000))))
    val streamed = runAsof(lefts, rights, "asof_late", delay = "10 seconds")
      .filter(_._1 != 99L)
    assert(streamed ===
      Set((5L, 50L, 5000L, Some(4000L), Some("late"))))
  }

  test("watermark-equality boundary: parity holds for a right landing AT the watermark") {
    // boundary pin: after batch 1 the watermark sits EXACTLY at 2000
    // (both sides' max event time == 2000, delay 0). Spark 4.1's late
    // filter is LessThanOrEqual (WatermarkSupport.watermarkExpression,
    // verified against the shipped jar): a right with rts == wm is
    // DROPPED in a later batch, never delivered to the operator — so
    // batch-over-delivered-rows parity means the equal-ts left
    // correctly emits NULL. The operator itself flushes lefts only
    // STRICTLY below the watermark, which keeps that parity even if a
    // future engine admits ts == wm rows (they'd then attach instead).
    // If this test ever flips to Some("tie"), the engine's boundary
    // convention changed — the operator is correct either way; update
    // the pin.
    val lefts = Seq(
      Seq(LeftEvt(4, 40, t(2000))),            // pends; wm -> 2000 after batch
      Seq(LeftEvt(4, 41, t(5000))),            // same-key data at wm == 2000
      Seq(),
      Seq(LeftEvt(99, 990, t(100000))))        // heartbeat walks wm past all
    val rights = Seq(
      Seq(RightRef(98, t(2000), "hb1")),       // pins right-side wm to 2000
      Seq(),
      Seq(RightRef(4, t(2000), "tie")),        // rts == wm: dropped by engine
      Seq(RightRef(99, t(100000), "hb")))
    val streamed = runAsof(lefts, rights, "asof_wmeq", delay = "0 seconds")
      .filter(x => x._1 != 99L && x._1 != 98L)
    assert(streamed === Set(
      (4L, 40L, 2000L, None, None),
      (4L, 41L, 5000L, None, None)))
  }

  test("a right delivered in the same batch as the watermark-equal left attaches") {
    // companion to the boundary pin: when the equal-ts right IS
    // delivered (same batch, before the watermark reaches it), the
    // strict flush must still attach it — the left waits until wm
    // passes strictly beyond 2000 and finds the ref in history
    val lefts = Seq(
      Seq(LeftEvt(6, 60, t(2000))),
      Seq(LeftEvt(99, 990, t(100000))))
    val rights = Seq(
      Seq(RightRef(6, t(2000), "tie")),
      Seq(RightRef(99, t(100000), "hb")))
    val streamed = runAsof(lefts, rights, "asof_wmeq2", delay = "0 seconds")
      .filter(_._1 != 99L)
    assert(streamed === Set((6L, 60L, 2000L, Some(2000L), Some("tie"))))
  }

  test("equals the batch join under shuffled micro-batch slicings") {
    // a dense two-sided history, delivered in a seeded shuffled order
    // across four triggers per side — slicing and cross-batch order are
    // engine artifacts the result must be independent of. delay covers
    // the full event-time span so the late filter drops nothing; the
    // epilogue heartbeat then walks the watermark past every real row.
    val rights = (for (k <- 1L to 3L; i <- 0 to 5)
      yield RightRef(k, t(1000L * (i + 1) + 100 * k), s"v${k}_$i")).toVector
    val lefts = (for (k <- 1L to 3L; i <- 0 to 11)
      yield LeftEvt(k, k * 100 + i, t(500L * (i + 1) + 37 * k))).toVector
    val rnd = new scala.util.Random(8)
    val shuffledR = rnd.shuffle(rights).grouped(5).toSeq
    val shuffledL = rnd.shuffle(lefts).grouped(9).toSeq
    val withHb =
      shuffledL.map(_.toSeq) ++ Seq(Seq(LeftEvt(99, 990, t(500000))))
    val rWithHb =
      shuffledR.map(_.toSeq) ++ Seq(Seq(RightRef(99, t(500000), "hb")))
    val streamed = runAsof(withHb, rWithHb, "asof_shuf", delay = "10 seconds")
      .filter(_._1 != 99L)
    val batchOut = batchAsof(lefts, rights)
    assert(streamed === batchOut,
      s"shuffled-slicing stream diverged: ${streamed.diff(batchOut)} vs ${batchOut.diff(streamed)}")
  }
}
