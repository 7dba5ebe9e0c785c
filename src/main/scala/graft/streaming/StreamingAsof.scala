package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the streaming tier of
  * [[graft.etl.AsofJoin]] (q79's operator): a left event stream is
  * enriched with the most recent right-side reference record at or
  * before each event's timestamp, per key. The trades⋈quotes /
  * reading⋈latest-config join, kept current as both sides stream.
  *
  * Same union+carry shape as the batch operator, executed incrementally:
  * both sides union-tag into one keyed stream; right rows extend the
  * carried reference HISTORY (a small sorted list per key), left rows
  * BUFFER until the watermark passes STRICTLY beyond their event time
  * and only then floor-look-up their match. The wait is what makes the
  * result EXACT under any micro-batch slicing or cross-batch
  * reordering: a reference that could still change the answer for a
  * left event at time t must itself carry a timestamp ≤ t, and a left
  * flushes only once wm > t — at which point every serving right
  * (ts ≤ t < wm) would be dropped by the engine's late filter before
  * reaching the operator. Spark 4.1 drops `ts <= wm`
  * (LessThanOrEqual in WatermarkSupport.watermarkExpression), but the
  * strict flush is deliberately convention-agnostic: it stays exact
  * even on an engine that admits ts == wm rows. The refs visible at
  * flush time are therefore ALL the refs the batch operator would see
  * over the delivered rows (StreamingAsofSpec asserts batch equality
  * on shuffled slicings and pins the wm-equality boundary). Emission latency is the watermark delay — the
  * same trade Spark's built-in stream-stream interval join makes, and
  * the reason the batch operator exists for latency-free backfill.
  *
  * One shuffle on the key (the state-store key); per-key state is the
  * bounded ref history plus the left events inside the watermark lag.
  * An event-time timer fires when the watermark passes the oldest
  * buffered left event (flushing it), falling back to a `stateTtlMs`
  * idle timer that reclaims the key.
  *
  * Semantics and contracts (matching the batch operator):
  *  - An equal-timestamp right record IS visible to a left event (≤,
  *    the batch default): right sorts before left within a tie.
  *  - The right payload travels as ONE atomic value; pack multiple
  *    columns with `to_json(struct(...))` and unpack downstream —
  *    per-column carries could tear rows, the same reason the batch
  *    operator carries one struct.
  *  - Data later than the watermark is dropped by the engine before
  *    the operator (both sides), so "batch parity" means batch over
  *    the rows actually delivered. A left event that flushes with no
  *    reference at or before it emits NULL, never a wrong attachment.
  */
object StreamingAsof {

  /** One enriched left event: `asof_ts`/`payload` are the matched
    * reference's timestamp and value, NULL when no reference at or
    * before `ts` was available. */
  case class AsofEnriched(
      key: Long,
      id: Long,
      ts: java.sql.Timestamp,
      asof_ts: java.sql.Timestamp,
      payload: String)

  /** One carried reference version (public for encoder codegen). */
  case class RefEntry(tsMs: Long, payload: String)

  /** One buffered left event awaiting watermark passage. */
  case class PendLeft(id: Long, tsMs: Long)

  /** Per-key state: ref history sorted ascending by tsMs, buffered
    * left events (unsorted), newest event time seen on either side
    * (anchors the idle TTL). Public for Spark's encoder codegen. */
  case class AsofSt(refs: Seq[RefEntry], pend: Seq[PendLeft], lastMs: Long)

  /** Wire the two streams into the enrichment.
    *
    * @param left     event stream: `keyCol`, `leftIdCol`, `leftTsCol`
    * @param right    reference stream: `keyCol`, `rightTsCol`,
    *                 `payloadCol` (string — pack structs via to_json)
    * @param delay    watermark delay for both sides (also the emission
    *                 latency of each left event)
    * @param stateTtlMs how far (event time) past the last sighting an
    *                 idle key's state survives before the store forgets
    *                 it; also the prune horizon for superseded history
    *                 entries
    * @param maxRefs  hard cap on retained reference versions per key
    *                 (newest win) — guards state against a right side
    *                 that is not actually slowly-changing
    */
  def enrich(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftIdCol: String,
      leftTsCol: String,
      rightTsCol: String,
      payloadCol: String,
      delay: String,
      stateTtlMs: Long = 24L * 3600 * 1000,
      maxRefs: Int = 64): Dataset[AsofEnriched] = {
    implicit val outEnc = Encoders.product[AsofEnriched]
    implicit val stEnc = Encoders.product[AsofSt]
    implicit val keyEnc = Encoders.scalaLong
    implicit val rowEnc = Encoders.tuple(Encoders.scalaLong,
      Encoders.scalaLong, Encoders.TIMESTAMP, Encoders.scalaInt,
      Encoders.STRING)
    // the watermarked ts column must survive the projection as a bare
    // alias (a cast would mint a fresh attribute without the watermark
    // metadata — same constraint as StreamingDedup)
    val l = left.withWatermark(leftTsCol, delay).select(
      col(keyCol).cast("long").as("key"),
      col(leftIdCol).cast("long").as("id"),
      col(leftTsCol).as("ts"),
      lit(1).as("side"),
      lit(null).cast("string").as("payload"))
    val r = right.withWatermark(rightTsCol, delay).select(
      col(keyCol).cast("long").as("key"),
      lit(-1L).as("id"),
      col(rightTsCol).as("ts"),
      lit(0).as("side"),
      col(payloadCol).cast("string").as("payload"))
    val keyed = l.unionByName(r)
      .as[(Long, Long, java.sql.Timestamp, Int, String)]
      .groupByKey(_._1)

    /** Flush every buffered left event the watermark has passed (in
      * (ts, id) order for deterministic output), prune the history,
      * re-arm the timer. Shared by the data and timeout paths. */
    def flush(
        key: Long,
        st: AsofSt,
        state: GroupState[AsofSt]): Iterator[AsofEnriched] = {
      val wm = state.getCurrentWatermarkMs()
      // STRICT: flush only lefts the watermark has passed strictly —
      // exact regardless of which side of the watermark the engine's
      // late filter drops on (Spark 4.1 drops ts <= wm; an engine
      // admitting ts == wm rights would need the equal-ts left to
      // keep waiting, which this does)
      val (ripe, wait) = st.pend.partition(_.tsMs < wm)
      val out = ripe.sortBy(p => (p.tsMs, p.id)).map { p =>
        st.refs.reverseIterator.find(_.tsMs <= p.tsMs) match {
          case Some(m) => AsofEnriched(key, p.id,
            new java.sql.Timestamp(p.tsMs),
            new java.sql.Timestamp(m.tsMs), m.payload)
          case None => AsofEnriched(key, p.id,
            new java.sql.Timestamp(p.tsMs), null, null)
        }
      }
      // prune: drop superseded refs older than the TTL horizon but
      // ALWAYS keep the newest one still serveable — for the waiting
      // lefts (all ≥ wm) and for any future left (≥ wm as well), the
      // newest ref ≤ wm suffices as their floor candidate, so clamp
      // the horizon to the watermark; cap at maxRefs newest as the
      // fast-changing-right guard
      var refs = st.refs
      val horizon =
        math.min(math.max(st.lastMs, wm) - stateTtlMs, wm)
      val lastBelow = refs.lastIndexWhere(_.tsMs <= horizon)
      if (lastBelow > 0) refs = refs.drop(lastBelow)
      if (refs.size > maxRefs) refs = refs.takeRight(maxRefs)
      if (wait.isEmpty && refs.isEmpty) {
        if (state.exists) state.remove()
      } else {
        state.update(AsofSt(refs, wait, st.lastMs))
        // wake once the watermark is strictly past the oldest waiting
        // left (to flush it), else at idle expiry
        val wake =
          if (wait.nonEmpty) wait.map(_.tsMs).min + 1
          else math.max(st.lastMs, wm) + stateTtlMs
        state.setTimeoutTimestamp(math.max(wake, wm + 1))
      }
      out.iterator
    }

    def run(
        key: Long,
        rows: Iterator[(Long, Long, java.sql.Timestamp, Int, String)],
        state: GroupState[AsofSt]): Iterator[AsofEnriched] = {
      val st0 = state.getOption.getOrElse(
        AsofSt(Vector.empty, Vector.empty, Long.MinValue))
      if (state.hasTimedOut) {
        if (st0.pend.isEmpty) { state.remove(); Iterator.empty }
        else flush(key, st0, state)
      } else {
        var refs = st0.refs.toVector
        var pend = st0.pend.toVector
        var lastMs = st0.lastMs
        // rights in event-time order so same-ts re-delivery replaces
        // deterministically (right unique per (key, ts), the batch
        // determinism contract)
        val sorted = rows.toVector.sortBy(t => (t._3.getTime, t._4))
        for ((_, id, ts, side, payload) <- sorted) {
          val tMs = ts.getTime
          lastMs = math.max(lastMs, tMs)
          if (side == 0) {
            val (before, after) = refs.partition(_.tsMs < tMs)
            refs = (before :+ RefEntry(tMs, payload)) ++
              after.dropWhile(_.tsMs == tMs)
          } else pend = pend :+ PendLeft(id, tMs)
        }
        flush(key, AsofSt(refs, pend, lastMs), state)
      }
    }
    keyed.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(run)
  }
}
