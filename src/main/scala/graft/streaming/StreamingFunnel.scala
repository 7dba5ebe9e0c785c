package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel — the streaming face of
  * [[graft.etl.Funnel]]: as events arrive, each user advances through
  * the ordered step list (step k counts only strictly after step k−1,
  * the same strict-succession rule as the batch operator), and every
  * advance is emitted exactly once as an append-mode `StepReached` row.
  * Per-step counts downstream are a plain `groupBy(step).count()` over
  * the emitted rows.
  *
  * Parity with the batch funnel — under ANY micro-batch slicing or
  * cross-batch reordering of events the engine's watermark filter lets
  * through: the per-key state keeps, besides the walk finalized up to
  * the watermark, a buffer of the still-revisable events (ts >
  * watermark), and every trigger re-walks finalized ⊕ buffer in full
  * event-time order. Because the greedy earliest-match walk of a chain
  * pattern is optimal AND monotone in the event set (adding an event
  * never lowers the reachable step count — the exchange argument), the
  * provisional step index only ever grows, so advances can be emitted
  * EAGERLY (no watermark latency) and still converge to exactly the
  * batch operator's step counts (StreamingFunnelSpec asserts this on
  * shuffled slicings). The one divergence left: a step emitted
  * provisionally carries the reach-time of the walk at emission — a
  * later in-watermark event may retime (never un-reach) that step in
  * the batch recomputation, and append mode cannot retract the
  * timestamp. Step COUNTS are slicing-invariant; per-step timestamps
  * are exact only for walks past the watermark. Events later than the
  * watermark are dropped by the engine before the operator (the
  * standard contract), so "batch parity" means batch over the rows
  * actually delivered.
  *
  * Scale shape: one shuffle on the user key (the state-store key);
  * per-key state is two scalars + the pending buffer, which holds ONLY
  * events inside the watermark lag (older ones fold into the finalized
  * walk on sight or on the event-time timeout that fires once the
  * watermark passes the oldest pending event). Irrelevant event types
  * never enter the buffer. Completed funnels drop their buffer and
  * keep a tombstone until `ttlMs` of event time passes (so replays
  * cannot re-run the funnel), then the key is reclaimed by the
  * event-time timeout.
  */
object StreamingFunnel {

  /** One funnel advance: `step` is 1-based, `stepName` the event type. */
  case class StepReached(key: Long, step: Int, stepName: String, reachedMs: Long)

  /** One buffered not-yet-finalized event (public: encoder codegen). */
  case class PendEv(ms: Long, typ: String)

  /** Per-key funnel state (public: Spark encoder codegen needs it).
    *  - `finalIdx`/`finalMs`: greedy walk over events with ts ≤ the
    *    watermark as of the last fold — immutable history.
    *  - `emittedIdx`: highest step already emitted (≥ finalIdx; the
    *    provisional walk may run ahead of the finalized one).
    *  - `pending`: events still inside the watermark lag, unsorted.
    *  - `lastMs`: newest event time seen (anchors the TTL). */
  case class FunnelSt(
      finalIdx: Int,
      finalMs: Long,
      emittedIdx: Int,
      pending: Seq[PendEv],
      lastMs: Long)

  def stepEvents(
      stream: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      delay: String,
      ttlMs: Long = 30L * 24 * 3600 * 1000): Dataset[StepReached] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(ttlMs > 0, s"ttlMs must be positive, got $ttlMs")
    implicit val outEnc = Encoders.product[StepReached]
    implicit val stEnc = Encoders.product[FunnelSt]
    implicit val keyEnc = Encoders.scalaLong
    implicit val rowEnc = Encoders.tuple(
      Encoders.scalaLong, Encoders.TIMESTAMP, Encoders.STRING)
    val stepSet = steps.toSet
    val n = steps.length
    // watermarked column passes through UNTOUCHED (a cast would mint a
    // fresh attribute without the watermark metadata); drop
    // never-relevant event types before they cost a shuffle byte
    val keyed = stream
      .withWatermark(tsCol, delay)
      .where(col(typeCol).cast("string").isInCollection(stepSet))
      .select(col(keyCol).cast("long").as("k"), col(tsCol).as("ts"),
        col(typeCol).cast("string").as("t"))
      .as[(Long, java.sql.Timestamp, String)]
      .groupByKey(_._1)

    /** Greedy walk from (idx, frontier) over `evs` (must be ts-sorted);
      * returns the advances taken and the new (idx, frontier). */
    def walk(idx0: Int, ms0: Long, evs: Seq[PendEv])
        : (Vector[(Int, String, Long)], Int, Long) = {
      var idx = idx0; var ms = ms0
      val adv = Vector.newBuilder[(Int, String, Long)]
      evs.foreach { e =>
        if (idx < n && e.typ == steps(idx) && (idx == 0 || e.ms > ms)) {
          idx += 1; ms = e.ms
          adv += ((idx, e.typ, e.ms))
        }
      }
      (adv.result(), idx, ms)
    }

    /** Fold pending ≤ wm into the finalized walk, then run the
      * provisional walk over what remains; emit advances beyond
      * emittedIdx; update state + timers. Shared by the data path and
      * the timeout (flush/TTL) path. */
    def advance(
        key: Long,
        st: FunnelSt,
        state: GroupState[FunnelSt]): Iterator[StepReached] = {
      val wm = state.getCurrentWatermarkMs()
      val sorted = st.pending.sortBy(p => (p.ms, p.typ)).toVector
      val (ripe, buf) = sorted.partition(_.ms <= wm)
      val (advF, fIdx, fMs) = walk(st.finalIdx, st.finalMs, ripe)
      val (advP, pIdx, _) = walk(fIdx, fMs, buf)
      // advances can come from EITHER walk: an event already at-or-under
      // the watermark on arrival finalizes (and emits) immediately
      val fresh = (advF ++ advP).filter(_._1 > st.emittedIdx)
      val emittedIdx = math.max(st.emittedIdx, math.max(fIdx, pIdx))
      // a completed funnel needs no buffer — tombstone until TTL
      val keep = if (emittedIdx >= n) Vector.empty[PendEv] else buf
      if (emittedIdx == 0 && keep.isEmpty) {
        // no progress, nothing revisable: hold no state at all —
        // otherwise every key ever seen would grow the store
        if (state.exists) state.remove()
        Iterator.empty
      } else {
        state.update(FunnelSt(fIdx, fMs, emittedIdx, keep, st.lastMs))
        // wake when the watermark passes the oldest buffered event (to
        // compact state), else when the TTL expires the key
        val wake =
          if (keep.nonEmpty) keep.map(_.ms).min
          else math.max(st.lastMs, wm) + ttlMs
        state.setTimeoutTimestamp(math.max(wake, wm + 1))
        fresh.iterator.map { case (k, typ, ms) =>
          StepReached(key, k, typ, ms)
        }
      }
    }

    def run(
        key: Long,
        rows: Iterator[(Long, java.sql.Timestamp, String)],
        state: GroupState[FunnelSt]): Iterator[StepReached] = {
      val st0 = state.getOption.getOrElse(
        FunnelSt(0, Long.MinValue, 0, Vector.empty, Long.MinValue))
      if (state.hasTimedOut) {
        if (st0.pending.isEmpty) { state.remove(); Iterator.empty }
        else advance(key, st0, state) // flush timer: compact, maybe re-arm
      } else {
        var lastMs = st0.lastMs
        val add = rows.map { case (_, t, typ) =>
          val ms = t.getTime
          lastMs = math.max(lastMs, ms)
          PendEv(ms, typ)
        }.toVector
        advance(key, st0.copy(pending = st0.pending ++ add, lastMs = lastMs),
          state)
      }
    }
    keyed.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(run)
  }

  /** Convenience rollup over [[stepEvents]] output: one row per step
    * with the users-reached count — the batch
    * [[graft.etl.Funnel.funnelCounts]] shape (`step<k>_<type>`). */
  def stepCounts(stepEvents: Dataset[StepReached]): DataFrame =
    stepEvents
      .groupBy(concat_ws("_",
        concat(lit("step"), col("step")), col("stepName")).as("step"))
      .agg(count(lit(1)).as("n_users"))
}
