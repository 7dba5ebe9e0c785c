package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization — the streaming face of
  * [[graft.etl.Sessionize]]: events keep arriving, a session closes
  * once its key has been idle past the gap, and closed sessions are
  * emitted exactly once.
  *
  * Two tiers, mirroring [[StreamingDedup]]:
  *  - [[sessionAggregates]]: Spark's built-in `session_window` gap
  *    windows — the engine handles merging, late arrivals within the
  *    watermark, and state eviction. Use this unless per-key session
  *    NUMBERING is required. Works identically on batch frames.
  *  - [[annotateSessions]]: `flatMapGroupsWithState` keyed by the
  *    session key, emitting each CLOSED session with a per-key
  *    `session_seq` (1-based, in event-time order) — the batch
  *    [[graft.etl.Sessionize.sessionStats]] shape. The idle-gap timer
  *    is an EVENT-time timeout riding the watermark (processing-time
  *    timers busy-loop no-data micro-batches), anchored on the max
  *    observed event time because the first batch's watermark is
  *    still epoch 0.
  *
  * Scale shape: both tiers shuffle once on the session key (the state
  * store key). Per-key state is one open session (five scalars) plus
  * the events inside the watermark lag; total state is bounded by
  * keys-active-within-gap × the lag, independent of stream history.
  *
  * Contract of the custom tier: arriving events BUFFER until the
  * watermark passes strictly beyond their event time and only then
  * fold into the session machine, in (ts, value) order. Any event the
  * engine can still deliver has ts ≥ wm > every folded ts (whichever
  * side of the watermark its late filter drops on), so by flush time
  * every event that could land earlier has arrived — the fold sees
  * the exact event-time order the batch operator sorts into, and
  * session bounds/splits/numbering equal the batch
  * [[graft.etl.Sessionize.sessionStats]] under ANY micro-batch
  * slicing or cross-batch reordering within the watermark
  * (StreamingSessionizeSpec asserts it on shuffled slicings). */
object StreamingSessionize {

  /** One closed session. `sessionEnd` is the LAST event's time (the
    * built-in tier's `session_window.end` is last event + gap). */
  case class ClosedSession(
      key: Long,
      sessionSeq: Long,
      startMs: Long,
      endMs: Long,
      nEvents: Long,
      totalValue: Double)

  /** One buffered event awaiting watermark passage (public: Spark
    * encoder codegen needs it). */
  case class PendEv(tsMs: Long, v: Double)

  /** Per-key state: the open session (`nEvents == 0` = closed
    * sentinel carrying only the sequence counter), events still inside
    * the watermark lag, and the newest event time seen (anchors the
    * counter TTL). Public: Spark encoder codegen needs it. */
  case class OpenSession(
      seq: Long,
      startMs: Long,
      lastMs: Long,
      nEvents: Long,
      totalValue: Double,
      pend: Seq[PendEv],
      lastSeenMs: Long)

  /** Built-in gap windows: one row per (key, session) with the
    * engine-managed session bounds. */
  def sessionAggregates(
      stream: DataFrame,
      keyCol: String,
      tsCol: String,
      gap: String,
      delay: String,
      valueCol: String): DataFrame =
    stream
      .withWatermark(tsCol, delay)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 6).as("total_value"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** Closed sessions with per-key 1-based sequence numbers. A session
    * closes when a later event of the same key exceeds the gap, or
    * when the watermark passes its last event + gap (event-time
    * timeout). The still-open session is withheld until it closes —
    * append-mode exactly-once.
    *
    * After a timeout flush the per-key sequence COUNTER is retained
    * (as closed-sentinel state with nEvents = 0) for `counterTtlMs` of
    * event time, so a key that resumes activity continues its
    * numbering instead of silently reusing session_seq 1; only after
    * the counter TTL passes with no activity is the key's state
    * reclaimed and its numbering restarted (the explicit, documented
    * bound on per-key state lifetime). */
  def annotateSessions(
      stream: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      delay: String,
      gapMs: Long,
      counterTtlMs: Long = 7L * 24 * 3600 * 1000): Dataset[ClosedSession] = {
    require(gapMs > 0, s"gapMs must be positive, got $gapMs")
    require(counterTtlMs >= gapMs,
      s"counterTtlMs ($counterTtlMs) must be >= gapMs ($gapMs)")
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val stEnc = Encoders.product[OpenSession]
    implicit val keyEnc = Encoders.scalaLong
    implicit val rowEnc = Encoders.tuple(
      Encoders.scalaLong, Encoders.TIMESTAMP, Encoders.scalaDouble)
    // watermarked column must pass through UNTOUCHED (a cast would mint
    // a fresh attribute without the watermark metadata)
    val keyed = stream
      .withWatermark(tsCol, delay)
      .select(col(keyCol).cast("long").as("k"), col(tsCol).as("ts"),
        col(valueCol).cast("double").as("v"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
    /** Fold every buffered event the watermark has passed STRICTLY
      * (ts < wm) into the session machine in (ts, v) order — any event
      * still admissible under the engine's late filter has ts ≥ wm >
      * every folded ts, so folded sessions are final. Then close the
      * open session if no admissible event can still land inside its
      * gap (wm > lastMs + gap). Shared by the data and timeout paths. */
    def flush(
        key: Long,
        st: OpenSession,
        state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      val wm = state.getCurrentWatermarkMs()
      val (ripe, wait) = st.pend.partition(_.tsMs < wm)
      // a closed sentinel (nEvents == 0) carries only the last-used
      // sequence number; it is not an open session
      var open: Option[OpenSession] = Some(st).filter(_.nEvents > 0)
      var lastSeq = st.seq
      val closed = Vector.newBuilder[ClosedSession]
      ripe.sortBy(p => (p.tsMs, p.v)).foreach { p =>
        val ms = p.tsMs
        open match {
          case Some(o) if ms - o.lastMs > gapMs =>
            closed += ClosedSession(key, o.seq, o.startMs, o.lastMs,
              o.nEvents, o.totalValue)
            open = Some(OpenSession(o.seq + 1, ms, ms, 1L, p.v,
              Vector.empty, st.lastSeenMs))
          case Some(o) =>
            open = Some(o.copy(
              startMs = math.min(o.startMs, ms),
              lastMs = math.max(o.lastMs, ms),
              nEvents = o.nEvents + 1,
              totalValue = o.totalValue + p.v))
          case None =>
            open = Some(OpenSession(lastSeq + 1, ms, ms, 1L, p.v,
              Vector.empty, st.lastSeenMs))
        }
        lastSeq = open.get.seq
      }
      // idle past the gap: no admissible event (all ≥ wm) can extend
      // the open session anymore — flush it, RETAIN the counter
      open match {
        case Some(o) if wm > o.lastMs + gapMs =>
          closed += ClosedSession(key, o.seq, o.startMs, o.lastMs,
            o.nEvents, o.totalValue)
          open = None
        case _ => ()
      }
      state.update(open match {
        case Some(o) => o.copy(pend = wait, lastSeenMs = st.lastSeenMs)
        case None => OpenSession(lastSeq, 0L, 0L, 0L, 0.0, wait,
          st.lastSeenMs)
      })
      // wake at the earliest actionable moment: fold the oldest
      // waiting event, close the open session, or expire the counter
      val waitWake = wait.map(_.tsMs).minOption.map(_ + 1)
      val closeWake = open.map(_.lastMs + gapMs + 1)
      val wake = (waitWake.toSeq ++ closeWake.toSeq).minOption
        .getOrElse(st.lastSeenMs + counterTtlMs)
      state.setTimeoutTimestamp(math.max(wake, wm + 1))
      closed.result().iterator
    }

    keyed.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
          state: GroupState[OpenSession]) =>
        if (state.hasTimedOut) {
          val st = state.get
          if (st.pend.isEmpty && st.nEvents == 0) {
            // counter TTL expired with no new activity: reclaim the key
            state.remove()
            Iterator.empty
          } else flush(key, st, state)
        } else {
          val stored = state.getOption.getOrElse(
            OpenSession(0L, 0L, 0L, 0L, 0.0, Vector.empty, Long.MinValue))
          // the expiry timer only fires on a watermark ADVANCE; a key
          // can receive fresh data first, so honor a lapsed counter TTL
          // eagerly — numbering restarts either way (the documented
          // contract)
          val st0 =
            if (stored.nEvents == 0 && stored.pend.isEmpty &&
                stored.seq > 0 &&
                state.getCurrentWatermarkMs() >=
                  stored.lastSeenMs + counterTtlMs)
              OpenSession(0L, 0L, 0L, 0L, 0.0, Vector.empty, Long.MinValue)
            else stored
          var pend = st0.pend.toVector
          var lastSeen = st0.lastSeenMs
          rows.foreach { case (_, t, v) =>
            val ms = t.getTime
            lastSeen = math.max(lastSeen, ms)
            pend = pend :+ PendEv(ms, v)
          }
          flush(key, st0.copy(pend = pend, lastSeenMs = lastSeen), state)
        }
    }
  }
}
