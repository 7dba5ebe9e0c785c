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
  * store key). Per-key state is one open session (five scalars) —
  * independent of stream history; total state is bounded by
  * keys-active-within-gap.
  *
  * Contract of the custom tier: records are event-time sorted within
  * each micro-batch; a record older than the open session's span
  * extends that session (single-pass streaming sessionization's
  * standard trade — the built-in tier buffers instead, at the cost of
  * no sequence numbers). */
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

  /** Open-session state (public: Spark encoder codegen needs it). */
  case class OpenSession(
      seq: Long,
      startMs: Long,
      lastMs: Long,
      nEvents: Long,
      totalValue: Double)

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
    keyed.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
          state: GroupState[OpenSession]) =>
        if (state.hasTimedOut) {
          val st = state.get
          if (st.nEvents > 0) {
            // idle past the gap: flush the open session but RETAIN the
            // sequence counter (closed sentinel) so later activity
            // continues the numbering
            state.update(st.copy(nEvents = 0L, totalValue = 0.0))
            state.setTimeoutTimestamp(
              math.max(st.lastMs, state.getCurrentWatermarkMs()) + counterTtlMs)
            Iterator.single(ClosedSession(key, st.seq, st.startMs, st.lastMs,
              st.nEvents, st.totalValue))
          } else {
            // counter TTL expired with no new activity: reclaim the key
            state.remove()
            Iterator.empty
          }
        } else {
          val sorted = rows.toVector.sortBy(r => (r._2.getTime, r._3))
          // a closed sentinel (nEvents == 0) carries only the last-used
          // sequence number; it is not an open session
          var open = state.getOption.filter(_.nEvents > 0)
          var lastSeq = state.getOption.map(_.seq).getOrElse(0L)
          val closed = Vector.newBuilder[ClosedSession]
          sorted.foreach { case (_, t, v) =>
            val ms = t.getTime
            open match {
              case Some(st) if ms - st.lastMs > gapMs =>
                closed += ClosedSession(key, st.seq, st.startMs, st.lastMs,
                  st.nEvents, st.totalValue)
                open = Some(OpenSession(st.seq + 1, ms, ms, 1L, v))
              case Some(st) =>
                open = Some(st.copy(
                  startMs = math.min(st.startMs, ms),
                  lastMs = math.max(st.lastMs, ms),
                  nEvents = st.nEvents + 1,
                  totalValue = st.totalValue + v))
              case None =>
                open = Some(OpenSession(lastSeq + 1, ms, ms, 1L, v))
            }
            lastSeq = open.get.seq
          }
          val st = open.get
          state.update(st)
          state.setTimeoutTimestamp(
            math.max(st.lastMs, state.getCurrentWatermarkMs()) + gapMs)
          closed.result().iterator
        }
    }
  }
}
