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
  * Parity with the batch funnel: greedy first-eligible-in-event-time
  * IS the batch `min(t_k > t_{k-1})` recursion, so on in-order delivery
  * the step counts match [[graft.etl.Funnel.funnelCounts]] exactly
  * (FunnelParitySpec asserts this on the events table). Under
  * cross-batch lateness the stream may under-advance relative to a
  * batch recomputation (a late-but-earlier step event would have
  * loosened the frontier) — emitted rows are never retracted, the
  * single-pass trade documented on [[StreamingSessionize]] too.
  *
  * Scale shape: one shuffle on the user key (the state-store key);
  * per-key state is two scalars (frontier step + time), independent of
  * stream history. Completed funnels keep a tombstone until `ttlMs` of
  * event time passes (so replays cannot re-run the funnel), then the
  * key is reclaimed by the event-time timeout.
  */
object StreamingFunnel {

  /** One funnel advance: `step` is 1-based, `stepName` the event type. */
  case class StepReached(key: Long, step: Int, stepName: String, reachedMs: Long)

  /** Per-key frontier (public: Spark encoder codegen needs it).
    * `stepIdx` = number of steps already reached (0..n). */
  case class FunnelProgress(stepIdx: Int, frontierMs: Long)

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
    implicit val stEnc = Encoders.product[FunnelProgress]
    implicit val keyEnc = Encoders.scalaLong
    implicit val rowEnc = Encoders.tuple(
      Encoders.scalaLong, Encoders.TIMESTAMP, Encoders.STRING)
    // watermarked column passes through UNTOUCHED (a cast would mint a
    // fresh attribute without the watermark metadata)
    val keyed = stream
      .withWatermark(tsCol, delay)
      .select(col(keyCol).cast("long").as("k"), col(tsCol).as("ts"),
        col(typeCol).cast("string").as("t"))
      .as[(Long, java.sql.Timestamp, String)]
      .groupByKey(_._1)
    val n = steps.length
    keyed.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long, rows: Iterator[(Long, java.sql.Timestamp, String)],
          state: GroupState[FunnelProgress]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          val sorted = rows.toVector.sortBy(_._2.getTime)
          var st = state.getOption.getOrElse(FunnelProgress(0, Long.MinValue))
          val out = Vector.newBuilder[StepReached]
          sorted.foreach { case (_, t, typ) =>
            val ms = t.getTime
            if (st.stepIdx < n && typ == steps(st.stepIdx) &&
                (st.stepIdx == 0 || ms > st.frontierMs)) {
              st = FunnelProgress(st.stepIdx + 1, ms)
              out += StepReached(key, st.stepIdx, typ, ms)
            }
          }
          // completed funnels keep a tombstone (stepIdx == n) so a
          // replayed or late event cannot restart the funnel and
          // double-emit; the TTL below reclaims it. Keys that made NO
          // progress write no state at all — otherwise every key ever
          // seen (e.g. clicks from users who never viewed) would hold
          // state + a 30-day timer, growing the store with
          // distinct-keys-seen instead of funnel-active keys
          if (st.stepIdx > 0 || state.exists) {
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(st.frontierMs, state.getCurrentWatermarkMs()) + ttlMs)
          }
          out.result().iterator
        }
    }
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
