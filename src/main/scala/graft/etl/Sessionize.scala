package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: assign consecutive events of the same key
  * to one session while the gap between neighbours stays within
  * `gapMicros` — the standard preparation step for behavioural /
  * clickstream data before per-session feature extraction.
  *
  * Plan shape: ONE shuffle, keyed on the session key; both window
  * passes (the lag for the gap test and the running sum that numbers
  * sessions) share that partitioning, so Catalyst plans a single
  * exchange followed by two in-partition window operators. Scale is
  * bounded per key — a 1000-executor cluster spreads keys, and a
  * single key's event list only needs to fit one task (the same
  * contract every sessionizer has).
  */
object Sessionize {

  /** Annotate `events` with `session_seq` (1-based per key, in time
    * order). Ties on the timestamp break on `tieBreakCol` so the
    * numbering is deterministic under any partitioning.
    *
    * @param gapMicros a new session starts when the gap to the previous
    *                  event strictly exceeds this many microseconds
    */
  def withSessionSeq(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      gapMicros: Long,
      tieBreakCol: String): DataFrame = {
    require(gapMicros > 0, s"gapMicros must be positive, got $gapMicros")
    val us = unix_micros(col(tsCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(us, col(tieBreakCol))
    val prev = lag(us, 1).over(w)
    val newSession =
      when(prev.isNull || (us - prev) > gapMicros, 1L).otherwise(0L)
    events.withColumn("session_seq",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }

  /** Per-session rollup: event count, duration (floor seconds) and the
    * summed `valueCol`, one row per (key, session). */
  def sessionStats(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      gapMicros: Long,
      tieBreakCol: String,
      valueCol: String): DataFrame = {
    val us = unix_micros(col(tsCol))
    withSessionSeq(events, keyCol, tsCol, gapMicros, tieBreakCol)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        ((max(us) - min(us)) / lit(1000000L)).cast("long").as("duration_sec"),
        round(sum(col(valueCol)), 6).as("total_value"))
  }
}
