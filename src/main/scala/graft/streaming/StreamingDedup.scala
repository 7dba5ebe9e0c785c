package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.text.TextAnalysis

/** Cross-batch streaming deduplication for a document ingest stream —
  * the streaming face of [[graft.dedup.Dedup]]'s exact/fingerprint
  * family: a duplicate arriving days after the original must still be
  * recognized, without state growing forever.
  *
  * Two tiers:
  *  - [[distinctByFingerprint]]: built-in watermarked `dropDuplicates`
  *    on the canonical-text fingerprint — emits only first occurrences;
  *    state is one row per distinct fingerprint inside the watermark
  *    horizon.
  *  - [[annotateOccurrences]]: `flatMapGroupsWithState` keyed by
  *    fingerprint, emitting EVERY document annotated with its occurrence
  *    number (1 = first sight = keep; >1 = duplicate + which doc it
  *    duplicates) — the shape a training-data ingest needs when
  *    duplicates must be logged/attributed, not silently dropped. State
  *    per key is two scalars (first doc id, count), expired via an
  *    EVENT-time timeout once the watermark passes last-sight + TTL
  *    (processing-time timeouts would busy-loop no-data micro-batches
  *    just to fire timers; event-time timers ride the watermark).
  *
  * Scale shape: both tiers shuffle once on the fingerprint (the state
  * store key); per-key state is O(1); watermark/TTL bounds total state
  * by distinct-fingerprints-per-horizon, not by stream history.
  */
object StreamingDedup {

  /** Event emitted by [[annotateOccurrences]]. */
  case class Occurrence(
      fp: String,
      docId: Long,
      occurrence: Long,
      firstDocId: Long)

  /** Internal per-fingerprint state (public only because Spark's
    * encoder codegen needs constructor/accessor visibility). */
  case class FpState(firstDocId: Long, seen: Long)

  /** First occurrence per canonical-text fingerprint within the
    * watermark horizon (exactly the batch `Dedup.exact` semantics,
    * streaming). */
  def distinctByFingerprint(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      delay: String): DataFrame =
    stream
      .withColumn("fp", md5(TextAnalysis.canonical(col(textCol))))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(Seq("fp"))

  /** Annotate every arriving document with its occurrence number within
    * its fingerprint group and the id of the first-seen document.
    *
    * @param tsCol     event-time column the watermark rides on
    * @param delay     watermark delay (how late records may arrive)
    * @param stateTtlMs how far (event time) past the watermark a
    *                   fingerprint's state survives before the store
    *                   forgets it — a duplicate arriving after expiry is
    *                   treated as a fresh first occurrence
    */
  def annotateOccurrences(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      delay: String,
      stateTtlMs: Long = 24L * 3600 * 1000): Dataset[Occurrence] = {
    implicit val occEnc = Encoders.product[Occurrence]
    implicit val stEnc = Encoders.product[FpState]
    implicit val strEnc = Encoders.STRING
    implicit val tupEnc = Encoders.tuple(
      Encoders.STRING, Encoders.scalaLong, Encoders.TIMESTAMP)
    // The watermarked column must survive the projection UNTOUCHED: the
    // unsupported-operation checker looks for the watermark attribute in
    // the flatMapGroupsWithState input, and even a cast() mints a fresh
    // attribute without the watermark metadata. `tsCol` must already be
    // a timestamp.
    val keyed = stream
      .withWatermark(tsCol, delay)
      .select(
        md5(TextAnalysis.canonical(col(textCol))).as("fp"),
        col(idCol).cast("long").as("doc_id"),
        col(tsCol).as("ts"))
      .as[(String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
    keyed.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (fp: String, rows: Iterator[(String, Long, java.sql.Timestamp)],
          state: GroupState[FpState]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          var st = state.getOption.getOrElse(FpState(Long.MinValue, 0L))
          var maxTs = Long.MinValue
          val out = rows.map { case (_, docId, ts) =>
            if (ts != null) maxTs = math.max(maxTs, ts.getTime)
            val first = if (st.seen == 0L) docId else st.firstDocId
            st = FpState(first, st.seen + 1)
            Occurrence(fp, docId, st.seen, first)
          }.toVector
          state.update(st)
          // anchor expiry on observed event time, not the watermark: the
          // first batch's watermark is still epoch 0, and an expiry of
          // `0 + ttl` would silently drop all state at the next advance
          state.setTimeoutTimestamp(
            math.max(maxTs, state.getCurrentWatermarkMs()) + stateTtlMs)
          out.iterator
        }
    }
  }
}
