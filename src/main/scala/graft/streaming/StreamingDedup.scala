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
  *    duplicates must be logged/attributed, not silently dropped.
  *    Occurrence numbers are EVENT-TIME ranks, not arrival ranks:
  *    arriving documents buffer until the watermark passes STRICTLY
  *    beyond their event time and only then number off in (ts, docId)
  *    order — by then every earlier-timestamped document the engine's
  *    late filter can still admit has arrived (any future arrival has
  *    ts ≥ wm > every flushed ts, whether the filter drops at < or ≤
  *    the watermark), so the numbering equals the batch row_number
  *    over (ts, docId) under ANY micro-batch slicing or cross-batch
  *    reordering (StreamingDedupSpec asserts it on shuffled slicings). Carried
  *    state per key is two scalars (first doc id, count) plus the
  *    documents inside the watermark lag; expiry is an EVENT-time
  *    timeout once the watermark passes last-sight + TTL
  *    (processing-time timeouts would busy-loop no-data micro-batches
  *    just to fire timers; event-time timers ride the watermark).
  *
  * Scale shape: both tiers shuffle once on the fingerprint (the state
  * store key); per-key state is O(1) + the watermark-lag buffer;
  * watermark/TTL bounds total state by
  * distinct-fingerprints-per-horizon, not by stream history.
  *
  * [[distinctByFingerprint]] keeps the built-in's first-ARRIVAL pick:
  * which physical row represents a fingerprint may vary with slicing,
  * but the emitted fingerprint SET (one row each) is slicing-invariant
  * — use [[annotateOccurrences]] (occurrence == 1) when the
  * representative itself must be deterministic.
  */
object StreamingDedup {

  /** Event emitted by [[annotateOccurrences]]. */
  case class Occurrence(
      fp: String,
      docId: Long,
      occurrence: Long,
      firstDocId: Long)

  /** One buffered document awaiting watermark passage (public for
    * encoder codegen). */
  case class PendDoc(docId: Long, tsMs: Long)

  /** Internal per-fingerprint state: numbered-off scalars, documents
    * still inside the watermark lag, newest event time seen (anchors
    * the TTL). Public only because Spark's encoder codegen needs
    * constructor/accessor visibility. */
  case class FpState(
      firstDocId: Long, seen: Long, pend: Seq[PendDoc], lastMs: Long)

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
    * @param stateTtlMs how far (event time) past its LAST SIGHTING a
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
    /** Number off every buffered document the watermark has passed
      * STRICTLY (ts < wm), in (ts, docId) order — any document the
      * engine can still deliver has ts ≥ wm > every flushed ts
      * (whether the late filter drops at < or ≤ the watermark), so
      * flushed numbering is final. Shared by data and timeout paths;
      * returns the emissions after updating/arming state. */
    def flush(
        fp: String,
        st: FpState,
        state: GroupState[FpState]): Iterator[Occurrence] = {
      val wm = state.getCurrentWatermarkMs()
      val (ripe, wait) = st.pend.partition(_.tsMs < wm)
      var first = st.firstDocId
      var seen = st.seen
      val out = ripe.sortBy(p => (p.tsMs, p.docId)).map { p =>
        if (seen == 0L) first = p.docId
        seen += 1
        Occurrence(fp, p.docId, seen, first)
      }
      // expiry anchors on observed event time (last sighting), never
      // the watermark — anchoring on wm would extend a key's life by
      // however far a heartbeat raced ahead
      val expiry = st.lastMs + stateTtlMs
      state.update(FpState(first, seen, wait, st.lastMs))
      // wake once the watermark is strictly past the oldest waiting
      // document (to number it off), else at TTL expiry — a timeout
      // that fires with nothing pending IS the expiry (removal happens
      // on that path)
      val wake =
        if (wait.nonEmpty) wait.map(_.tsMs).min + 1 else expiry
      state.setTimeoutTimestamp(math.max(wake, wm + 1))
      out.iterator
    }

    keyed.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (fp: String, rows: Iterator[(String, Long, java.sql.Timestamp)],
          state: GroupState[FpState]) =>
        val stored = state.getOption.getOrElse(
          FpState(Long.MinValue, 0L, Vector.empty, Long.MinValue))
        if (state.hasTimedOut) {
          if (stored.pend.isEmpty) { state.remove(); Iterator.empty }
          else flush(fp, stored, state)
        } else {
          // the cleanup timer only fires on a watermark ADVANCE; a key
          // can receive fresh data first, so honor a lapsed TTL eagerly
          // — a post-expiry duplicate is a fresh first occurrence
          // either way (the documented contract)
          val st0 =
            if (stored.seen > 0 && stored.pend.isEmpty &&
                state.getCurrentWatermarkMs() >= stored.lastMs + stateTtlMs)
              FpState(Long.MinValue, 0L, Vector.empty, Long.MinValue)
            else stored
          var pend = st0.pend.toVector
          var lastMs = st0.lastMs
          rows.foreach { case (_, docId, ts) =>
            val tMs = ts.getTime
            lastMs = math.max(lastMs, tMs)
            pend = pend :+ PendDoc(docId, tMs)
          }
          flush(fp, FpState(st0.firstDocId, st0.seen, pend, lastMs), state)
        }
    }
  }
}
