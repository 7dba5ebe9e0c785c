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
  * both sides union-tag into one keyed stream, and within
  * `flatMapGroupsWithState` each trigger's rows are processed in
  * (event-time, side) order — right rows extend the carried reference
  * HISTORY, left rows floor-look-up their match — while the history
  * persists across triggers as a small sorted list per key. One shuffle
  * on the key (the state-store key); per-key state is bounded by
  * `maxRefs` and the TTL prune (superseded references older than the
  * TTL horizon drop, except the single newest still-serveable one — a
  * slowly-changing dimension's current value stays valid forever).
  *
  * Retaining a bounded history rather than only the latest reference
  * makes the result independent of MICRO-BATCH SLICING: a reference
  * and an older left event may land in different triggers in either
  * order (the engine controls slicing, not the data), and the floor
  * lookup still serves the correct older reference.
  *
  * Semantics and contracts (matching the batch operator):
  *  - An equal-timestamp right record IS visible to a left event (≤,
  *    the batch default): right sorts before left within a tie.
  *  - The right payload travels as ONE atomic value; pack multiple
  *    columns with `to_json(struct(...))` and unpack downstream —
  *    per-column carries could tear rows, the same reason the batch
  *    operator carries one struct.
  *  - IN-ORDER delivery per key (each side individually, by event
  *    time) is the correctness contract the spec pins against the
  *    batch operator. Genuinely LATE data degrades conservatively: a
  *    left event older than everything in the pruned history emits
  *    NULL, never a wrong attachment.
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

  /** Per-key carried reference history, sorted ascending by tsMs
    * (public for Spark's encoder codegen). */
  case class RefState(refs: Seq[RefEntry])

  /** Wire the two streams into the enrichment.
    *
    * @param left     event stream: `keyCol`, `leftIdCol`, `leftTsCol`
    * @param right    reference stream: `keyCol`, `rightTsCol`,
    *                 `payloadCol` (string — pack structs via to_json)
    * @param delay    watermark delay for both sides
    * @param stateTtlMs how far (event time) past the last sighting a
    *                 key's carried reference survives before the store
    *                 forgets it; also the prune horizon for superseded
    *                 history entries
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
    implicit val stEnc = Encoders.product[RefState]
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
    keyed.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long, rows: Iterator[(Long, Long, java.sql.Timestamp, Int, String)],
          state: GroupState[RefState]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          var refs = state.getOption.map(_.refs.toVector)
            .getOrElse(Vector.empty)
          var maxTs = Long.MinValue
          // event-time order within the trigger, right before left on
          // ties — exactly the batch operator's window sort
          val sorted = rows.toVector.sortBy(t => (t._3.getTime, t._4))
          val out = Vector.newBuilder[AsofEnriched]
          for ((_, id, ts, side, payload) <- sorted) {
            val tMs = ts.getTime
            maxTs = math.max(maxTs, tMs)
            if (side == 0) {
              // keep refs sorted; same-ts re-delivery replaces (the
              // batch determinism contract: right unique per (key, ts))
              val (before, after) = refs.partition(_.tsMs < tMs)
              refs = (before :+ RefEntry(tMs, payload)) ++
                after.dropWhile(_.tsMs == tMs)
            } else {
              // floor lookup: newest reference at or before the event
              refs.reverseIterator.find(_.tsMs <= tMs) match {
                case Some(m) => out += AsofEnriched(key, id, ts,
                  new java.sql.Timestamp(m.tsMs), m.payload)
                case None => out += AsofEnriched(key, id, ts, null, null)
              }
            }
          }
          // prune: drop superseded refs older than the TTL horizon but
          // ALWAYS keep the newest still-serveable one (the current
          // value of a slowly-changing dim never expires); cap at
          // maxRefs newest as the fast-changing-right guard
          val horizon =
            math.max(maxTs, state.getCurrentWatermarkMs()) - stateTtlMs
          val lastBelow = refs.lastIndexWhere(_.tsMs <= horizon)
          if (lastBelow > 0) refs = refs.drop(lastBelow)
          if (refs.size > maxRefs) refs = refs.takeRight(maxRefs)
          state.update(RefState(refs))
          // anchor expiry on observed event time, not the watermark (the
          // first batch's watermark is still epoch 0 — same as dedup)
          state.setTimeoutTimestamp(
            math.max(maxTs, state.getCurrentWatermarkMs()) + stateTtlMs)
          out.result().iterator
        }
    }
  }
}
