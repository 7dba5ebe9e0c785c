package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture apply: fold an op log (upserts + delete
  * tombstones, Debezium shape) into a keyed state table. Distinct from
  * [[Scd]]: SCD2 keeps every historical period; CDC maintains CURRENT
  * state, and a delete removes the key from the serving view.
  *
  * Tombstones are RETAINED in the state (the op column survives the
  * merge): dropping a deleted key outright would let a LATER batch
  * carrying an OLDER update resurrect it — the property test's
  * composition invariant `apply(apply(s,a),b) == apply(s, a∪b)` holds
  * for ANY split of the log precisely because the tombstone keeps
  * competing by timestamp. [[current]] is the serving view (tombstones
  * filtered); [[compact]] physically drops tombstones older than the
  * replication lateness bound — the batch analog of a streaming
  * watermark.
  *
  * Plan shape: ONE aggregation keyed on the key — `max_by` over the
  * (ts, tie) struct, so partial aggregation collapses each partition's
  * rows map-side and only one candidate row per (key, partition) ever
  * shuffles. The window formulation (`row_number() ... rn = 1`)
  * shuffles every log row; at 100 TB of CDC history that difference is
  * the whole game. */
object Cdc {

  /** Merge a change batch into the state. Both sides share the log
    * schema: key + payload + tsCol + tieCol + opCol ('U' upsert /
    * 'D' tombstone); start from `log.where(lit(false))` for an empty
    * initial state. Latest (ts, tie) wins per key.
    *
    * @param tieCol unique-per-ts tiebreaker (e.g. the log sequence id)
    *               so "latest" is total and deterministic */
  def applyLog(
      state: DataFrame,
      log: DataFrame,
      key: String,
      tsCol: String,
      tieCol: String,
      opCol: String): DataFrame = {
    val cols = log.columns
    require(cols.contains(opCol), s"log has no op column '$opCol'")
    val payload = cols.filterNot(_ == key)
    // backtick-quote every name-derived column reference (and use
    // getField for the struct projection): a payload column whose name
    // contains a dot would otherwise parse as a nested path
    def qcol(n: String) = col(s"`$n`")
    state.select(cols.map(qcol): _*)
      .unionByName(log)
      .groupBy(qcol(key))
      .agg(max_by(
        struct(payload.map(qcol): _*),
        struct(qcol(tsCol), qcol(tieCol))).as("_last"))
      .select(qcol(key) +: payload.map(c => col("_last").getField(c).as(c)): _*)
  }

  /** The serving view: live rows only, op column dropped. */
  def current(state: DataFrame, opCol: String): DataFrame =
    state.where(col(opCol) =!= "D").drop(opCol)

  /** Drop tombstones no late batch can still contend with: a 'D' row
    * with ts < `horizon` goes away (any op older than the horizon is
    * promised never to arrive — the replication lateness contract).
    * Live rows are never compacted. */
  def compact(
      state: DataFrame,
      tsCol: String,
      opCol: String,
      horizon: Column): DataFrame =
    state.where(col(opCol) =!= "D" || col(tsCol) >= horizon)
}
