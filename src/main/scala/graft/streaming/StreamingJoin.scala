package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the attribution shape
  * (click ⋈ impression within a time bound) and the only Structured
  * Streaming join family with unbounded state risk, which the interval
  * bound + both-side watermarks are exactly what tames: Spark derives
  * from them how long each side's rows must stay buffered in the state
  * store and evicts everything older.
  *
  * Scale shape: one shuffle per side, both keyed on the join key (the
  * state-store key); state per key is bounded by (watermark delay +
  * interval width) × arrival rate, independent of stream history.
  * Works identically on batch frames (the interval condition is just a
  * range predicate there).
  */
object StreamingJoin {

  /** Join `left` and `right` on `keyCol`, keeping pairs where
    * `right.tsCol` falls within `[left.tsCol - beforeMs, left.tsCol +
    * afterMs]`. Right columns are suffixed `_r` (the key and both
    * timestamps keep their roles). Inner join — unmatched rows on
    * either side drop, so append-mode output is exactly-once once both
    * watermarks pass.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      delay: String,
      beforeMs: Long,
      afterMs: Long): DataFrame = {
    require(beforeMs >= 0 && afterMs >= 0,
      s"interval bounds must be >= 0, got ($beforeMs, $afterMs)")
    val l = left.withWatermark(tsCol, delay).alias("l")
    val renamed = right.columns.foldLeft(right) { (df, c) =>
      if (c == keyCol || c == tsCol) df
      else df.withColumnRenamed(c, s"${c}_r")
    }
    val r = renamed
      .withColumnRenamed(keyCol, s"${keyCol}_r")
      .withColumnRenamed(tsCol, s"${tsCol}_r")
      .withWatermark(s"${tsCol}_r", delay)
      .alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.${keyCol}_r") &&
        col(s"r.${tsCol}_r") >=
          (col(s"l.$tsCol") - expr(s"INTERVAL ${beforeMs} MILLISECOND")) &&
        col(s"r.${tsCol}_r") <=
          (col(s"l.$tsCol") + expr(s"INTERVAL ${afterMs} MILLISECOND")))
      .drop(col(s"r.${keyCol}_r"))
  }
}
