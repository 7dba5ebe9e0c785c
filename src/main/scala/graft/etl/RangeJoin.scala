package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval⋈point joins WITHOUT an equi-key. Spark plans a bare
  * `pt >= start AND pt < end` join as BroadcastNestedLoopJoin — every
  * point against every interval, quadratic and driver-memory-bound.
  * Here time is discretized into fixed-width buckets: each interval
  * explodes across the buckets it covers, each point lands in exactly
  * ONE bucket, and the join becomes a plain shuffled equi-join on the
  * bucket id with the exact range predicate as a residual filter.
  *
  * Because a point has exactly one bucket, every qualifying
  * (interval, point) pair meets in exactly one bucket — no dedup pass.
  *
  * Scale shape: shuffle keys on the bucket id; per-bucket work is
  * |intervals covering bucket| × |points in bucket|. `bucketWidth` is
  * the knob: ~the typical interval length keeps the explosion factor
  * near 2 while keeping buckets narrow; hot buckets (a flash-crowd
  * second) can further split with [[Skew.saltedEquiJoin]] on the
  * interval side if needed.
  */
object RangeJoin {

  /** Join `points` (at `ptCol`, LONG) into `intervals`
    * ([`startCol`, `endCol`) half-open, LONG) — all rows of both sides
    * with `start <= pt < end`, no equi-key required.
    */
  def intervalPointJoin(
      intervals: DataFrame,
      points: DataFrame,
      startCol: String,
      endCol: String,
      ptCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val start = col(startCol)
    val end = col(endCol)
    // half-open: an interval touching a bucket only at its exclusive end
    // does not cover it ((end-1) is the last covered tick)
    val iv = intervals
      .where(start < end)
      .withColumn("_rj_bkt",
        explode(sequence(floor(start / bucketWidth),
          floor((end - 1) / bucketWidth))))
    val pt = points.withColumn("_rj_bkt", floor(col(ptCol) / bucketWidth))
    iv.join(pt, Seq("_rj_bkt"))
      .where(col(ptCol) >= start && col(ptCol) < end)
      .drop("_rj_bkt")
  }
}
