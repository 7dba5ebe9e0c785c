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
  /** Floor division staying entirely in LONG arithmetic. `floor(a/b)`
    * via Double is exact only below 2^53; above (nanosecond-epoch
    * timestamps ~1.7e18) bucket ids drift off the true floor — pairs
    * still meet (double rounding is monotone, so a point's bucket
    * always falls inside its interval's covered range) but bucket
    * POPULATIONS shift unpredictably versus the declared width, and the
    * operator's contract is bare LONG. `a − pmod(a,b)` is an exact
    * multiple of b, and integral `div` of an exact multiple IS the
    * floor quotient (also for negative a, where truncating and
    * flooring agree on multiples). */
  private def floorDiv(a: org.apache.spark.sql.Column, b: Long): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    val num = a - pmod(a, lit(b))
    GraftColumnBridge.column(new IntegralDivide(
      GraftColumnBridge.expression(num),
      GraftColumnBridge.expression(lit(b))))
  }

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
        explode(sequence(floorDiv(start, bucketWidth),
          floorDiv(end - 1, bucketWidth))))
    val pt = points.withColumn("_rj_bkt", floorDiv(col(ptCol), bucketWidth))
    iv.join(pt, Seq("_rj_bkt"))
      .where(col(ptCol) >= start && col(ptCol) < end)
      .drop("_rj_bkt")
  }
}
