package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rolling `window`-day distinct actives per day — the rolling
  * WAU/MAU engagement series behind the reference's dashboard family
  * (q57 is the 7-day instance). Exact distinct over a trailing window
  * is not window-function-expressible (distinct sets don't merge by
  * subtraction), so the operator ships TWO tiers with an automatic
  * cutover:
  *
  * EXACT tier (short windows): dedup the events to (user, day) pairs —
  * one map-side-combinable aggregation bounded by active pairs, not
  * events — then fan each pair out to the ≤ `window` report days it
  * covers and count distinct per report day. The shuffle multiplier IS
  * the window length: fine at 7, a 90-day window would shuffle 90× the
  * active-pair volume, which is why the tier is CAPPED.
  *
  * SKETCH tier (long windows): collapse each day to ONE mergeable HLL
  * sketch (DataSketches HLL via `hll_sketch_agg` — the same register
  * representation "HyperLogLog in Practice", Heule et al., CACM 2013
  * analyzes), fan out per-DAY sketches to the report days they cover,
  * and merge `window` sketches per report day. The windowed fan-out
  * multiplies days × sketch-bytes — METADATA scale (a 10-year daily
  * series at a 90-day window is ~3.3·10⁵ KB-sized rows), independent
  * of user volume — while the only data-volume shuffle is the one
  * per-day pre-aggregation. Estimates carry the standard HLL relative
  * error ≈ 1.04/√(2^lgConfigK) (~1.6 % at the default lgK = 12);
  * [[RollingActivesSpec]] proves the tier tracks the exact tier within
  * 3·rsd at a 90-day window.
  *
  * Report days are restricted to days that actually have events, so
  * both tiers emit the same left-total dashboard series shape.
  */
object RollingActives {

  /** Exact tier. `pairs`: a frame with (userCol, dayCol) — pre-dedup
    * not required. Output: (report_day, active) exact distinct counts. */
  def exact(pairs: DataFrame, userCol: String, dayCol: String,
      window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val ud = pairs.select(col(userCol).as("_ra_user"), col(dayCol).as("_ra_day"))
      .distinct()
    val days = ud.select(col("_ra_day").as("report_day")).distinct()
    ud.withColumn("report_day",
        explode(sequence(col("_ra_day"), col("_ra_day") + (window - 1))))
      .join(days, "report_day")
      .groupBy(col("report_day"))
      .agg(countDistinct(col("_ra_user")).as("active"))
  }

  /** Sketch tier: per-day HLL registers merged across the window.
    * Output: (report_day, active) estimates. */
  def sketch(pairs: DataFrame, userCol: String, dayCol: String,
      window: Int, lgConfigK: Int = 12): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    // one data-volume shuffle: days × sketch — everything after is
    // metadata-scale
    val daily = pairs
      .groupBy(col(dayCol).as("_ra_day"))
      .agg(hll_sketch_agg(col(userCol), lgConfigK).as("_ra_sk"))
    val days = daily.select(col("_ra_day").as("report_day"))
    daily.withColumn("report_day",
        explode(sequence(col("_ra_day"), col("_ra_day") + (window - 1))))
      .join(days, "report_day")
      .groupBy(col("report_day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("_ra_sk")))
        .as("active"))
  }

  /** Auto-tiered rolling actives: exact fan-out while the shuffle
    * multiplier stays ≤ `maxExactWindow` (default 14 — the fan-out is
    * provably bounded by it), HLL registers beyond. The estimate
    * column is named `active` in both tiers so a dashboard consumer
    * is tier-agnostic. */
  def rolling(pairs: DataFrame, userCol: String, dayCol: String,
      window: Int, maxExactWindow: Int = 14, lgConfigK: Int = 12): DataFrame =
    if (window <= maxExactWindow) exact(pairs, userCol, dayCol, window)
    else sketch(pairs, userCol, dayCol, window, lgConfigK)
}
