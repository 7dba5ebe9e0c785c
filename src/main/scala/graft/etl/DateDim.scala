package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Calendar dimension generator.
  *
  * reference: dags/main_pipeline.py `create_date_table` — the reference
  * collects min/max dates to the driver and builds the calendar in pandas;
  * here the whole dimension is a `sequence`+`explode` over the min/max
  * aggregate, so it never leaves the cluster. Season boundaries match the
  * reference (spring [Mar 21, Jun 22), summer [Jun 22, Sep 23), autumn
  * [Sep 23, Dec 22), winter otherwise).
  */
object DateDim {

  private def seasonNumber(m: Column, d: Column): Column =
    when((m === 3 && d >= 21) || m.isin(4, 5) || (m === 6 && d < 22), 1)
      .when((m === 6 && d >= 22) || m.isin(7, 8) || (m === 9 && d < 23), 2)
      .when((m === 9 && d >= 23) || m.isin(10, 11) || (m === 12 && d < 22), 3)
      .otherwise(4)

  /** Expand one row holding `mn`/`mx` DATE bounds into the dimension. */
  def fromBounds(bounds: DataFrame): DataFrame = {
    val days = bounds.select(
      explode(sequence(col("mn"), col("mx"))).as("full_date"))
    val m = month(col("full_date"))
    val dom = dayofmonth(col("full_date"))
    val dow = weekday(col("full_date")) + 1 // ISO: Monday=1 .. Sunday=7
    val sn = seasonNumber(m, dom)
    days.select(
      col("full_date"),
      dayofyear(col("full_date")).as("day_of_year"),
      dom.as("day_of_month"),
      dow.as("day_of_week"),
      date_format(col("full_date"), "EEEE").as("day_name"),
      (dow >= 6).as("is_weekend"),
      sn.as("season_number"),
      when(sn === 1, "spring").when(sn === 2, "summer")
        .when(sn === 3, "autumn").otherwise("winter").as("season_name"),
      m.as("month_number"),
      date_format(col("full_date"), "MMMM").as("month_long_name"),
      date_format(col("full_date"), "MMM").as("month_short_name"),
      year(col("full_date")).as("year"),
      date_format(col("full_date"), "yyyy/MM").as("year_month"))
  }

  /** Append the −1 unknown calendar member so facts with a null or
    * out-of-range date still have a dimension row to land on.
    *
    * reference: include/scripts/sql/insert_unknown_into_date_table.sql:1-9
    * — `VALUES(-1, DATEFROMPARTS(1900,1,1), -1, …, 'unknown', CAST(0 AS
    * bit), …)`. The literal for each attribute is derived from its TYPE,
    * exactly the reference's convention: dates → 1900-01-01, numbers →
    * −1, strings → 'unknown', booleans → false. Works on the plain
    * calendar and on one keyed by [[SurrogateKeys.assign]] (the
    * surrogate column is numeric → −1, the reference's DateId).
    */
  def withUnknownMember(dim: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val unknownRow = dim.sparkSession.range(1).select(dim.schema.fields.map { f =>
      val v: Column = f.dataType match {
        case DateType => to_date(lit("1900-01-01"))
        case TimestampType => to_timestamp(lit("1900-01-01"))
        case StringType => lit("unknown")
        case BooleanType => lit(false)
        case _: NumericType => lit(-1).cast(f.dataType)
        case other => lit(null).cast(other)
      }
      v.as(f.name)
    }: _*)
    dim.unionByName(unknownRow)
  }

  /** Build the dimension spanning the observed range of `dateCol`,
    * optionally extended `extendYears` past the observed max so facts
    * dated beyond the last build still find their date key (reference:
    * dags/main_pipeline.py:305 extends the calendar to max_date +
    * 5 years). Default 0 keeps the exact observed range. */
  def fromObservedRange(
      df: DataFrame,
      dateCol: String,
      extendYears: Int = 0): DataFrame =
    fromBounds(df.agg(
      min(to_date(col(dateCol))).as("mn"),
      add_months(max(to_date(col(dateCol))), extendYears * 12).as("mx")))

  /** Zero-fill a daily aggregate against a calendar spine: dashboards
    * must chart 0 — not a missing point — for (group, day) combinations
    * with no fact rows. The spine is `groups × [from, to]`
    * (dashboard-scale by construction: |groups| · |days| rows, both
    * sides of the cross product tiny next to the fact); the pre-
    * aggregated `daily` frame left-joins it and `fillCols` coalesce
    * to 0.
    *
    * `groups` is its own frame (typically `fact.select(g).distinct()`
    * over FULL history) so a group silent in this slice still charts.
    *
    * @param daily pre-aggregated (groupCol, dateCol, measures…) —
    *              aggregate BEFORE the spine join, never after: the
    *              spine must meet |groups|·|days| rows, not the fact
    */
  def gapFillDaily(
      daily: DataFrame,
      groups: DataFrame,
      groupCol: String,
      dateCol: String,
      from: Column,
      to: Column,
      fillCols: Seq[String]): DataFrame = {
    // explicit +1 day step: sequence(start, stop) silently defaults to
    // step -1 when start > stop, turning a swapped-argument bug into a
    // plausible-looking reversed spine; with a positive step Spark
    // raises instead
    val days = groups.sparkSession.range(1)
      .select(explode(sequence(from.cast("date"), to.cast("date"),
        expr("interval 1 day"))).as(dateCol))
    val spine = groups.select(col(groupCol)).distinct()
      .crossJoin(broadcast(days))
    spine
      .join(daily, Seq(groupCol, dateCol), "left")
      .na.fill(0, fillCols)
  }
}
