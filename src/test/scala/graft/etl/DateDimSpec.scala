package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DateDimSpec extends SparkSpec {
  import spark.implicits._

  private def dimFor(from: String, to: String) =
    DateDim.fromBounds(Seq((from, to)).toDF("mns", "mxs")
      .selectExpr("CAST(mns AS DATE) AS mn", "CAST(mxs AS DATE) AS mx"))

  test("astronomical season boundaries match the reference's cutoffs") {
    val d = dimFor("2024-01-01", "2024-12-31")
    val seasons = d.select($"full_date".cast("string"), $"season_name")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // reference: spring [Mar 21, Jun 22), summer [Jun 22, Sep 23),
    // autumn [Sep 23, Dec 22), winter otherwise
    assert(seasons("2024-03-20") === "winter")
    assert(seasons("2024-03-21") === "spring")
    assert(seasons("2024-06-21") === "spring")
    assert(seasons("2024-06-22") === "summer")
    assert(seasons("2024-09-22") === "summer")
    assert(seasons("2024-09-23") === "autumn")
    assert(seasons("2024-12-21") === "autumn")
    assert(seasons("2024-12-22") === "winter")
  }

  test("calendar attributes: ISO weekday, weekend flag, year_month") {
    val d = dimFor("2024-01-05", "2024-01-08") // Fri..Mon
    val rows = d.orderBy("full_date")
      .select("day_of_week", "is_weekend", "day_name", "year_month")
      .collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(5, 6, 7, 1))
    assert(rows.map(_.getBoolean(1)).toSeq === Seq(false, true, true, false))
    assert(rows.map(_.getString(2)).toSeq ===
      Seq("Friday", "Saturday", "Sunday", "Monday"))
    assert(rows.forall(_.getString(3) === "2024/01"))
  }

  test("dimension is dense: one row per day, no gaps") {
    val d = dimFor("2023-12-25", "2024-01-05")
    assert(d.count() === 12)
    assert(d.select("full_date").distinct().count() === 12)
  }

  test("extendYears pushes the horizon past the observed max") {
    val obs = Seq("2024-02-29", "2024-03-15").toDF("ds")
      .select(to_date($"ds").as("d"))
    // default 0: exact observed range
    val exact = DateDim.fromObservedRange(obs, "d")
    assert(exact.agg(max($"full_date").cast("string")).head().getString(0)
      === "2024-03-15")
    // +5y: calendar runs to max + 5 years (reference main_pipeline.py:305)
    val extended = DateDim.fromObservedRange(obs, "d", extendYears = 5)
    assert(extended.agg(max($"full_date").cast("string")).head().getString(0)
      === "2029-03-15")
    assert(extended.agg(min($"full_date").cast("string")).head().getString(0)
      === "2024-02-29")
    // still dense across the whole horizon
    val n = extended.count()
    assert(n === extended.select("full_date").distinct().count())
    assert(n > 365 * 5)
  }

  test("gapFillDaily zero-fills silent days and silent groups") {
    val daily = Seq(
      ("a", "2024-01-01", 3L, 30.0),
      ("a", "2024-01-03", 1L, 10.0)) // a misses Jan 2; b has nothing
      .toDF("g", "ds", "n", "v")
      .select($"g", to_date($"ds").as("day"), $"n", $"v")
    val groups = Seq("a", "b").toDF("g")
    val got = DateDim.gapFillDaily(daily, groups, "g", "day",
        lit("2024-01-01"), lit("2024-01-03"), fillCols = Seq("n", "v"))
      .orderBy("g", "day")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("a", "2024-01-01", 3L, 30.0),
      ("a", "2024-01-02", 0L, 0.0),
      ("a", "2024-01-03", 1L, 10.0),
      ("b", "2024-01-01", 0L, 0.0),
      ("b", "2024-01-02", 0L, 0.0),
      ("b", "2024-01-03", 0L, 0.0)))
  }

  test("gapFillDaily raises on a swapped from/to instead of a reversed spine") {
    val daily = Seq(("a", "2024-01-01", 1L)).toDF("g", "ds", "n")
      .select($"g", to_date($"ds").as("day"), $"n")
    val groups = Seq("a").toDF("g")
    val e = intercept[Exception] {
      DateDim.gapFillDaily(daily, groups, "g", "day",
        lit("2024-02-01"), lit("2024-01-01"), fillCols = Seq("n"))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("sequence"), e.getMessage)
  }
}
