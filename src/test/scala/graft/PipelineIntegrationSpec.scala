package graft

import graft.etl.{Cleaning, DateDim, Scd, StarSchema}
import org.apache.spark.sql.functions._

/** End-to-end warehouse assembly from library pieces — the flow a user
  * of the reference runs daily (clean → SCD dims → date dim →
  * point-in-time fact build → measures), on one synthetic dataset with
  * known answers. */
class PipelineIntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("raw changes + sales build a consistent star with correct measures") {
    // entity change log with an intra-day flip-flop on store 1
    val changes = Seq(
      (1L, "2024-01-01", "ACME DOWNTOWN"),
      (1L, "2024-01-01", "ACME DT"),        // same-day flip-flop
      (1L, "2024-01-02", "ACME DOWNTOWN"),  // next day resolves it
      (1L, "2024-01-10", "ACME CENTRAL"),   // real rename
      (2L, "2024-01-03", "BEVCO")
    ).toDF("store", "ds", "store_name")
      .selectExpr("store", "CAST(ds AS DATE) AS d", "store_name")

    // 1. clean intra-day flip-flops (reference: remove_one_day_changes)
    val cleaned = Cleaning.removeOneDayChanges(changes, "store_name", "store", "d")
    // 2. SCD2 store dimension
    val dimStore = Scd.scd2FromRecords(cleaned, "store", Seq("store_name"), "d")
    // flip-flop resolved: store 1 has exactly DOWNTOWN then CENTRAL
    val s1 = dimStore.where($"store" === 1).orderBy("start_date")
      .select("store_name", "is_current").collect()
      .map(r => (r.getString(0), r.getBoolean(1)))
    assert(s1.toSeq === Seq(("ACME DOWNTOWN", false), ("ACME CENTRAL", true)))

    // raw sales with an invalid row and an unknown store
    val sales = Seq(
      (100L, 1L, "2024-01-05", 3, 10.00),   // DOWNTOWN period
      (101L, 1L, "2024-01-15", 2, 25.00),   // CENTRAL period
      (102L, 2L, "2024-01-04", 5, 4.00),
      (103L, 9L, "2024-01-05", 1, 7.00),    // store not in dim
      (104L, 1L, "2024-01-05", 0, 9.99)     // invalid: zero quantity
    ).toDF("sale_id", "store", "ds", "qty", "unit_price")
      .selectExpr("sale_id", "store", "CAST(ds AS DATE) AS sale_date",
        "qty", "unit_price")
      .where($"qty" > 0 && $"unit_price" > 0) // 3. validity filter

    // 4. point-in-time join to the SCD dim
    val withDim = Scd.pointInTimeJoin(sales, dimStore, "store", "sale_date")
    val named = withDim.select("sale_id", "dim_store_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(named === Map(
      100L -> "ACME DOWNTOWN", 101L -> "ACME CENTRAL", 102L -> "BEVCO"))

    // 5. unknown member for the unmatched store (left-join route)
    val withUnknown = StarSchema.joinWithUnknownMember(
      sales, dimStore.where($"is_current")
        .select($"store", $"store_name"), "store",
      Map("store_name" -> "unknown"))
    assert(withUnknown.where($"sale_id" === 103L).head()
      .getAs[String]("store_name") === "unknown")

    // 6. date dimension spans the sales range and joins totally
    val dates = DateDim.fromObservedRange(sales, "sale_date")
    assert(dates.count() === 12) // 01-04 .. 01-15
    assert(sales.join(dates, sales("sale_date") === dates("full_date"))
      .count() === sales.count())

    // 7. exact money measures
    val measured = withDim.withColumn("revenue_usd",
      StarSchema.money($"qty") * StarSchema.money($"unit_price"))
    val total = measured.agg(sum($"revenue_usd")).head().getDecimal(0)
    assert(total.toString === "100.0000") // 3*10 + 2*25 + 5*4
  }
}
