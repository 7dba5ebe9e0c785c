package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Star-schema assembly: static dimension builders, fact flattening and
  * the derived money measures.
  *
  * reference: include/scripts/create_update_liqour_sales_fact_table.py —
  * dim joins (`join_dim_df`), unknown-member backfill
  * (`fill_na_in_county_columns` + insert_unknown_*.sql) and measures
  * (TotalCost/Revenue/GrossProfit/Margin).
  *
  * Money arithmetic is done in DECIMAL so results are exact and
  * engine-portable; ratios are emitted as rounded doubles.
  */
object StarSchema {

  /** Exact money type (test data carries 2-dp values in doubles; the
    * DECIMAL(12,2) cast is lossless and makes all downstream arithmetic
    * exact and engine-portable). */
  def money(c: Column): Column = c.cast("decimal(12,2)")

  /** Exact rate type for discount/tax factors. */
  def rate(c: Column): Column = c.cast("decimal(4,2)")

  /** revenue = extendedprice × (1 − discount), exact. */
  def revenue(price: Column, discount: Column): Column =
    money(price) * (lit(1).cast("decimal(4,2)") - rate(discount))

  /** charge = revenue × (1 + tax), exact. */
  def charge(price: Column, discount: Column, tax: Column): Column =
    revenue(price, discount) * (lit(1).cast("decimal(4,2)") + rate(tax))

  /** Distinct-lookup dimension (reference: DAG `create_county_dim`). */
  def distinctDim(src: DataFrame, cols: Seq[String]): DataFrame =
    src.select(cols.map(col): _*).distinct()

  /** Cross-join-of-distincts dimension
    * (reference: DAG `create_packaging_dim` — DISTINCT pack × DISTINCT
    * bottle_volume_ml). Both sides are tiny distinct sets, so the cross
    * join is broadcast and cheap at any fact scale. */
  def crossDim(src: DataFrame, colA: String, colB: String): DataFrame =
    src.select(col(colA)).distinct()
      .crossJoin(broadcast(src.select(col(colB)).distinct()))

  /** Left-join a dimension and coalesce misses to the unknown member
    * (reference: insert_unknown_*.sql + fillna(-1)). `defaults` maps each
    * dim attribute column to its unknown-member literal. */
  def joinWithUnknownMember(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      defaults: Map[String, Any]): DataFrame = {
    val joined = fact.join(broadcast(dim), Seq(key), "left")
    defaults.foldLeft(joined) { case (d, (c, dflt)) =>
      d.withColumn(c, coalesce(col(c), lit(dflt)))
    }
  }
}
