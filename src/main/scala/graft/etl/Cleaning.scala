package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record-cleaning operators from the reference's ingest layer. */
object Cleaning {

  /** Resolve intra-day attribute flip-flops: when a natural key shows >1
    * distinct value of `valueCol` on one date, replace that date's values
    * with the value observed on the key's next active date.
    *
    * reference: include/scripts/modules/ingest_utils.py:83
    * `remove_one_day_changes`. Faithful to the reference's join plan —
    * including its fan-out when the next day itself has several values —
    * but without the driver-side `duplicates.count()` gate: when there are
    * no duplicates the joins are empty and the input passes through
    * unchanged, so no eager action is needed.
    *
    * All three shuffles key on the natural key (AQE coalesces the tiny
    * intermediate sides), so the operator scales with the fact table.
    */
  def removeOneDayChanges(
      df: DataFrame,
      valueCol: String,
      naturalKey: String,
      dateCol: String): DataFrame = {
    val duplicates = df
      .groupBy(col(naturalKey), col(dateCol))
      .agg(count_distinct(col(valueCol)).as("count_dist"))
      .where(col("count_dist") > 1)
      .select(col(naturalKey).as("dup_nk"), col(dateCol).as("dup_d"))

    val nextDay = df
      .join(duplicates, df(naturalKey) === col("dup_nk"), "inner")
      .where(df(dateCol) > col("dup_d"))
      .groupBy(col("dup_nk"), col("dup_d"))
      .agg(min(df(dateCol)).as("min_date"))

    val nextValue = df
      .join(nextDay, df(naturalKey) === col("dup_nk"), "inner")
      .where(df(dateCol) === col("min_date"))
      .select(
        col("dup_nk"),
        col("dup_d"),
        df(valueCol).as("new_value"))

    df.join(
        nextValue,
        df(naturalKey) === col("dup_nk") && df(dateCol) === col("dup_d"),
        "left")
      .withColumn(
        valueCol,
        coalesce(col("new_value"), df(valueCol)))
      .drop("dup_nk", "dup_d", "new_value")
  }

  /** Null-to-default dimension key / attribute fill.
    * reference: create_store_dim.py:33 `fillna({...: 'unknown'/-1})`. */
  def fillUnknown(
      df: DataFrame,
      stringCols: Seq[String],
      numCols: Seq[String],
      unknownString: String = "unknown",
      unknownNum: Long = -1L): DataFrame = {
    val filledStr = df.na.fill(unknownString, stringCols)
    filledStr.na.fill(unknownNum, numCols)
  }
}
