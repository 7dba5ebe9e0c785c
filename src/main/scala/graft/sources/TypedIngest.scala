package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, StructType}

/** Typed-schema ingest enforcement: the coercions the reference applies
  * while funnelling BigQuery pages through pandas
  * (reference: include/scripts/modules/ingest_utils.py:21-75 — stringly
  * floats → Int, money strings → Decimal(7,2)/(9,2), NaN → NULL),
  * re-expressed as pure column operators so they run distributed at scan
  * speed instead of on a single driver.
  */
object TypedIngest {

  /** Stringly float → integer: "123.0" → 123, like the reference's
    * `str.split('.')[0].astype('Int64')`; malformed input → NULL
    * (try_cast — under default ANSI mode a plain cast would throw). */
  def intFromStringlyFloat(c: Column): Column =
    split(c, "\\.").getItem(0).try_cast(LongType)

  /** Money string → exact decimal (reference casts to Decimal(7,2) /
    * Decimal(9,2) after pandas); unparsable → NULL. */
  def moneyFromString(c: Column, precision: Int = 9, scale: Int = 2): Column =
    c.try_cast(DecimalType(precision, scale))

  /** NaN → NULL for floating columns (the reference's
    * `df.replace([np.nan], [None])`). */
  def nanToNull(c: Column): Column =
    when(isnan(c), lit(null)).otherwise(c)

  /** Enforce a target schema by casting every listed column; columns
    * absent from the spec pass through untouched. */
  def enforce(df: DataFrame, schema: StructType): DataFrame =
    schema.fields.foldLeft(df) { (d, f) =>
      if (d.columns.contains(f.name)) d.withColumn(f.name, col(f.name).cast(f.dataType))
      else d
    }
}
