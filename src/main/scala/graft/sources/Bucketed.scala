package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: co-locate both sides of a recurring join so
  * the join needs no exchange at read time — the ETL-pipeline answer to
  * "this fact⋈dim join runs every batch, stop shuffling the fact".
  * Bucket count is chosen once at write time; at 100 TB it is sized so a
  * bucket fits an executor core (e.g. 4096 buckets for a 10 TB fact).
  */
object Bucketed {

  /** Write as a bucketed, in-bucket-sorted managed parquet table. Both
    * future join sides must use the SAME key and bucket count for the
    * exchange-free plan. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
