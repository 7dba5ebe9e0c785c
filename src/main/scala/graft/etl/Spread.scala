package graft.etl

import org.apache.spark.sql.{Column, DataFrame}

/** Conditional fan-out for under-partitioned inputs.
  *
  * A single-row-group parquet file (the toy-scale shape of the test
  * corpus) scans as ONE task, serializing every downstream CPU-heavy
  * narrow stage. The cure — `repartition(key)` — must not be applied
  * unconditionally: at corpus scale the source already splits into
  * thousands of tasks, and an unconditional repartition becomes a
  * full-corpus raw-byte shuffle executed for nothing. This helper
  * shuffles ONLY when the input has fewer partitions than the
  * cluster's parallelism, so the toy case spreads and the 100 TB case
  * is untouched (the returned frame is the input object itself — no
  * plan node is added at all).
  */
object Spread {

  /** Repartition `df` by `key` iff it has fewer partitions than
    * `minPartitions` (default: the cluster's default parallelism —
    * below that, cores sit idle). Computing the partition count forces
    * file listing on a scan, which the query would pay anyway. */
  def byKeyIfNarrow(
      df: DataFrame,
      key: Column,
      minPartitions: Int = 0): DataFrame = {
    val floor =
      if (minPartitions > 0) minPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= floor) df
    else df.repartition(key)
  }
}
