package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the QA step a warehouse load runs
  * before publishing a table (row counts, null counts, exact distinct
  * cardinalities, ranges, exact decimal sums).
  *
  * Plan shape: ONE scan and ONE aggregation produce every stat for
  * every profiled column at once (the naive per-column loop re-scans
  * the table N times — at 100 TB that is N× the I/O). The wide 1-row
  * aggregate is then unpivoted driver-free with `stack`. Exact
  * count(DISTINCT) over several columns expands to the standard
  * Spark multi-distinct plan; for quick-look profiling at extreme
  * cardinalities, swap in approx_count_distinct.
  */
object Profiler {

  /** Profile numeric columns: one output row per column with
    * n_rows / n_nulls / n_distinct / min / max / exact decimal(18,2)
    * sum. */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        sum(col(c).cast("decimal(18,2)")).as(s"${c}__sum"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max, ${c}__sum"
    }.mkString(", ")
    wide.selectExpr(
      "n_rows",
      s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_nulls, n_distinct, min_v, max_v, sum_v)")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_v"), col("max_v"), col("sum_v"))
  }
}
