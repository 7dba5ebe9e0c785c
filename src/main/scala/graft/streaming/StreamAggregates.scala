package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming aggregations — the Structured-Streaming analog of the
  * reference's dashboard group-bys (revenue/count by time grain × dim),
  * with event-time watermarks bounding state instead of batch reruns.
  */
object StreamAggregates {

  /** Watermarked tumbling-window aggregation: count + sum of `valueCol`
    * per (window, keys). Records later than `delay` behind the watermark
    * are dropped; a window's state is freed once the watermark passes
    * its end, so state is bounded by delay × key cardinality — the
    * property that lets this run forever on an unbounded stream. */
  def windowedAgg(
      stream: DataFrame,
      tsCol: String,
      delay: String,
      windowLen: String,
      keyCols: Seq[String],
      valueCol: String): DataFrame =
    stream
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLen) +: keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))
}
