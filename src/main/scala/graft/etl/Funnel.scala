package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential conversion funnels over an event stream: for an ordered
  * list of step event types, each user's step-k time is the EARLIEST
  * occurrence of that type strictly after their step-(k−1) time — the
  * standard product-analytics funnel (a user must view before a click
  * counts, click before a purchase counts).
  *
  * Plan shape: one aggregation per step, all keyed on the user (the
  * per-step join reuses the same hash partitioning), so an n-step
  * funnel is n small user-keyed shuffles over pre-filtered slices of
  * the stream — never a window over the whole event history. */
object Funnel {

  /** Per-user step times: (`keyCol`, `t_1` .. `t_n` epoch micros,
    * NULL from the first unreached step onward). */
  def funnelTimes(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val us = unix_micros(col(tsCol))
    val first = events.where(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(us).as("t_1"))
    steps.zipWithIndex.tail.foldLeft(first) { case (acc, (step, i)) =>
      val k = i + 1
      val next = events.where(col(typeCol) === step)
        .select(col(keyCol), us.as("_us"))
        .join(acc.select(col(keyCol), col(s"t_$i")), keyCol)
        .where(col("_us") > col(s"t_$i"))
        .groupBy(col(keyCol)).agg(min(col("_us")).as(s"t_$k"))
      acc.join(next.select(col(keyCol), col(s"t_$k")), Seq(keyCol), "left")
    }
  }

  /** Funnel rollup: one row per step with how many users reached it
    * (monotonically non-increasing down the funnel). Step labels are
    * `step<k>_<type>` so the output orders by funnel position. */
  def funnelCounts(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    // step names ride inside a selectExpr string literal below — keep
    // them to word characters so a quote cannot break the parse
    steps.foreach(s => require(s.matches("[A-Za-z0-9_-]+"),
      s"step name '$s' must match [A-Za-z0-9_-]+"))
    val times = funnelTimes(events, keyCol, tsCol, typeCol, steps)
    // coalesce: an empty funnel (nobody reached step 1) must report 0
    // per step, not NULL (sum over zero rows)
    val aggs = steps.indices.map(i =>
      coalesce(sum(col(s"t_${i + 1}").isNotNull.cast("long")), lit(0L))
        .as(s"_c${i + 1}"))
    val wide = times.agg(aggs.head, aggs.tail: _*)
    val stackArgs = steps.zipWithIndex.map { case (s, i) =>
      s"'step${i + 1}_$s', _c${i + 1}"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${steps.size}, $stackArgs) AS (step, n_users)")
  }
}
