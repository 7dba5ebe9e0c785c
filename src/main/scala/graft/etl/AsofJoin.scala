package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the single
  * right row with the greatest `rightTsCol` ≤ `leftTsCol` (strictly <
  * with `strict = true`) within the same key — the trades⋈quotes /
  * reading⋈latest-config join that plain SQL can only express as a
  * correlated subquery or an inequality join.
  *
  * Spark-first shape: NOT a range join (whose candidate set is
  * quadratic in events-per-key) and NOT a broadcast (the right side
  * may be huge). Both sides are union-tagged and carried through ONE
  * window over (key, time): sort puts each right row immediately
  * before the left rows it can serve, and `last(payload,
  * ignoreNulls)` over rows-unbounded-preceding forwards the most
  * recent right payload to every left row. One shuffle on the key,
  * linear work, no cross product — the classic distributed as-of.
  *
  * The right payload travels as ONE struct, so all emitted fields come
  * atomically from the SAME matched row (per-column carries would tear
  * rows when a payload field is legitimately NULL).
  *
  * Determinism contract: `right` must be unique per (key, ts) — ties
  * between right rows at the identical timestamp have no defined
  * "latest"; pre-aggregate (e.g. `max_by`) to one row first.
  *
  * @param payloadCols right columns to attach; emitted under their own
  *                    names, plus `asofTsName` = the matched right
  *                    timestamp (NULL when no right row precedes).
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      payloadCols: Seq[String],
      strict: Boolean = false,
      asofTsName: String = "asof_ts"): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin needs at least one key column")
    require(payloadCols.nonEmpty, "asofJoin needs at least one payload column")
    require(!left.columns.contains(asofTsName),
      s"left already has a column named '$asofTsName'")
    Seq("_asof_t", "_asof_side", "_asof_pay", "_asof_m").foreach(h =>
      require(!left.columns.contains(h), s"left may not contain '$h'"))
    // payload names surface beside the left columns — a collision would
    // emit a frame with duplicate column names (AMBIGUOUS_REFERENCE on
    // any downstream use); a payload named like the matched-ts column
    // would shadow it inside the carry struct
    payloadCols.foreach { p =>
      require(!left.columns.contains(p),
        s"payload column '$p' collides with a left column — alias one side")
      require(p != asofTsName,
        s"payload column '$p' collides with asofTsName")
    }
    // sort order within a timestamp tie decides ≤ vs <: right-before-left
    // means an equal-time right row IS visible to the left row (≤);
    // strict flips it
    val (rightOrd, leftOrd) = if (strict) (1, 0) else (0, 1)
    val pay = struct(
      (col(rightTsCol).as(asofTsName) +: payloadCols.map(col)): _*)
    // a NULL right timestamp can never be "the latest at-or-before":
    // unfiltered it would sort first (asc NULLS FIRST) and its payload
    // would leak onto left rows that have no real preceding match
    val rightPrep = right.where(col(rightTsCol).isNotNull).select(
      (keyCols.map(col) :+
        col(rightTsCol).as("_asof_t") :+
        lit(rightOrd).as("_asof_side") :+
        pay.as("_asof_pay")): _*)
    val payType = rightPrep.schema("_asof_pay").dataType
    val leftPrep = left.select(
      (left.columns.map(col) :+
        col(leftTsCol).as("_asof_t") :+
        lit(leftOrd).as("_asof_side") :+
        lit(null).cast(payType).as("_asof_pay")): _*)
    // align schemas: right rows carry NULL for left-only columns
    val rightAligned = rightPrep.select(
      (left.columns.map { c =>
        if (keyCols.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } :+ col("_asof_t") :+ col("_asof_side") :+ col("_asof_pay")): _*)
    val unioned = leftPrep.unionByName(rightAligned)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_asof_t").asc, col("_asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_asof_m", last(col("_asof_pay"), ignoreNulls = true).over(w))
    carried
      .where(col("_asof_side") === leftOrd)
      .select((left.columns.map(col) :+
        col("_asof_m").getField(asofTsName).as(asofTsName)) ++
        payloadCols.map(c => col("_asof_m").getField(c).as(c)): _*)
  }
}
