package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the load gate a warehouse
  * runs before publishing a table (the Deequ / Delta Live Tables
  * "expectations" shape): a named list of row-level predicates checked
  * in ONE scan + ONE aggregation, reported as per-constraint violation
  * counts. The naive per-constraint loop re-scans the table N times; at
  * 100 TB that is N× the I/O for the same answer.
  *
  * A predicate that evaluates to NULL on a row (e.g. `amount > 0` with
  * a NULL amount) counts as a VIOLATION — an expectation a row cannot
  * prove is not satisfied. Constraints therefore compose without
  * sprinkling isNotNull guards everywhere.
  */
object Expectations {

  /** One row per constraint: (constraint_name, n_violations, n_rows,
    * pass). The single wide aggregate melts through `stack` so the
    * output is long-form regardless of constraint count. */
  def check(df: DataFrame, constraints: Seq[(String, Column)]): DataFrame = {
    require(constraints.nonEmpty, "no constraints to check")
    constraints.foreach { case (n, _) =>
      require(n.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"constraint name '$n' must match [A-Za-z_][A-Za-z0-9_]*")
      require(n != "_n", "constraint name '_n' collides with the count alias")
    }
    require(constraints.map(_._1).distinct.size == constraints.size,
      s"duplicate constraint names: ${constraints.map(_._1).mkString(", ")}")
    // coalesce each sum: over an EMPTY input sum() is NULL, and a report
    // of (n_violations = NULL, pass = NULL) reads as failure downstream —
    // an empty table violates nothing
    val aggs = count(lit(1)).as("_n") +: constraints.map { case (n, c) =>
      coalesce(sum(when(coalesce(c, lit(false)), 0L).otherwise(1L)), lit(0L))
        .as(n)
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = constraints
      .map { case (n, _) => s"'$n', `$n`" }.mkString(", ")
    wide
      .selectExpr(s"stack(${constraints.size}, $stackArgs)" +
        " AS (constraint_name, n_violations)", "_n AS n_rows")
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** Gate form: return the input untouched when every constraint holds,
    * throw with the violation report otherwise. The check consumes one
    * action; the returned frame is the ORIGINAL lazy plan. */
  def enforce(df: DataFrame, constraints: Seq[(String, Column)]): DataFrame = {
    val failed = check(df, constraints)
      .where(!col("pass"))
      .collect()
      .map(r => s"${r.getString(0)}: ${r.getLong(1)} violations")
    if (failed.nonEmpty)
      throw new IllegalStateException(
        s"expectations failed — ${failed.mkString("; ")}")
    df
  }
}
