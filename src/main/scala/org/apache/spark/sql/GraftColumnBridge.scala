package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for graft's native Catalyst expressions.
  * `classic.ExpressionUtils` is `private[sql]`, so the lift lives inside
  * the sql package — the standard pattern for Spark extension libraries
  * that define custom expressions against the public jar. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register graft's native expressions as SQL functions on a live
    * session (the runtime counterpart of configuring
    * [[graft.extensions.GraftExtensions]] via spark.sql.extensions). */
  def registerFunctions(spark: SparkSession): Unit =
    graft.extensions.GraftExtensions.builders.foreach {
      case (name, _, builder) =>
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          name, builder, "built-in")
    }
}
