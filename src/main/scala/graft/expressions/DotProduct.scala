package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over numeric arrays, folding left-to-right in
  * double precision — bit-identical to the composable
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _+_)` form (same
  * order, same double arithmetic), which makes it interchangeable under
  * the DuckDB oracles. The composable form is an interpreted
  * higher-order fold allocating a lambda frame per element; this kernel
  * is one codegen'd static call — it sits in the per-candidate-pair hot
  * loop of every ANN operator.
  *
  * Mismatched lengths yield NULL (the composable form nulls out via
  * zip_with padding). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).map(_.dataType).collectFirst {
      case other if !other.isInstanceOf[ArrayType] ||
          !Seq(FloatType, DoubleType).contains(
            other.asInstanceOf[ArrayType].elementType) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> or array<double> arguments, " +
            s"got ${other.catalogString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArray(left), isFloatArray(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val af = isFloatArray(left)
    val bf = isFloatArray(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |Object result = graft.expressions.DotProduct$$.MODULE$$.compute($a, $b, $af, $bf);
         |if (result == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) result).doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Left-to-right double fold; null on length mismatch. */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Column form. */
  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(
        GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
