package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native sign-bit LSH bucket id over `numPlanes` deterministic
  * pseudo-random hyperplanes (plane components derived from a
  * splitmix-style integer mix of (plane, component) — reproducible
  * across runs and executors with no broadcast plane matrix).
  *
  * Replaces the unrolled Column form `Σ_j vec(j) · lit(c_{p,j})` which
  * materialized numPlanes × dim × numTables expression nodes in the
  * plan — at dim 64 × 6 planes × 4 tables that is ~1.5k nodes per row,
  * blowing past what Janino compiles into one tight method (measured
  * 6× slowdown from compile + interpreted fallback). This kernel is a
  * single codegen'd static call: one pass over the array per plane,
  * plane components mixed on the fly (a few ALU ops each — cheaper
  * than the memory traffic of a plane matrix).
  *
  * `table` selects an independent plane set for OR-amplified LSH; the
  * plane index is mixed as `(table << 16) | p`, so table 0 reproduces
  * the original single-table planes exactly.
  *
  * Parity with the replaced form: projections fold left-to-right in
  * double precision; an array shorter than `dim` made every projection
  * NULL (absent getItem) and thus every sign bit 0 — kept here as
  * bucket 0.
  */
case class LshBucket(child: Expression, dim: Int, numPlanes: Int, table: Int)
    extends UnaryExpression {

  // Bounds live in the expression itself (not just the Column helper) so
  // the SQL-registered path is covered too: bits pack into one Long, and
  // `1L << p` silently wraps mod 64 — planes 64+ would alias onto bits
  // 0-63 and degrade bucket quality undetected.
  override def checkInputDataTypes(): TypeCheckResult =
    if (numPlanes < 1 || numPlanes > 64)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 1 <= numPlanes <= 64 (bucket bits pack " +
          s"into one LONG), got $numPlanes")
    else if (table < 0 || table >= (1 << 15))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 0 <= table < 32768 (table is mixed into " +
          s"the plane index as table << 16), got $table")
    else if (dim < 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires dim >= 1, got $dim")
    else child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  private def isFloatArray: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override protected def nullSafeEval(v: Any): Any =
    LshBucket.compute(v.asInstanceOf[ArrayData], isFloatArray, dim, numPlanes, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = isFloatArray
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.LshBucket$$.MODULE$$.compute($c, $f, $dim, $numPlanes, $table)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {

  /** Component j of plane p: splitmix-style mix of (p, j) mapped into
    * [-1, 1]. Identical math to the plane constants the unrolled Column
    * form baked in as literals. */
  def planeComponent(p: Int, j: Int): Double = {
    var z = (p.toLong << 32 | j.toLong) + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    z.toDouble / Long.MaxValue.toDouble
  }

  def compute(v: ArrayData, isFloat: Boolean, dim: Int, numPlanes: Int, table: Int): Long = {
    if (v.numElements() < dim) return 0L
    var bits = 0L
    var p = 0
    while (p < numPlanes) {
      val planeIdx = (table << 16) | p
      var proj = 0.0
      var j = 0
      while (j < dim) {
        val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        proj += x * planeComponent(planeIdx, j)
        j += 1
      }
      if (proj >= 0) bits |= 1L << p
      p += 1
    }
    bits
  }

  /** Column form. */
  def lshBucket(vec: Column, dim: Int, numPlanes: Int, table: Int = 0): Column =
    GraftColumnBridge.column(
      LshBucket(GraftColumnBridge.expression(vec), dim, numPlanes, table))
}
