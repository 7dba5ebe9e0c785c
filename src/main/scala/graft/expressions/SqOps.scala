package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Scalar quantization (SQ8) — the middle vector-compression tier
  * between raw floats (4 bytes/dim) and product quantization
  * ([[PqOps]], sub-byte/dim): each vector stores its own (min, scale)
  * plus one UNSIGNED BYTE per dimension, a 4× shrink with far lower
  * distortion than PQ. The standard serving trade (FAISS
  * `ScalarQuantizer` QT_8bit, Lucene/HNSW int8): corpus vectors ride
  * quantized through the shuffle, queries stay float, and scoring
  * decompresses ON THE FLY inside one codegen'd kernel —
  * dot(q, decode(c)) = vmin·Σqᵢ + step·Σ qᵢ·codeᵢ, i.e. one fused
  * byte-product pass, never a materialized float array. */
object SqOps {

  /** struct(vmin float, vstep float, codes binary) — per-vector affine
    * quantization params + one byte per dimension. */
  val encodedType: StructType = StructType(Seq(
    StructField("vmin", FloatType, nullable = false),
    StructField("vstep", FloatType, nullable = false),
    StructField("codes", BinaryType, nullable = false)))

  /** codeᵢ = round((vᵢ − min) / step) with step = (max − min)/255;
    * a constant vector (max == min) encodes step 0, all codes 0.
    * NULL when any element is NaN/Inf or the affine params overflow
    * the float fields — the filter-don't-throw convention the other
    * kernels follow (a NaN-bearing vector would otherwise encode to a
    * quiet Inf vmin and poison every later sq_dot with Inf/NaN). */
  def encode(v: ArrayData, isFloat: Boolean): InternalRow = {
    val n = v.numElements()
    if (n == 0) return null
    var mn = Double.MaxValue
    var mx = -Double.MaxValue
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      if (!java.lang.Double.isFinite(x)) return null
      if (x < mn) mn = x
      if (x > mx) mx = x
      i += 1
    }
    val step = (mx - mn) / 255.0
    if (!java.lang.Float.isFinite(mn.toFloat) ||
        !java.lang.Float.isFinite(step.toFloat)) return null
    val out = new Array[Byte](n)
    if (step > 0) {
      i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        out(i) = Math.round((x - mn) / step).toInt.max(0).min(255).toByte
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](mn.toFloat, step.toFloat, out))
  }

  /** dot(q, decode(enc)) in one pass over the bytes. NULL on dimension
    * mismatch (same filter-don't-throw convention as the PQ kernels). */
  def dot(q: ArrayData, isFloat: Boolean, enc: InternalRow): java.lang.Double = {
    val codes = enc.getBinary(2)
    val n = q.numElements()
    if (n != codes.length) return null
    val vmin = enc.getFloat(0).toDouble
    val vstep = enc.getFloat(1).toDouble
    var qSum = 0.0
    var qc = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) q.getFloat(i).toDouble else q.getDouble(i)
      qSum += x
      qc += x * (codes(i) & 0xff)
      i += 1
    }
    java.lang.Double.valueOf(vmin * qSum + vstep * qc)
  }

  /** Column forms. */
  def sqEncode(v: Column): Column =
    GraftColumnBridge.column(SqEncode(GraftColumnBridge.expression(v)))
  def sqDot(q: Column, enc: Column): Column =
    GraftColumnBridge.column(SqDot(
      GraftColumnBridge.expression(q), GraftColumnBridge.expression(enc)))
}

/** `sq_encode(vec)` → struct(vmin, vstep, codes). */
case class SqEncode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = SqOps.encodedType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_encode"

  private def isFloatArray: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override protected def nullSafeEval(v: Any): Any =
    SqOps.encode(v.asInstanceOf[ArrayData], isFloatArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = isFloatArray
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.SqOps.encode($c, $f);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): SqEncode =
    copy(child = newChild)
}

/** `sq_dot(qvec, encoded)` → double. */
case class SqDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      // match on field TYPES only, not the full StructType: a parquet
      // round-trip marks every field nullable, and an exact equality
      // with encodedType (nullable = false) would reject a persisted
      // SQ8 corpus — the primary use case — at analysis time
      case (ArrayType(FloatType | DoubleType, _), t: StructType)
          if t.fields.length == 3 &&
            t.fields(0).dataType == FloatType &&
            t.fields(1).dataType == FloatType &&
            t.fields(2).dataType == BinaryType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, " +
          s"struct<float, float, binary>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_dot"

  private def isFloatArray: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override protected def nullSafeEval(q: Any, enc: Any): Any =
    SqOps.dot(q.asInstanceOf[ArrayData], isFloatArray,
      enc.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = isFloatArray
    nullSafeCodeGen(ctx, ev, (q, e) => {
      val boxed = ctx.freshName("sqdot")
      s"""
        java.lang.Double $boxed = graft.expressions.SqOps.dot($q, $f, $e);
        if ($boxed == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $boxed.doubleValue(); }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDot =
    copy(left = newLeft, right = newRight)
}
