package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels: encode vectors to m byte-ish codes,
  * build per-query distance lookup tables, and score code arrays with
  * the asymmetric distance computation (ADC) — the compressed-ANN tier
  * where the corpus ships as m smallints per vector instead of `dim`
  * floats (at dim 64 / m 8 that is a 32× shuffle/storage cut) and a
  * query-to-vector distance costs m table lookups instead of a
  * dim-length dot product.
  *
  * The codebook (m subspaces × ksub centroids × dsub floats, flat
  * `[j*ksub*dsub + c*dsub + t]`) is a plan constant carried as a codegen
  * reference object — metadata-scale by construction (m·ksub·dsub
  * floats), exactly like an IVF coarse quantizer. All three kernels are
  * single codegen'd static calls; no interpreted higher-order functions
  * anywhere in the scoring path.
  *
  * Distances are squared L2 folded in float-array index order —
  * deterministic across runs, partitions and executors.
  */
private[expressions] trait PqCodebook {
  def codebook: Array[Float]
  def m: Int
  def ksub: Int
  def dsub: Int

  protected def checkCodebook(prettyName: String): TypeCheckResult =
    if (m < 1 || ksub < 1 || dsub < 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires m, ksub, dsub >= 1, got ($m, $ksub, $dsub)")
    else if (codebook.length != m * ksub * dsub)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName codebook length ${codebook.length} != m*ksub*dsub " +
          s"= ${m * ksub * dsub}")
    else TypeCheckResult.TypeCheckSuccess
}

/** `pq_encode(vec)` → array<int> of `m` centroid codes (argmin squared
  * L2 per subspace, ties to the lowest code). Arrays shorter than
  * m·dsub yield NULL. */
case class PqEncode(child: Expression, codebook: Array[Float],
    m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression with PqCodebook {

  override def checkInputDataTypes(): TypeCheckResult =
    checkCodebook(prettyName) match {
      case TypeCheckResult.TypeCheckSuccess => child.dataType match {
        case ArrayType(FloatType | DoubleType, _) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
      }
      case fail => fail
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  private def isFloatArray: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override protected def nullSafeEval(v: Any): Any =
    PqOps.encode(v.asInstanceOf[ArrayData], isFloatArray, codebook, m, ksub, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    val f = isFloatArray
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.PqOps.encode($c, $f, $cb, $m, $ksub, $dsub);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_lut(qvec)` → array<float> of m·ksub squared L2 distances from
  * the query's subvectors to every centroid — computed ONCE per query
  * row, then shared by every ADC evaluation against it. */
case class PqLut(child: Expression, codebook: Array[Float],
    m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression with PqCodebook {

  override def checkInputDataTypes(): TypeCheckResult =
    checkCodebook(prettyName) match {
      case TypeCheckResult.TypeCheckSuccess => child.dataType match {
        case ArrayType(FloatType | DoubleType, _) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
      }
      case fail => fail
    }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_lut"

  private def isFloatArray: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override protected def nullSafeEval(v: Any): Any =
    PqOps.lut(v.asInstanceOf[ArrayData], isFloatArray, codebook, m, ksub, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    val f = isFloatArray
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.PqOps.lut($c, $f, $cb, $m, $ksub, $dsub);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** `pq_adc(codes, lut)` → double: Σ_j lut[j·ksub + codes[j]] — the
  * asymmetric distance between a query (via its LUT) and a PQ-encoded
  * vector. m lookups per pair. Mismatched inputs (codes shorter than m,
  * a code outside [0, ksub), or a lut shorter than m·ksub — e.g. a
  * PqAdc constructed with an m/ksub that doesn't match the arrays)
  * yield NULL, matching encode/lut's short-input convention, instead
  * of an ArrayIndexOutOfBounds or a silent read of wrong lut slots. */
case class PqAdc(left: Expression, right: Expression, m: Int, ksub: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (m < 1 || ksub < 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires m, ksub >= 1, got ($m, $ksub)")
    else (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int> codes, array<float> lut), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    PqOps.adc(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData], m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val boxed = ctx.freshName("adc")
      s"""
      java.lang.Double $boxed = graft.expressions.PqOps.adc($c, $l, $m, $ksub);
      ${ev.isNull} = ($boxed == null);
      ${ev.value} = ${ev.isNull} ? -1.0 : $boxed.doubleValue();
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqOps {

  /** Argmin centroid per subspace; NULL for arrays shorter than m·dsub. */
  def encode(v: ArrayData, isFloat: Boolean, cb: Array[Float],
      m: Int, ksub: Int, dsub: Int): ArrayData = {
    if (v.numElements() < m * dsub) return null
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var d = 0.0
        var t = 0
        val cbOff = (j * ksub + c) * dsub
        val vOff = j * dsub
        while (t < dsub) {
          val x = if (isFloat) v.getFloat(vOff + t).toDouble
                  else v.getDouble(vOff + t)
          val diff = x - cb(cbOff + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** Squared L2 from each query subvector to every centroid. */
  def lut(q: ArrayData, isFloat: Boolean, cb: Array[Float],
      m: Int, ksub: Int, dsub: Int): ArrayData = {
    if (q.numElements() < m * dsub) return null
    val out = new Array[Float](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        var d = 0.0
        var t = 0
        val cbOff = (j * ksub + c) * dsub
        val qOff = j * dsub
        while (t < dsub) {
          val x = if (isFloat) q.getFloat(qOff + t).toDouble
                  else q.getDouble(qOff + t)
          val diff = x - cb(cbOff + t)
          d += diff * diff
          t += 1
        }
        out(j * ksub + c) = d.toFloat
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** ADC score, or NULL when the arrays don't match the declared
    * geometry (codes < m, lut < m·ksub, or any code outside
    * [0, ksub)) — the same convention as encode/lut's short-input
    * NULL, instead of throwing or silently reading wrong lut slots. */
  def adc(codes: ArrayData, lut: ArrayData, m: Int, ksub: Int): java.lang.Double = {
    if (codes.numElements() < m || lut.numElements() < m * ksub) return null
    var d = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      if (c < 0 || c >= ksub) return null
      d += lut.getFloat(j * ksub + c)
      j += 1
    }
    java.lang.Double.valueOf(d)
  }

  /** Column forms. */
  def pqEncode(vec: Column, cb: Array[Float], m: Int, ksub: Int, dsub: Int): Column =
    GraftColumnBridge.column(
      PqEncode(GraftColumnBridge.expression(vec), cb, m, ksub, dsub))
  def pqLut(qvec: Column, cb: Array[Float], m: Int, ksub: Int, dsub: Int): Column =
    GraftColumnBridge.column(
      PqLut(GraftColumnBridge.expression(qvec), cb, m, ksub, dsub))
  def pqAdc(codes: Column, lut: Column, m: Int, ksub: Int): Column =
    GraftColumnBridge.column(
      PqAdc(GraftColumnBridge.expression(codes),
        GraftColumnBridge.expression(lut), m, ksub))
}
