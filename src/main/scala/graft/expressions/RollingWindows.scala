package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling hash of EVERY length-`k` codepoint window of a string —
  * the kernel behind exact substring-level duplicate detection
  * ("two documents share any 20-char span"), where the naive form
  * hashes each window independently at O(n·k) per document.
  *
  * Window i's value is exactly [[RollingHash]] of the k-codepoint
  * substring starting at i (same B = 257, p = 2^31 − 1 polynomial, same
  * codepoint semantics), but computed by the Rabin–Karp slide —
  * h_{i+1} = (h_i − cp_i·B^(k−1))·B + cp_{i+k} mod p — so the whole
  * array is ONE pass over the UTF-8 bytes: decode codepoints in place,
  * keep a k-slot ring buffer of the window's codepoints, emit one hash
  * per slide. Strings shorter than k yield an empty array.
  *
  * Intermediates stay below p·B + maxCodepoint < 2^40; the subtraction
  * is kept non-negative by adding p·B before reducing. */
case class RollingWindows(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires window length k >= 1, got $k")
    else child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_windows"

  override protected def nullSafeEval(s: Any): Any =
    RollingWindows.compute(s.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.RollingWindows$$.MODULE$$.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): RollingWindows =
    copy(child = newChild)
}

object RollingWindows {

  import RollingHash.{Base, Mod}

  def compute(s: UTF8String, k: Int): ArrayData = {
    val nBytes = s.numBytes()
    // B^(k-1) mod p, by repeated multiplication (k is plan-constant and
    // small; no modpow machinery needed)
    var bk = 1L
    var t = 1
    while (t < k) { bk = (bk * Base) % Mod; t += 1 }

    val ring = new Array[Int](k)   // codepoints of the current window
    val out = new java.util.ArrayList[Long]()
    var h = 0L
    var nCps = 0                   // codepoints consumed so far
    var i = 0
    while (i < nBytes) {
      val b0 = s.getByte(i) & 0xff
      // Spark's own width table (invalid lead/continuation bytes → 1),
      // so window POSITIONS match length()/substring() even on malformed
      // UTF-8 smuggled in via binary cast — positions from this kernel
      // drive substring cuts in Dedup.scrubByPositions.
      val len = UTF8String.numBytesForFirstByte(s.getByte(i))
      var cp =
        if (len == 2) b0 & 0x1f
        else if (len == 3) b0 & 0x0f
        else if (len == 4) b0 & 0x07
        else b0 // ASCII, or an invalid byte folded at full value
      var j = 1
      while (j < len && i + j < nBytes) {
        cp = (cp << 6) | (s.getByte(i + j) & 0x3f)
        j += 1
      }
      if (nCps >= k) {
        // slide: drop the codepoint leaving the window
        val leaving = ring(nCps % k)
        h = ((h - (leaving * bk) % Mod + Mod * Base) * Base + cp) % Mod
      } else {
        h = (h * Base + cp) % Mod
      }
      ring(nCps % k) = cp
      nCps += 1
      if (nCps >= k) out.add(h)
      i += len
    }
    val arr = new Array[Long](out.size())
    var a = 0
    while (a < arr.length) { arr(a) = out.get(a); a += 1 }
    new GenericArrayData(arr)
  }

  /** Column form. */
  def rollingWindows(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      RollingWindows(GraftColumnBridge.expression(c), k))
}
