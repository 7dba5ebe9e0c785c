package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling hash (Rabin–Karp): h = Σ cp_i · B^(n−1−i)
  * mod p over the string's Unicode CODEPOINTS, B = 257, p = 2^31 − 1.
  *
  * Replaces the interpreted
  * `aggregate(transform(sequence(1, length), i -> ascii(substr(ct,i,1))))`
  * fold, which (a) allocated a lambda frame per character, (b) re-seeked
  * the UTF-8 string from offset 0 on every `substr` call — O(n²) per
  * document — and (c) used Spark's `ascii()`, which returns the first
  * UTF-8 *byte* (negative for multibyte chars) while the DuckDB oracle's
  * `ascii()` returns the Unicode *codepoint*, so hashes silently diverged
  * off pure-ASCII corpora. This kernel is one codegen'd pass over the
  * UTF8String bytes, decoding codepoints in place — identical to the
  * oracle's character semantics on ALL input, not just ASCII.
  *
  * Every intermediate stays < 2^40 (p·B + maxCodepoint), so the fold
  * never overflows a long. Composable over concatenation:
  * h(a ++ b) = (h(a) · B^numChars(b) + h(b)) mod p — chunked documents
  * can be fingerprinted incrementally.
  *
  * Empty string hashes to 0, matching the replaced fold's
  * `sequence(1, greatest(len, 1))` + `ascii("") = 0` convention.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(s: Any): Any =
    RollingHash.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.RollingHash$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {

  val Base: Long = 257L
  val Mod: Long = (1L << 31) - 1

  /** One pass over the UTF-8 bytes, decoding codepoints in place.
    * Steps with Spark's own UTF-8 width table
    * (`UTF8String.numBytesForFirstByte`), so character counting agrees
    * with Spark's `length()`/`substring()` on ALL input — including
    * malformed bytes smuggled in via binary cast (invalid leads step 1
    * and fold at full byte value); truncated trailing sequences fold
    * whatever bits are present rather than throwing. Keeps the
    * window-i-equals-hash-of-substring identity with [[RollingWindows]]
    * on every input, well-formed or not. */
  def compute(s: UTF8String): Long = {
    val n = s.numBytes()
    var h = 0L
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xff
      val len = UTF8String.numBytesForFirstByte(s.getByte(i))
      var cp =
        if (len == 2) b0 & 0x1f
        else if (len == 3) b0 & 0x0f
        else if (len == 4) b0 & 0x07
        else b0 // ASCII, or an invalid byte folded at full value
      var j = 1
      while (j < len && i + j < n) {
        cp = (cp << 6) | (s.getByte(i + j) & 0x3f)
        j += 1
      }
      h = (h * Base + cp) % Mod
      i += len
    }
    h
  }

  /** Column form. */
  def rollingHash(c: Column): Column =
    GraftColumnBridge.column(RollingHash(GraftColumnBridge.expression(c)))
}
