package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native DISTINCT character n-gram builder — the shingle kernel of
  * the MinHash/Jaccard dedup family (q23/q54/q130/q132/q135 all build
  * char-3-gram sets of the canonical text before anything else runs).
  *
  * Replaces the interpreted
  * `array_distinct(transform(sequence(1, …), i -> ct.substr(i, n)))`
  * form, which (a) allocated a lambda frame per window, (b) re-seeked
  * the UTF-8 string from offset 0 on every `substr` call — O(len²)
  * per document, the q44 mistake — and (c) paid a second interpreted
  * pass for `array_distinct`. This kernel is ONE pass over the UTF-8
  * bytes: codepoint boundaries are indexed as byte offsets, each
  * n-codepoint window is sliced directly from the byte array, and
  * dedup happens inline in an insertion-ordered hash set — identical
  * output (value AND first-occurrence order) to the replaced form,
  * proved by CharNGramsParitySpec on adversarial Unicode.
  *
  * Bug-for-bug edge parity with `substr`'s clamping: text shorter than
  * `n` codepoints yields a single shingle — the whole (short) text;
  * empty text yields `[""]`. Both quirks are load-bearing — the
  * DuckDB oracles of the jaccard family spell the same
  * `generate_series(1, greatest(len - (n-1), 1))` clamp.
  */
case class CharNGrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires n >= 1, got $n")
    else child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override protected def nullSafeEval(s: Any): Any =
    CharNGrams.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.CharNGrams$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)
}

object CharNGrams {

  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    // byte offset of every codepoint start, plus the terminal offset
    var offs = new Array[Int](math.max(16, nBytes / 2))
    var nCps = 0
    var i = 0
    while (i < nBytes) {
      if (nCps == offs.length)
        offs = java.util.Arrays.copyOf(offs, nCps * 2)
      offs(nCps) = i
      nCps += 1
      // Spark's own width table (invalid lead/continuation bytes → 1),
      // so stepping matches length()/substr() even on malformed UTF-8
      // smuggled in via binary cast — not just on well-formed text.
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    if (nCps == 0)
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    if (nCps < n)
      return new GenericArrayData(Array[Any](UTF8String.fromBytes(bytes)))
    if (nCps == offs.length) offs = java.util.Arrays.copyOf(offs, nCps + 1)
    offs(nCps) = nBytes
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var w = 0
    while (w <= nCps - n) {
      val from = offs(w)
      val to = offs(w + n)
      seen.add(UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, from, to)))
      w += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Column form: distinct char `n`-grams of `text` (first-occurrence
    * order). */
  def charNGrams(text: Column, n: Int): Column =
    GraftColumnBridge.column(
      CharNGrams(GraftColumnBridge.expression(text), n))
}
