package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram builder over the canonical tokenization
  * (lowercase, non-alphanumeric runs as separators, whitespace split):
  * one codegen'd pass over the UTF-8 bytes emitting every space-joined
  * n-gram in document order, with multiplicity.
  *
  * Replaces the posexplode + per-document window `lead` pipeline in
  * [[graft.text.WordGrams.grams]], which was correct but paid a
  * FULL-CORPUS token-level exchange: the window's
  * `partitionBy(doc) orderBy(pos)` shuffles and sorts every token of
  * every document before a single gram exists — at 100 TB that shuffle
  * dwarfs the gram aggregation it feeds. (The obvious shuffle-free
  * alternative — higher-order `transform(sequence(...))` over the token
  * array — is interpreted per element with a lambda frame per gram, the
  * q44 mistake.) This kernel is the preference-order fix: a native
  * `Expression` with `doGenCode`, so gram construction is shuffle-free
  * AND stays inside whole-stage codegen.
  *
  * Token semantics are IDENTICAL to
  * `split(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")), " ")`:
  * the input is lowercased by `UTF8String.toLowerCase` — the exact
  * kernel behind Spark's `lower()` — and a token is a maximal run of
  * ASCII `[a-z0-9]` bytes (multibyte UTF-8 units are ≥ 0x80, so they
  * can never alias into the token class; any char whose LOWERCASE form
  * lands in `[a-z0-9]`, e.g. the Kelvin sign → `k`, tokenizes exactly
  * as the regexp form did). Documents with fewer than `n` tokens yield
  * an empty array (the window form emitted nothing for them —
  * callers explode, so empty ≡ nothing). WordNGramsParitySpec proves
  * gram-for-gram equality against the legacy window pipeline on
  * adversarial Unicode.
  */
case class WordNGrams(child: Expression, n: Int, alnumTokens: Boolean = true)
    extends UnaryExpression {

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
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(s: Any): Any =
    WordNGrams.compute(s.asInstanceOf[UTF8String], n, alnumTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.WordNGrams$$.MODULE$$.compute($c, $n, $alnumTokens)")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {

  private val Empty = new GenericArrayData(Array.empty[Any])

  @inline private def isAlnumByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** Java-regex `\s` over bytes — ASCII whitespace only, exactly what
    * `regexp_replace(..., "\\s+", " ")` separates on (U+00A0 and other
    * Unicode spaces encode as bytes ≥ 0x80 and stay token bytes there
    * too). */
  @inline private def isWsByte(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def compute(s: UTF8String, n: Int, alnumTokens: Boolean): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val nBytes = bytes.length
    // token boundaries: starts(i) inclusive, ends(i) exclusive
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nToks = 0
    var i = 0
    while (i < nBytes) {
      val tok = if (alnumTokens) isAlnumByte(bytes(i)) else !isWsByte(bytes(i))
      if (tok) {
        val start = i
        while (i < nBytes && (if (alnumTokens) isAlnumByte(bytes(i))
                              else !isWsByte(bytes(i)))) i += 1
        if (nToks == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nToks * 2)
          ends = java.util.Arrays.copyOf(ends, nToks * 2)
        }
        starts(nToks) = start
        ends(nToks) = i
        nToks += 1
      } else i += 1
    }
    // Whitespace-token mode reproduces split(canonical(text), " ")
    // bug-for-bug: blank text canonicalizes to "" and Spark
    // split("", " ") = [""] — ONE empty token — so n=1 emits the empty
    // gram there. (The alnum mode's regexp form never does: its empty
    // split result is filtered by the length > 0 guard downstream.)
    if (nToks == 0 && !alnumTokens && n == 1)
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    if (nToks < n) return Empty
    val out = new Array[Any](nToks - n + 1)
    var g = 0
    while (g <= nToks - n) {
      var len = n - 1 // the joining spaces
      var t = g
      while (t < g + n) { len += ends(t) - starts(t); t += 1 }
      val gram = new Array[Byte](len)
      var pos = 0
      t = g
      while (t < g + n) {
        if (t > g) { gram(pos) = ' '; pos += 1 }
        val tl = ends(t) - starts(t)
        System.arraycopy(bytes, starts(t), gram, pos, tl)
        pos += tl
        t += 1
      }
      out(g) = UTF8String.fromBytes(gram)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Column form: array of space-joined word `n`-grams of `text`
    * (canonical alnum tokens — the [[graft.text.WordGrams]] space). */
  def wordNGrams(text: Column, n: Int): Column =
    GraftColumnBridge.column(
      WordNGrams(GraftColumnBridge.expression(text), n))

  /** Whitespace-token variant — tokens are maximal non-`\s` runs of the
    * lowercased text, punctuation preserved: the
    * `split(TextAnalysis.canonical(text), " ")` space the dedup shingle
    * family is defined over. */
  def wsNGrams(text: Column, n: Int): Column =
    GraftColumnBridge.column(
      WordNGrams(GraftColumnBridge.expression(text), n, alnumTokens = false))
}
