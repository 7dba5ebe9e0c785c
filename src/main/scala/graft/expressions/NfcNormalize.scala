package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization (canonical decomposition followed by
  * canonical composition, UAX #15 — public standard): the text-cleaning
  * step every multilingual LLM corpus runs before fingerprinting or
  * dedup, because byte-distinct but canonically-equivalent spellings
  * (`e` + COMBINING ACUTE vs precomposed `é`) would otherwise defeat
  * exact dedup, split the vocabulary, and double-count n-grams.
  *
  * Spark ships no normalization builtin, and a Scala UDF would box every
  * row and black-box the planner. This is a codegen'd unary expression
  * instead, with the scan-dominant path allocation-free:
  *
  *  1. one branch-free byte scan over the UTF8String — pure-ASCII input
  *     (the overwhelming majority of a web corpus) is NFC by
  *     construction and returns the INPUT buffer untouched: no String
  *     materialization, no copy;
  *  2. non-ASCII input probes `Normalizer.isNormalized` (the JDK's
  *     quick-check over NFC_QC properties, usually one pass, no
  *     allocation on YES) and again returns the input when already
  *     normalized;
  *  3. only text that actually needs recomposition pays the
  *     String→normalize→UTF8String round trip.
  *
  * The JDK Normalizer is locale-independent and version-pinned by the
  * JVM's Unicode tables, so results are identical on every executor of
  * a homogeneous cluster (the same caveat any engine's ICU dependency
  * carries). Null propagates; the empty string is its own NFC form. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.NfcNormalize$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Column form. */
  def nfc(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NfcNormalize(org.apache.spark.sql.GraftColumnBridge.expression(c)))

  def compute(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
