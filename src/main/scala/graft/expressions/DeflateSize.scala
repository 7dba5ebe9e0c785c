package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of a string's UTF-8 bytes — the kernel of
  * the compression-ratio quality heuristic (Gopher/MassiveText-style
  * repetition filtering, public technique): natural language compresses
  * to a mid-range ratio, degenerate repetition compresses to almost
  * nothing, and random/encoded blobs don't compress at all, so
  * `deflate_size(text) / octet_length(text)` separates all three with
  * one narrow scan-speed pass and no tokenization.
  *
  * A Scala UDF here would box every row AND allocate a fresh Deflater
  * per call (native zlib state, finalizer-backed — a GC disaster at
  * corpus scale). This codegen'd expression reuses one Deflater per
  * thread (ThreadLocal, `reset()` between rows, `setInput` on the
  * string's bytes) and compresses into a fixed scratch buffer, counting
  * bytes without materializing the compressed output.
  *
  * Determinism: DEFLATE output length for fixed input, level and
  * strategy is a pure function of the zlib implementation the JVM
  * bundles — identical across executors of a homogeneous cluster (the
  * same version-pinning caveat as [[NfcNormalize]]'s Unicode tables).
  * Level is pinned (6, zlib default) rather than inherited from any
  * JVM default. Null propagates; the empty string deflates to the
  * 2-byte empty stored block. */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_size"

  override protected def nullSafeEval(s: Any): Any =
    DeflateSize.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.DeflateSize$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {

  /** Column form. */
  def deflateSize(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      DeflateSize(org.apache.spark.sql.GraftColumnBridge.expression(c)))

  private val Level = 6 // zlib default, pinned explicitly

  private val local =
    new ThreadLocal[(java.util.zip.Deflater, Array[Byte])] {
      override def initialValue(): (java.util.zip.Deflater, Array[Byte]) =
        // nowrap: raw DEFLATE, no 6-byte zlib envelope skewing tiny docs
        (new java.util.zip.Deflater(Level, true), new Array[Byte](8192))
    }

  def compute(s: UTF8String): Int = {
    val (d, buf) = local.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    var total = 0
    while (!d.finished()) {
      total += d.deflate(buf)
    }
    total
  }
}
