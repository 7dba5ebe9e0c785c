package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native audio-container header parser — the audio sibling of
  * [[ImageMeta]]: RIFF/WAVE `fmt ` + `data` chunk walk, no codec
  * library, real distributed byte work. Returns
  * `struct(format string, sample_rate int, channels int,
  * bits_per_sample int, n_samples bigint)`; NULL for unrecognized or
  * truncated payloads (filter-don't-throw, as everywhere in graft).
  * `n_samples` = data bytes / block-align — duration is
  * `n_samples / sample_rate` downstream.
  */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.catalogString}")
  }

  override def dataType: DataType = AudioMeta.outType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_meta"

  override protected def nullSafeEval(b: Any): Any =
    AudioMeta.parse(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.AudioMeta$$.MODULE$$.parse($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
}

object AudioMeta {

  val outType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
      (u8(b, i + 3).toLong << 24)) & 0xffffffffL

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3)

  /** NULL for anything that is not a well-formed RIFF/WAVE prefix. */
  def parse(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    // LONG walk offset: a declared chunk size near 2³² would wrap an
    // Int offset negative, pass the `i + 8 <= n` guard, and crash the
    // tag read — malformed sizes must yield NULL, never throw
    var i = 12L
    var rate = -1; var channels = -1; var bits = -1; var blockAlign = -1
    var dataBytes = -1L
    while (i + 8 <= n && (rate < 0 || dataBytes < 0)) {
      val ii = i.toInt
      val sz = le32(b, ii + 4)
      if (tag(b, ii, "fmt ")) {
        if (ii + 24 > n) return null
        channels = le16(b, ii + 10)
        rate = le32(b, ii + 12).toInt
        blockAlign = le16(b, ii + 20)
        bits = le16(b, ii + 22)
      } else if (tag(b, ii, "data")) {
        dataBytes = sz
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      i += 8L + sz + (sz & 1L)
    }
    if (rate <= 0 || channels <= 0 || bits <= 0 || blockAlign <= 0 ||
        dataBytes < 0) null
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString("wav"), rate, channels, bits,
      dataBytes / blockAlign))
  }

  /** Column form. */
  def audioMeta(c: Column): Column =
    GraftColumnBridge.column(AudioMeta(GraftColumnBridge.expression(c)))
}

/** Minimal spec-conformant WAV header (44 bytes, PCM, empty data chunk
  * whose declared size is `nSamples × channels × 2` for 16-bit audio) —
  * the on-cluster payload builder pairing with [[AudioMeta]], same role
  * as [[PngHeader]] for images. */
case class WavHeader(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (sampleRate int, nSamples int), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_header"

  override protected def nullSafeEval(rate: Any, nSamples: Any): Any =
    WavHeader.build(rate.asInstanceOf[Int], nSamples.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (r, s) => s"graft.expressions.WavHeader$$.MODULE$$.build($r, $s)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WavHeader =
    copy(left = newLeft, right = newRight)
}

object WavHeader {

  /** Mono 16-bit PCM header declaring `nSamples` frames. */
  def build(sampleRate: Int, nSamples: Int): Array[Byte] = {
    val dataBytes = nSamples * 2
    val out = new Array[Byte](44)
    def w4(i: Int, t: String): Unit = (0 until 4).foreach(j => out(i + j) = t(j).toByte)
    def le32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    def le16(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
    }
    w4(0, "RIFF"); le32(4, 36 + dataBytes); w4(8, "WAVE")
    w4(12, "fmt "); le32(16, 16)
    le16(20, 1)             // PCM
    le16(22, 1)             // mono
    le32(24, sampleRate)
    le32(28, sampleRate * 2) // byte rate
    le16(32, 2)             // block align
    le16(34, 16)            // bits
    w4(36, "data"); le32(40, dataBytes)
    out
  }

  /** Column form. */
  def wavHeader(sampleRate: Column, nSamples: Column): Column =
    GraftColumnBridge.column(WavHeader(
      GraftColumnBridge.expression(sampleRate),
      GraftColumnBridge.expression(nSamples)))
}
