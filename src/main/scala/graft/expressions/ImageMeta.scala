package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native image-header parser: container-format detection + pixel
  * dimensions straight from the payload bytes — NO codec library, so
  * unlike the decode stubs this is REAL multimodal work that runs
  * distributed today. Formats whose dimensions live in a fixed or
  * scannable header:
  *
  *  - PNG  — 8-byte signature, IHDR width/height big-endian at 16/20
  *  - GIF  — GIF87a/GIF89a, logical-screen size little-endian at 6/8
  *  - BMP  — "BM", BITMAPINFOHEADER width/height little-endian at 18/22
  *  - JPEG — FF D8, then marker scan to the first SOF0/1/2 frame header
  *           (height/width big-endian at +5/+7 inside the segment)
  *
  * Returns `struct(format string, width int, height int)`, or NULL when
  * the payload matches no signature or is truncated mid-header — the
  * filter-don't-throw convention of the other graft kernels (a corrupt
  * blob in a 100 TB scan must not kill the stage).
  */
case class ImageMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.catalogString}")
  }

  override def dataType: DataType = ImageMeta.outType
  override def nullable: Boolean = true
  override def prettyName: String = "image_meta"

  override protected def nullSafeEval(b: Any): Any =
    ImageMeta.parse(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.ImageMeta$$.MODULE$$.parse($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)
}

object ImageMeta {

  val outType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private def row(fmt: String, w: Int, h: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))

  /** NULL (not an exception) for unrecognized / truncated payloads. */
  def parse(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n >= 24 &&
        u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      row("png", be32(b, 16), be32(b, 20))
    else if (n >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      row("gif", le16(b, 6), le16(b, 8))
    else if (n >= 26 && b(0) == 'B' && b(1) == 'M')
      row("bmp", le32(b, 18), math.abs(le32(b, 22)))
    else if (n >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      // JPEG: walk the marker chain to the first SOF0/1/2 frame header
      var i = 2
      while (i + 3 < n) {
        if (u8(b, i) != 0xff) return null // desynchronized stream
        val m = u8(b, i + 1)
        if (m == 0xff) {
          i += 1 // fill byte before the marker
        } else if (m == 0xd9) {
          return null // EOI before any frame header
        } else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
          i += 2 // standalone marker (no length field)
        } else if (m == 0xc0 || m == 0xc1 || m == 0xc2) {
          return if (i + 8 < n) row("jpeg", be16(b, i + 7), be16(b, i + 5))
                 else null
        } else {
          val segLen = be16(b, i + 2)
          if (segLen < 2) return null
          i += 2 + segLen
        }
      }
      null
    } else null
  }

  /** Column form. */
  def imageMeta(c: Column): Column =
    GraftColumnBridge.column(ImageMeta(GraftColumnBridge.expression(c)))
}

/** Minimal VALID PNG: 8-byte signature + IHDR chunk (with a real CRC32)
  * for the given dimensions — a 33-byte, spec-conformant prefix any PNG
  * parser accepts. The test-corpus counterpart of [[ImageMeta]]: the
  * sandbox has no real images, so queries BUILD payloads from data
  * columns and certify the build→parse round trip against an arithmetic
  * oracle. Also handy as a deterministic placeholder payload generator.
  */
case class PngHeader(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int, int), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_header"

  override protected def nullSafeEval(w: Any, h: Any): Any =
    PngHeader.build(w.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (w, h) => s"graft.expressions.PngHeader$$.MODULE$$.build($w, $h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PngHeader =
    copy(left = newLeft, right = newRight)
}

object PngHeader {

  private val Sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  def build(width: Int, height: Int): Array[Byte] = {
    val out = new Array[Byte](33)
    System.arraycopy(Sig, 0, out, 0, 8)
    // IHDR: length 13, type, w, h, bit depth 8, color type 2 (RGB),
    // compression 0, filter 0, interlace 0, CRC32 over type+data
    out(11) = 13
    out(12) = 'I'; out(13) = 'H'; out(14) = 'D'; out(15) = 'R'
    writeBe32(out, 16, width)
    writeBe32(out, 20, height)
    out(24) = 8; out(25) = 2
    val crc = new java.util.zip.CRC32
    crc.update(out, 12, 17)
    writeBe32(out, 29, crc.getValue.toInt)
    out
  }

  private def writeBe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }

  /** Column form. */
  def pngHeader(w: Column, h: Column): Column =
    GraftColumnBridge.column(PngHeader(
      GraftColumnBridge.expression(w), GraftColumnBridge.expression(h)))
}
