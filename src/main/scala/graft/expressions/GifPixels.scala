package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Deterministic FULL-PIXEL GIF builder — [[PngImage]]'s counterpart
  * for the second-most-common crawl image container: a complete,
  * spec-conformant GIF89a (256-entry grayscale global color table,
  * one non-interlaced image block, variable-width LZW per the GIF
  * spec including the 9→12-bit code growth and full-table CLEAR
  * reset) whose pixels are the SAME pure function of
  * `(seed, noiseSeed, x, y)` as the PNG builder ([[PngImage.pixel]]).
  * The palette maps index i to (i, i, i), whose integer luma is
  * exactly i — so a GIF and a PNG built from the same seeds decode to
  * identical grayscale pixels and identical dHashes, which the parity
  * spec pins. Extends the perceptual tier to GIF payloads without a
  * codec dependency (LZW is self-contained); q81 already parses GIF
  * headers, this adds the content level. */
case class GifImage(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (IntegerType, IntegerType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int width, int height, bigint seeds), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "gif_image"

  override protected def nullSafeEval(w: Any, h: Any, seeds: Any): Any =
    GifImage.build(w.asInstanceOf[Int], h.asInstanceOf[Int],
      seeds.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, h, s) =>
      s"graft.expressions.GifImage$$.MODULE$$.build($w, $h, $s)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): GifImage =
    copy(first = f, second = s, third = t)
}

object GifImage {

  /** LSB-first bit packer into 255-byte-max GIF sub-blocks. */
  private final class BitPacker(out: java.io.ByteArrayOutputStream) {
    private val block = new Array[Byte](255)
    private var used = 0
    private var acc = 0
    private var nBits = 0
    def put(code: Int, width: Int): Unit = {
      acc |= code << nBits
      nBits += width
      while (nBits >= 8) {
        block(used) = (acc & 0xff).toByte
        used += 1
        if (used == 255) flushBlock()
        acc >>>= 8
        nBits -= 8
      }
    }
    private def flushBlock(): Unit = {
      out.write(used)
      out.write(block, 0, used)
      used = 0
    }
    def finish(): Unit = {
      if (nBits > 0) {
        block(used) = (acc & 0xff).toByte
        used += 1
        if (used == 255) flushBlock()
      }
      if (used > 0) flushBlock()
      out.write(0) // block terminator
    }
  }

  /** `seeds` packs (seed, noiseSeed) as seed·2³² + noiseSeed — the
    * [[PngImage.build]] convention, same pixel model. */
  def build(width: Int, height: Int, seeds: Long): Array[Byte] = {
    require(width >= 1 && height >= 1 && width <= 4096 && height <= 4096,
      s"gif_image dims out of range: ${width}x$height")
    val seed = seeds >>> 32
    val noiseSeed = seeds & 0xffffffffL
    val idx = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        idx(y * width + x) = PngImage.pixel(seed, noiseSeed, x, y)
        x += 1
      }
      y += 1
    }
    buildFromIndices(width, height, idx)
  }

  /** Complete GIF89a from raw palette indices (grayscale ramp GCT, so
    * index i decodes to luma i). Package-visible so the parity spec
    * can feed RANDOM index streams — incompressible input forces the
    * LZW table past 4096 entries and exercises the CLEAR-reset path
    * deterministic blocky pixels rarely reach. */
  private[graft] def buildFromIndices(
      width: Int, height: Int, idx: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(width * height / 2 + 1024)
    // header + logical screen descriptor (256-entry GCT, 8-bit colors)
    out.write('G'); out.write('I'); out.write('F')
    out.write('8'); out.write('9'); out.write('a')
    out.write(width & 0xff); out.write(width >>> 8)
    out.write(height & 0xff); out.write(height >>> 8)
    out.write(0xf7) // GCT present | color res 8 | table size 2^8
    out.write(0)    // background color index
    out.write(0)    // aspect ratio
    // grayscale ramp: palette index i = luma i exactly
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    // image descriptor: full frame, no local table, no interlace
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(width & 0xff); out.write(width >>> 8)
    out.write(height & 0xff); out.write(height >>> 8)
    out.write(0)
    // LZW-compressed index stream, min code size 8
    out.write(8)
    val Clear = 256
    val Eoi = 257
    val packer = new BitPacker(out)
    // dictionary: key = prefixCode·256 + suffixByte (prefix ≤ 12 bits)
    var dict = new java.util.HashMap[Integer, Integer](4096)
    var next = 258
    var codeSize = 9
    packer.put(Clear, codeSize)
    var prev = -1
    var k = 0
    while (k < idx.length) {
      val c = idx(k)
      if (prev < 0) prev = c
      else {
        val key = Integer.valueOf(prev * 256 + c)
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          packer.put(prev, codeSize)
          if (next < 4096) {
            dict.put(key, Integer.valueOf(next))
            // decoder bumps when ITS count (one behind) reaches
            // 2^width — that is when our just-added code equals it
            if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
            next += 1
          } else {
            packer.put(Clear, codeSize)
            dict = new java.util.HashMap[Integer, Integer](4096)
            next = 258
            codeSize = 9
          }
          prev = c
        }
      }
      k += 1
    }
    if (prev >= 0) packer.put(prev, codeSize)
    packer.put(Eoi, codeSize)
    packer.finish()
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Column form; seed/noise packed into one long. */
  def gifImage(w: Column, h: Column, seeds: Column): Column =
    GraftColumnBridge.column(GifImage(
      GraftColumnBridge.expression(w), GraftColumnBridge.expression(h),
      GraftColumnBridge.expression(seeds)))
}
