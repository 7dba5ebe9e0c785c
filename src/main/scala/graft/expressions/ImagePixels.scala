package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Deterministic FULL-PIXEL PNG builder — the content-level
  * counterpart of [[PngHeader]] (which emits a 33-byte header-only
  * prefix): a complete, spec-conformant grayscale PNG (8-bit, color
  * type 0, filter 0, one zlib-wrapped IDAT, IEND) whose pixels are a
  * pure function of `(seed, noiseSeed, x, y)`. The test corpus has no
  * real images, so perceptual-dedup queries BUILD image payloads
  * on-cluster and certify the decode→hash path on them (the q81/q82
  * build→parse precedent, extended to pixel data).
  *
  * Pixel model: 8×8-pixel blocks, each block's base brightness an
  * avalanche mix of `(seed, blockX, blockY)` — blocky structure, so
  * two images with the same `seed` share their coarse luminance
  * layout. `noiseSeed != 0` overrides ~1/64 of pixels with
  * noise-derived values: same-seed images with different noise seeds
  * are PERCEPTUAL near-duplicates (tiny mean shift per block),
  * different-seed images are unrelated. Compression level is pinned
  * (6) like [[DeflateSize]]; the deflater is thread-local, reset per
  * row. */
case class PngImage(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (IntegerType, IntegerType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int width, int height, bigint seeds), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_image"

  override protected def nullSafeEval(w: Any, h: Any, seeds: Any): Any =
    PngImage.build(w.asInstanceOf[Int], h.asInstanceOf[Int],
      seeds.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, h, s) =>
      s"graft.expressions.PngImage$$.MODULE$$.build($w, $h, $s)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PngImage =
    copy(first = f, second = s, third = t)
}

object PngImage {

  private val Sig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, false) // zlib wrapper, per PNG spec
  }

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Brightness of pixel (x, y): block base from `seed`, sparse
    * override (~1/64 of pixels) from `noiseSeed` when nonzero. */
  def pixel(seed: Long, noiseSeed: Long, x: Int, y: Int): Int = {
    val base =
      (mix(seed * 1048583L + (x >> 3) * 2099L + (y >> 3)) & 0xffL).toInt
    if (noiseSeed == 0L) base
    else {
      val nz = mix(noiseSeed * 1048583L + x.toLong * 4099L + y)
      if ((nz & 63L) == 0L) ((nz >>> 8) & 0xffL).toInt else base
    }
  }

  /** `seeds` packs (seed, noiseSeed) as seed·2³² + noiseSeed, both
    * sub-2³¹ non-negative — one long argument keeps the expression
    * ternary and the SQL surface flat. */
  def build(width: Int, height: Int, seeds: Long): Array[Byte] = {
    require(width >= 1 && height >= 1 && width <= 4096 && height <= 4096,
      s"png_image dims out of range: ${width}x$height")
    val seed = seeds >>> 32
    val noiseSeed = seeds & 0xffffffffL
    // raw scanlines: filter byte 0 + `width` gray bytes per row
    val raw = new Array[Byte]((width + 1) * height)
    var y = 0
    while (y < height) {
      val off = y * (width + 1)
      raw(off) = 0
      var x = 0
      while (x < width) {
        raw(off + 1 + x) = pixel(seed, noiseSeed, x, y).toByte
        x += 1
      }
      y += 1
    }
    val d = deflater.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val comp = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
    val idat = comp.toByteArray
    val out = new Array[Byte](8 + 25 + 12 + idat.length + 12)
    System.arraycopy(Sig, 0, out, 0, 8)
    // IHDR
    writeBe32(out, 8, 13)
    out(12) = 'I'; out(13) = 'H'; out(14) = 'D'; out(15) = 'R'
    writeBe32(out, 16, width)
    writeBe32(out, 20, height)
    out(24) = 8 // bit depth
    out(25) = 0 // color type: grayscale
    writeCrc(out, 12, 17, 29)
    // IDAT
    var p = 33
    writeBe32(out, p, idat.length)
    out(p + 4) = 'I'; out(p + 5) = 'D'; out(p + 6) = 'A'; out(p + 7) = 'T'
    System.arraycopy(idat, 0, out, p + 8, idat.length)
    writeCrc(out, p + 4, 4 + idat.length, p + 8 + idat.length)
    p += 12 + idat.length
    // IEND
    writeBe32(out, p, 0)
    out(p + 4) = 'I'; out(p + 5) = 'E'; out(p + 6) = 'N'; out(p + 7) = 'D'
    writeCrc(out, p + 4, 4, p + 8)
    out
  }

  private def writeBe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }

  private def writeCrc(b: Array[Byte], from: Int, len: Int, at: Int): Unit = {
    val crc = new java.util.zip.CRC32
    crc.update(b, from, len)
    writeBe32(b, at, crc.getValue.toInt)
  }

  /** Column form; seed/noise packed into one long. */
  def pngImage(w: Column, h: Column, seeds: Column): Column =
    GraftColumnBridge.column(PngImage(
      GraftColumnBridge.expression(w), GraftColumnBridge.expression(h),
      GraftColumnBridge.expression(seeds)))
}

/** 64-bit perceptual DIFFERENCE HASH (dHash) of an encoded image — the
  * standard content-level image near-dup signature (public technique:
  * downscale to a 9×8 grayscale grid, emit one bit per horizontally
  * adjacent cell pair, `cell[y][x+1] > cell[y][x]`): brightness/
  * contrast shifts and small pixel noise move few bits, so
  * hamming-band blocking over the hash (the [[graft.dedup.Dedup]]
  * SimHash bander, pigeonhole-lossless at distance ≤ 3) finds
  * near-duplicate IMAGES — the stage the metadata tier (q81) and
  * exact frame hashing (q51) structurally miss.
  *
  * Decodes PNG (8-bit grayscale or RGB, non-interlaced; IDAT inflated
  * with the JDK Inflater, all five scanline filters unfiltered),
  * uncompressed 24-bit bottom-up BMP, GIF87a/89a (palette-indexed;
  * self-contained variable-width LZW with the full 9→12-bit growth /
  * CLEAR-reset / KwKwK semantics, four-pass interlace), and baseline
  * JPEG ([[JpegLuma]] — Huffman + dequant + the libjpeg islow integer
  * IDCT, luma component only). Grayscale is integer luma
  * (299·R + 587·G + 114·B)/1000; the 9×8 grid is exact integer area
  * averaging (cell boundaries ⌊i·W/9⌋, mean = pixel sum div count) —
  * every step integer-deterministic, engine-independent. Returns NULL
  * for anything unparseable (truncated, unsupported layout) — a
  * curation pipeline filters those rows, it doesn't crash. */
case class DHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dhash"

  override protected def nullSafeEval(b: Any): Any =
    DHash.compute(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.freshName("dh")
    nullSafeCodeGen(ctx, ev, c =>
      s"""java.lang.Long $v = graft.expressions.DHash$$.MODULE$$.compute($c);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v.longValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): DHash =
    copy(child = newChild)
}

object DHash {

  private val GridW = 9
  private val GridH = 8

  /** Dimension caps applied right after header parse. Crafted headers
    * can declare w/h up to 2³¹−1, where `(stride+1)*h`, `w*h`, and the
    * BMP `(w*3+3)&~3` stride all overflow Int (negative-size or
    * absurd allocations) — violating the returns-NULL-never-crashes
    * contract on arbitrary corpus bytes. 32768 per side / 2²⁶ total
    * pixels (≈ 8K×8K) is far above any payload worth dHashing; with
    * both caps every derived size below fits comfortably in Int. */
  private val MaxDim = 32768
  private val MaxPixels = 1L << 26

  /** Decoded grayscale image: row-major luma bytes as ints. */
  private final class Gray(val w: Int, val h: Int, val px: Array[Int])

  def compute(bytes: Array[Byte]): java.lang.Long = {
    val g = decode(bytes)
    if (g == null) null
    else {
      // integer area average onto the 9x8 grid
      val cells = new Array[Long](GridW * GridH)
      var gy = 0
      while (gy < GridH) {
        val y0 = gy * g.h / GridH
        val y1 = (gy + 1) * g.h / GridH
        var gx = 0
        while (gx < GridW) {
          val x0 = gx * g.w / GridW
          val x1 = (gx + 1) * g.w / GridW
          var sum = 0L
          var n = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { sum += g.px(y * g.w + x); n += 1; x += 1 }
            y += 1
          }
          cells(gy * GridW + gx) = if (n == 0) 0L else sum / n
          gx += 1
        }
        gy += 1
      }
      var hash = 0L
      var y = 0
      while (y < GridH) {
        var x = 0
        while (x < GridW - 1) {
          if (cells(y * GridW + x + 1) > cells(y * GridW + x))
            hash |= 1L << (y * (GridW - 1) + x)
          x += 1
        }
        y += 1
      }
      java.lang.Long.valueOf(hash)
    }
  }

  private def decode(b: Array[Byte]): Gray = {
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P') decodePng(b)
    else if (b.length >= 54 && b(0) == 'B' && b(1) == 'M') decodeBmp(b)
    else if (b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8') decodeGif(b)
    else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      val l = JpegLuma.decode(b)
      if (l == null) null else new Gray(l.w, l.h, l.px)
    }
    else null
  }

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def decodePng(b: Array[Byte]): Gray = {
    // walk chunks: IHDR first, concatenate IDAT payloads
    if (b.length < 33) return null
    var i = 8
    var w = 0; var h = 0; var depth = 0; var colorType = -1
    var interlace = 0
    val idat = new java.io.ByteArrayOutputStream()
    while (i + 8 <= b.length) {
      val len = be32(b, i)
      // Long guard: a crafted len near 2³¹ wraps `i + 12 + len` negative
      // in Int, sneaking past the bound and crashing the IDAT copy
      if (len < 0 || i.toLong + 12L + len > b.length) return null
      val t = new String(b, i + 4, 4, "US-ASCII")
      t match {
        case "IHDR" =>
          if (len != 13) return null
          w = be32(b, i + 8); h = be32(b, i + 12)
          depth = b(i + 16) & 0xff; colorType = b(i + 17) & 0xff
          interlace = b(i + 20) & 0xff
        case "IDAT" => idat.write(b, i + 8, len)
        case "IEND" => i = b.length // stop
        case _ => // ancillary chunk: skip
      }
      i += 12 + len
    }
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
      w.toLong * h > MaxPixels || depth != 8 || interlace != 0) return null
    val bpp = colorType match {
      case 0 => 1 // grayscale
      case 2 => 3 // RGB
      case _ => return null
    }
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsInput()) return null // truncated stream
        got += n
      }
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()
    if (got < raw.length) return null
    // unfilter scanlines in place (filters 0-4, PNG spec)
    var y = 0
    while (y < h) {
      val off = y * (stride + 1)
      val filter = raw(off) & 0xff
      val cur = off + 1
      val prev = cur - (stride + 1)
      var x = 0
      filter match {
        case 0 => // None
        case 1 => // Sub
          x = bpp
          while (x < stride) {
            raw(cur + x) = (raw(cur + x) + raw(cur + x - bpp)).toByte
            x += 1
          }
        case 2 => // Up
          if (y > 0) while (x < stride) {
            raw(cur + x) = (raw(cur + x) + raw(prev + x)).toByte
            x += 1
          }
        case 3 => // Average
          while (x < stride) {
            val a = if (x >= bpp) raw(cur + x - bpp) & 0xff else 0
            val u = if (y > 0) raw(prev + x) & 0xff else 0
            raw(cur + x) = (raw(cur + x) + ((a + u) >> 1)).toByte
            x += 1
          }
        case 4 => // Paeth
          while (x < stride) {
            val a = if (x >= bpp) raw(cur + x - bpp) & 0xff else 0
            val u = if (y > 0) raw(prev + x) & 0xff else 0
            val c = if (x >= bpp && y > 0) raw(prev + x - bpp) & 0xff else 0
            val p = a + u - c
            val pa = math.abs(p - a); val pu = math.abs(p - u)
            val pc = math.abs(p - c)
            val pred = if (pa <= pu && pa <= pc) a else if (pu <= pc) u else c
            raw(cur + x) = (raw(cur + x) + pred).toByte
            x += 1
          }
        case _ => return null
      }
      y += 1
    }
    val px = new Array[Int](w * h)
    y = 0
    while (y < h) {
      val cur = y * (stride + 1) + 1
      var xx = 0
      while (xx < w) {
        px(y * w + xx) =
          if (bpp == 1) raw(cur + xx) & 0xff
          else {
            val r = raw(cur + xx * 3) & 0xff
            val gc = raw(cur + xx * 3 + 1) & 0xff
            val bl = raw(cur + xx * 3 + 2) & 0xff
            (299 * r + 587 * gc + 114 * bl) / 1000
          }
        xx += 1
      }
      y += 1
    }
    new Gray(w, h, px)
  }

  /** GIF87a/89a: global or local 256-max color table, extensions
    * skipped, FIRST image block decoded, variable-width LZW per the
    * GIF spec (9→12-bit growth, CLEAR reset, the KwKwK self-reference
    * case), four-pass interlace de-scattered (ImageIO's own writer
    * emits interlaced files, so crawl GIFs routinely are). Luma via
    * the palette — same integer formula as the RGB paths. NULL on
    * anything malformed, never a throw. */
  private def decodeGif(b: Array[Byte]): Gray = {
    val le16 = (i: Int) => (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    var i = 10
    val packed = b(i) & 0xff
    var palOff = -1
    var palSize = 0
    i = 13
    if ((packed & 0x80) != 0) {
      palOff = i
      palSize = 1 << ((packed & 7) + 1)
      i += 3 * palSize
    }
    while (i < b.length) {
      (b(i) & 0xff) match {
        case 0x21 => // extension: label byte then sub-blocks to a 0
          i += 2
          while (i < b.length && b(i) != 0) i += 1 + (b(i) & 0xff)
          if (i >= b.length) return null
          i += 1
        case 0x3b => return null // trailer before any image block
        case 0x2c =>
          if (i + 10 > b.length) return null
          val w = le16(i + 5); val h = le16(i + 7)
          val ip = b(i + 9) & 0xff
          i += 10
          val interlaced = (ip & 0x40) != 0
          if ((ip & 0x80) != 0) { // local color table wins
            palOff = i
            palSize = 1 << ((ip & 7) + 1)
            i += 3 * palSize
          }
          if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
            w.toLong * h > MaxPixels) return null
          if (palOff < 0 || palOff + 3 * palSize > b.length) return null
          if (i >= b.length) return null
          val minCode = b(i) & 0xff
          i += 1
          if (minCode < 2 || minCode > 8) return null
          // concatenate the image's data sub-blocks
          val data = new java.io.ByteArrayOutputStream(w * h / 2 + 64)
          while (i < b.length && b(i) != 0) {
            val len = b(i) & 0xff
            if (i + 1 + len > b.length) return null
            data.write(b, i + 1, len)
            i += 1 + len
          }
          if (i >= b.length) return null
          val raw = lzwDecode(data.toByteArray, minCode, w * h)
          if (raw == null) return null
          // interlace: rows arrive in four passes (every 8th from 0,
          // every 8th from 4, every 4th from 2, every 2nd from 1) —
          // scatter stream rows back to their real positions
          val px =
            if (!interlaced) raw
            else {
              val o = new Array[Int](w * h)
              var src = 0
              var pass = 0
              val starts = Array(0, 4, 2, 1)
              val steps = Array(8, 8, 4, 2)
              while (pass < 4) {
                var row = starts(pass)
                while (row < h) {
                  System.arraycopy(raw, src * w, o, row * w, w)
                  src += 1
                  row += steps(pass)
                }
                pass += 1
              }
              o
            }
          // palette luma: integer (299R + 587G + 114B)/1000
          var k = 0
          while (k < px.length) {
            val idx = px(k)
            if (idx >= palSize) return null
            val p = palOff + 3 * idx
            px(k) = (299 * (b(p) & 0xff) + 587 * (b(p + 1) & 0xff) +
              114 * (b(p + 2) & 0xff)) / 1000
            k += 1
          }
          return new Gray(w, h, px)
        case _ => return null
      }
    }
    null
  }

  /** GIF-variant LZW over a concatenated sub-block payload: LSB-first
    * codes, width minCode+1 growing to 12 as the table fills, CLEAR
    * resets. Returns exactly `n` palette indices or null. */
  private def lzwDecode(d: Array[Byte], minCode: Int, n: Int): Array[Int] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var c = 0
    while (c < clear) { prefix(c) = -1; suffix(c) = c.toByte; c += 1 }
    val out = new Array[Int](n)
    var got = 0
    var width = minCode + 1
    var next = eoi + 1
    var prev = -1
    var firstByte: Byte = 0 // first byte of the previously output string
    var acc = 0L
    var nBits = 0
    var pos = 0
    while (got < n) {
      while (nBits < width) {
        if (pos >= d.length) return null // truncated stream
        acc |= (d(pos) & 0xffL) << nBits
        pos += 1
        nBits += 8
      }
      val code = (acc & ((1L << width) - 1)).toInt
      acc >>>= width
      nBits -= width
      if (code == clear) {
        width = minCode + 1
        next = eoi + 1
        prev = -1
      } else if (code == eoi) {
        return null // EOI before all pixels arrived
      } else if (prev < 0) {
        if (code >= clear) return null // first code must be a literal
        out(got) = code & 0xff; got += 1
        firstByte = code.toByte
        prev = code
      } else {
        if (code > next) return null
        var sp = 0
        var cur = code
        // KwKwK (code == next): output = string(prev) + its own first
        // byte — the trailing byte is pushed at the stack BOTTOM (it
        // emits last) before expanding prev's chain on top
        if (code == next) { stack(0) = firstByte; sp = 1; cur = prev }
        // chain lengths are ≤ 4096 by construction: sp fits the stack
        while (cur >= 0) { stack(sp) = suffix(cur); sp += 1; cur = prefix(cur) }
        firstByte = stack(sp - 1)
        while (sp > 0 && got < n) { sp -= 1; out(got) = stack(sp) & 0xff; got += 1 }
        if (sp > 0) return null // entry overruns the declared w*h
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = firstByte
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    out
  }

  private def decodeBmp(b: Array[Byte]): Gray = {
    val dataOff = le32(b, 10)
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val bits = (b(28) & 0xff) | ((b(29) & 0xff) << 8)
    val compression = le32(b, 30)
    if (w <= 0 || hRaw == 0 || w > MaxDim || hRaw == Int.MinValue ||
      bits != 24 || compression != 0) return null
    val h = math.abs(hRaw)
    if (h > MaxDim || w.toLong * h > MaxPixels) return null
    val stride = (w * 3 + 3) & ~3 // rows pad to 4 bytes
    if (dataOff < 54 || dataOff.toLong + stride.toLong * h > b.length)
      return null
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      // positive height = bottom-up storage
      val srcRow = if (hRaw > 0) h - 1 - y else y
      val off = dataOff + srcRow * stride
      var x = 0
      while (x < w) {
        val bl = b(off + x * 3) & 0xff
        val gc = b(off + x * 3 + 1) & 0xff
        val r = b(off + x * 3 + 2) & 0xff
        px(y * w + x) = (299 * r + 587 * gc + 114 * bl) / 1000
        x += 1
      }
      y += 1
    }
    new Gray(w, h, px)
  }

  /** Column form. */
  def dhash(c: Column): Column =
    GraftColumnBridge.column(DHash(GraftColumnBridge.expression(c)))
}
