package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Deterministic JPEG builder — the THIRD container of the perceptual
  * tier, and deliberately a different construction from
  * [[PngImage]]/[[GifImage]]: the pixel model renders into a
  * grayscale `BufferedImage` and the JDK's OWN ImageIO JPEG writer
  * encodes it at a PINNED quality (0.85, explicit `ImageWriteParam`),
  * so the builder and [[JpegLuma]] (the hand-written baseline
  * decoder) are fully independent codecs — build→decode parity
  * certifies the decoder against the JDK encoder the same way the
  * PNG/GIF specs certify against ImageIO reads. Identical
  * `(w, h, seeds)` produce identical bytes within a JVM (fixed
  * quality → fixed quant/huffman tables), which is what the planted
  * pairs rely on; JPEG being LOSSY, cross-container hashes (vs the
  * PNG/GIF builds of the same seeds) agree only to within a few dHash
  * bits — measured and pinned by the spec, never assumed by a planted
  * gate. */
case class JpegImage(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (IntegerType, IntegerType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int width, int height, bigint seeds), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "jpeg_image"

  override protected def nullSafeEval(w: Any, h: Any, seeds: Any): Any =
    JpegImage.build(w.asInstanceOf[Int], h.asInstanceOf[Int],
      seeds.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, h, s) =>
      s"graft.expressions.JpegImage$$.MODULE$$.build($w, $h, $s)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): JpegImage =
    copy(first = f, second = s, third = t)
}

object JpegImage {

  /** ImageWriter instances are not thread-safe; one per executor
    * thread, param re-pinned per call (params are mutable). */
  private val writer = new ThreadLocal[javax.imageio.ImageWriter] {
    override def initialValue(): javax.imageio.ImageWriter = {
      val it = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg")
      require(it.hasNext, "no JPEG ImageWriter in this JRE")
      it.next()
    }
  }

  /** `seeds` packs (seed, noiseSeed) as seed·2³² + noiseSeed — the
    * [[PngImage.build]] convention, same pixel model. */
  def build(width: Int, height: Int, seeds: Long): Array[Byte] = {
    require(width >= 1 && height >= 1 && width <= 4096 && height <= 4096,
      s"jpeg_image dims out of range: ${width}x$height")
    val seed = seeds >>> 32
    val noiseSeed = seeds & 0xffffffffL
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        raster.setSample(x, y, 0, PngImage.pixel(seed, noiseSeed, x, y))
        x += 1
      }
      y += 1
    }
    val w = writer.get()
    val param = w.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.85f)
    val bos = new java.io.ByteArrayOutputStream(width * height / 4 + 1024)
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      w.setOutput(ios)
      w.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.flush()
    } finally {
      ios.close()
      w.setOutput(null)
    }
    bos.toByteArray
  }

  /** Column form; seed/noise packed into one long. */
  def jpegImage(w: Column, h: Column, seeds: Column): Column =
    GraftColumnBridge.column(JpegImage(
      GraftColumnBridge.expression(w), GraftColumnBridge.expression(h),
      GraftColumnBridge.expression(seeds)))
}

/** Hand-written BASELINE JPEG luma decoder — the curation-path kernel
  * (a crawl pipeline decodes images, it rarely encodes them): marker
  * walk (SOI/APPn/COM/DQT/DHT/DRI/SOF0-1/SOS), canonical Huffman
  * decode with byte-stuffing and restart markers, dequantization in
  * natural order, and the libjpeg `jpeg_idct_islow` integer IDCT
  * (public-domain Loeffler–Ligtenberg–Moshovitz constants, 13-bit
  * fixed point) so decoded samples match the JDK's libjpeg-derived
  * reader bit-for-bit on grayscale payloads. Interleaved multi-
  * component scans (4:4:4 / 4:2:2 / 4:2:0) are entropy-decoded fully
  * but only the LUMA component is dequantized/IDCT'd — Y in JFIF is
  * exactly the integer-luma plane dHash needs, chroma never touches
  * the hash. Progressive (SOF2), arithmetic coding, and 12-bit
  * precision return NULL, as does anything malformed — never a
  * throw. */
object JpegLuma {

  private[expressions] final class Luma(
    val w: Int, val h: Int, val px: Array[Int])

  /** jpeg_natural_order: zigzag index → natural (row-major) index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table in the JPEG spec's DECODE form. */
  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    val vals: Array[Int] = symbols
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          k += counts(l - 1)
          code += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  private final class MalformedException extends RuntimeException

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * unstuffing; stops (throws) at any real marker. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var atMarker = false
    def reset(): Unit = { acc = 0; nBits = 0; atMarker = false }
    def bit(): Int = {
      if (nBits == 0) {
        if (atMarker || pos >= b.length) throw new MalformedException
        val v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length) throw new MalformedException
          val m = b(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed 0xFF data byte
          else throw new MalformedException // decode overran into a marker
        }
        acc = v; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(h: Huff): Int = {
      var code = bit()
      var l = 1
      while (code > h.maxCode(l)) {
        if (l >= 16) throw new MalformedException
        code = (code << 1) | bit()
        l += 1
      }
      h.vals(h.valPtr(l) + code - h.minCode(l))
    }
    /** Skip to and consume an expected RSTn marker. */
    def restart(): Unit = {
      // align: drop partial bits, then expect FFD0-FFD7
      reset()
      while (pos + 1 < b.length && !((b(pos) & 0xff) == 0xff &&
        ((b(pos + 1) & 0xff) >= 0xd0 && (b(pos + 1) & 0xff) <= 0xd7)))
        pos += 1
      if (pos + 1 >= b.length) throw new MalformedException
      pos += 2
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // libjpeg jidctint.c constants: CONST_BITS=13, PASS1_BITS=2
  private final val FIX_0_298631336 = 2446
  private final val FIX_0_390180644 = 3196
  private final val FIX_0_541196100 = 4433
  private final val FIX_0_765366865 = 6270
  private final val FIX_0_899976223 = 7373
  private final val FIX_1_175875602 = 9633
  private final val FIX_1_501321110 = 12299
  private final val FIX_1_847759065 = 15137
  private final val FIX_1_961570560 = 16069
  private final val FIX_2_053119869 = 16819
  private final val FIX_2_562915447 = 20995
  private final val FIX_3_072711026 = 25172

  private def descale(x: Long, n: Int): Int =
    ((x + (1L << (n - 1))) >> n).toInt

  /** `jpeg_idct_islow` on one dequantized block (natural order) into
    * 64 clamped samples. */
  private def idctIslow(coef: Array[Int], out: Array[Int]): Unit = {
    val ws = new Array[Long](64)
    // pass 1: columns
    var c = 0
    while (c < 8) {
      var allZero = true
      var r = 1
      while (r < 8 && allZero) { if (coef(r * 8 + c) != 0) allZero = false; r += 1 }
      if (allZero) {
        val dc = (coef(c).toLong) << 2 // PASS1_BITS
        r = 0
        while (r < 8) { ws(r * 8 + c) = dc; r += 1 }
      } else {
        var z2 = coef(2 * 8 + c).toLong
        var z3 = coef(6 * 8 + c).toLong
        var z1 = (z2 + z3) * FIX_0_541196100
        val t2 = z1 + z3 * (-FIX_1_847759065)
        val t3 = z1 + z2 * FIX_0_765366865
        z2 = coef(c).toLong
        z3 = coef(4 * 8 + c).toLong
        val t0 = (z2 + z3) << 13
        val t1 = (z2 - z3) << 13
        val t10 = t0 + t3; val t13 = t0 - t3
        val t11 = t1 + t2; val t12 = t1 - t2
        var o0 = coef(7 * 8 + c).toLong
        var o1 = coef(5 * 8 + c).toLong
        var o2 = coef(3 * 8 + c).toLong
        var o3 = coef(1 * 8 + c).toLong
        z1 = o0 + o3
        z2 = o1 + o2
        z3 = o0 + o2
        var z4 = o1 + o3
        val z5 = (z3 + z4) * FIX_1_175875602
        o0 *= FIX_0_298631336
        o1 *= FIX_2_053119869
        o2 *= FIX_3_072711026
        o3 *= FIX_1_501321110
        z1 *= -FIX_0_899976223
        z2 *= -FIX_2_562915447
        z3 = z3 * (-FIX_1_961570560) + z5
        z4 = z4 * (-FIX_0_390180644) + z5
        o0 += z1 + z3
        o1 += z2 + z4
        o2 += z2 + z3
        o3 += z1 + z4
        ws(c) = descale(t10 + o3, 13 - 2)
        ws(7 * 8 + c) = descale(t10 - o3, 13 - 2)
        ws(1 * 8 + c) = descale(t11 + o2, 13 - 2)
        ws(6 * 8 + c) = descale(t11 - o2, 13 - 2)
        ws(2 * 8 + c) = descale(t12 + o1, 13 - 2)
        ws(5 * 8 + c) = descale(t12 - o1, 13 - 2)
        ws(3 * 8 + c) = descale(t13 + o0, 13 - 2)
        ws(4 * 8 + c) = descale(t13 - o0, 13 - 2)
      }
      c += 1
    }
    // pass 2: rows, final descale CONST_BITS+PASS1_BITS+3 = 18, +128
    var r = 0
    while (r < 8) {
      val o = r * 8
      var z2 = ws(o + 2)
      var z3 = ws(o + 6)
      var z1 = (z2 + z3) * FIX_0_541196100
      val t2 = z1 + z3 * (-FIX_1_847759065)
      val t3 = z1 + z2 * FIX_0_765366865
      z2 = ws(o)
      z3 = ws(o + 4)
      val t0 = (z2 + z3) << 13
      val t1 = (z2 - z3) << 13
      val t10 = t0 + t3; val t13 = t0 - t3
      val t11 = t1 + t2; val t12 = t1 - t2
      var o0 = ws(o + 7)
      var o1 = ws(o + 5)
      var o2 = ws(o + 3)
      var o3 = ws(o + 1)
      z1 = o0 + o3
      z2 = o1 + o2
      z3 = o0 + o2
      var z4 = o1 + o3
      val z5 = (z3 + z4) * FIX_1_175875602
      o0 *= FIX_0_298631336
      o1 *= FIX_2_053119869
      o2 *= FIX_3_072711026
      o3 *= FIX_1_501321110
      z1 *= -FIX_0_899976223
      z2 *= -FIX_2_562915447
      z3 = z3 * (-FIX_1_961570560) + z5
      z4 = z4 * (-FIX_0_390180644) + z5
      o0 += z1 + z3
      o1 += z2 + z4
      o2 += z2 + z3
      o3 += z1 + z4
      def clamp(v: Int): Int = {
        val s = v + 128
        if (s < 0) 0 else if (s > 255) 255 else s
      }
      out(o) = clamp(descale(t10 + o3, 18))
      out(o + 7) = clamp(descale(t10 - o3, 18))
      out(o + 1) = clamp(descale(t11 + o2, 18))
      out(o + 6) = clamp(descale(t11 - o2, 18))
      out(o + 2) = clamp(descale(t12 + o1, 18))
      out(o + 5) = clamp(descale(t12 - o1, 18))
      out(o + 3) = clamp(descale(t13 + o0, 18))
      out(o + 4) = clamp(descale(t13 - o0, 18))
      r += 1
    }
  }

  private final val MaxDim = 32768
  private final val MaxPixels = 1L << 26

  /** NULL on anything that is not well-formed sequential baseline. */
  private[expressions] def decode(b: Array[Byte]): Luma =
    try decodeOrThrow(b)
    catch {
      case _: MalformedException => null
      case _: ArrayIndexOutOfBoundsException => null
    }

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def decodeOrThrow(b: Array[Byte]): Luma = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return null
    val quant = new Array[Array[Int]](4) // natural-order tables
    val dcTab = new Array[Huff](4)
    val acTab = new Array[Huff](4)
    var restartInterval = 0
    var w = -1; var h = -1
    var nComp = 0
    val compH = new Array[Int](4); val compV = new Array[Int](4)
    val compQ = new Array[Int](4); val compId = new Array[Int](4)
    var i = 2
    while (i + 4 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return null
      var m = b(i + 1) & 0xff
      i += 2
      while (m == 0xff && i < b.length) { m = b(i) & 0xff; i += 1 } // fill bytes
      m match {
        case 0xd8 => // stray SOI
        case 0xd9 => return null // EOI before a complete scan
        case 0xc0 | 0xc1 => // baseline / extended sequential SOF
          val len = u16(b, i)
          if (i + len > b.length || len < 8) return null
          if ((b(i + 2) & 0xff) != 8) return null // 12-bit: unsupported
          h = u16(b, i + 3); w = u16(b, i + 5)
          nComp = b(i + 7) & 0xff
          if (nComp < 1 || nComp > 4 || len < 8 + 3 * nComp) return null
          if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
            w.toLong * h > MaxPixels) return null
          var c = 0
          while (c < nComp) {
            compId(c) = b(i + 8 + 3 * c) & 0xff
            val hv = b(i + 9 + 3 * c) & 0xff
            compH(c) = hv >> 4; compV(c) = hv & 15
            if (compH(c) < 1 || compH(c) > 4 || compV(c) < 1 || compV(c) > 4)
              return null
            compQ(c) = b(i + 10 + 3 * c) & 0xff
            c += 1
          }
          i += len
        case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
             0xcd | 0xce | 0xcf =>
          return null // progressive / hierarchical / arithmetic
        case 0xc4 => // DHT
          val len = u16(b, i)
          if (i + len > b.length) return null
          var p = i + 2
          while (p < i + len) {
            val tcth = b(p) & 0xff
            val counts = new Array[Int](16)
            var total = 0
            var l = 0
            while (l < 16) {
              counts(l) = b(p + 1 + l) & 0xff; total += counts(l); l += 1
            }
            if (p + 17 + total > i + len || total > 256) return null
            val syms = new Array[Int](total)
            var s = 0
            while (s < total) { syms(s) = b(p + 17 + s) & 0xff; s += 1 }
            val t = new Huff(counts, syms)
            val idx = tcth & 15
            if (idx > 3) return null
            if ((tcth >> 4) == 0) dcTab(idx) = t else acTab(idx) = t
            p += 17 + total
          }
          i += len
        case 0xdb => // DQT
          val len = u16(b, i)
          if (i + len > b.length) return null
          var p = i + 2
          while (p < i + len) {
            val pqtq = b(p) & 0xff
            val pq = pqtq >> 4; val tq = pqtq & 15
            if (tq > 3 || pq > 1) return null
            val t = new Array[Int](64)
            var k = 0
            if (pq == 0) {
              if (p + 65 > i + len) return null
              while (k < 64) { t(Zigzag(k)) = b(p + 1 + k) & 0xff; k += 1 }
              p += 65
            } else {
              if (p + 129 > i + len) return null
              while (k < 64) { t(Zigzag(k)) = u16(b, p + 1 + 2 * k); k += 1 }
              p += 129
            }
            quant(tq) = t
          }
          i += len
        case 0xdd => // DRI
          val len = u16(b, i)
          if (i + len > b.length || len < 4) return null
          restartInterval = u16(b, i + 2)
          i += len
        case 0xda => // SOS → entropy-coded scan follows
          if (w < 0) return null
          val len = u16(b, i)
          if (i + len > b.length) return null
          val ns = b(i + 2) & 0xff
          if (ns < 1 || ns > nComp || len < 6 + 2 * ns) return null
          val scanComp = new Array[Int](ns) // index into SOF component slot
          val scanDc = new Array[Int](ns)
          val scanAc = new Array[Int](ns)
          var s = 0
          while (s < ns) {
            val cs = b(i + 3 + 2 * s) & 0xff
            var slot = -1
            var c = 0
            while (c < nComp) { if (compId(c) == cs) slot = c; c += 1 }
            if (slot < 0) return null
            scanComp(s) = slot
            val tdta = b(i + 4 + 2 * s) & 0xff
            scanDc(s) = tdta >> 4; scanAc(s) = tdta & 15
            if (scanDc(s) > 3 || scanAc(s) > 3) return null
            s += 1
          }
          return decodeScan(b, i + len, w, h, nComp, compH, compV, compQ,
            quant, dcTab, acTab, restartInterval, ns, scanComp, scanDc,
            scanAc)
        case x if x >= 0xd0 && x <= 0xd7 => // stray RSTn between segments
        case 0x01 => // TEM, no payload
        case _ => // APPn / COM / anything with a length field: skip
          val len = u16(b, i)
          if (len < 2 || i + len > b.length) return null
          i += len
      }
    }
    null // no SOS reached
  }

  /** Decode one (baseline, single) scan; only the luma component's
    * blocks run dequant+IDCT. Returns the CROPPED w×h luma plane. */
  private def decodeScan(b: Array[Byte], dataStart: Int, w: Int, h: Int,
      nComp: Int, compH: Array[Int], compV: Array[Int], compQ: Array[Int],
      quant: Array[Array[Int]], dcTab: Array[Huff], acTab: Array[Huff],
      restartInterval: Int, ns: Int, scanComp: Array[Int],
      scanDc: Array[Int], scanAc: Array[Int]): Luma = {
    val lumaSlot = 0 // first SOF component is Y in JFIF (or the only one)
    val r = new BitReader(b, dataStart)
    val coef = new Array[Int](64)
    val samp = new Array[Int](64)
    val dcPred = new Array[Int](4)

    def decodeBlock(slot: Int, dc: Huff, ac: Huff, wantPixels: Boolean): Unit = {
      if (dc == null || ac == null) throw new MalformedException
      val qt = quant(compQ(slot))
      if (qt == null) throw new MalformedException
      java.util.Arrays.fill(coef, 0)
      val t = r.decode(dc)
      if (t > 15) throw new MalformedException
      val diff = extend(r.bits(t), t)
      dcPred(slot) += diff
      coef(0) = dcPred(slot) * qt(0)
      var k = 1
      var done = false
      while (!done && k < 64) {
        val rs = r.decode(ac)
        val rr = rs >> 4; val ss = rs & 15
        if (ss == 0) {
          if (rr == 15) k += 16 else done = true
        } else {
          k += rr
          if (k > 63) throw new MalformedException
          if (wantPixels) coef(Zigzag(k)) = extend(r.bits(ss), ss) * qt(Zigzag(k))
          else { r.bits(ss) } // advance the stream, discard chroma
          k += 1
        }
      }
      if (wantPixels) idctIslow(coef, samp)
    }

    if (ns == 1) {
      // non-interleaved scan: MCU = one data unit, raster over blocks
      val slot = scanComp(0)
      val want = slot == lumaSlot
      val bw = (w + 7) / 8
      val bh = (h + 7) / 8
      val plane = if (want) new Array[Int](bw * 8 * bh * 8) else null
      var mcu = 0
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            r.restart(); java.util.Arrays.fill(dcPred, 0)
          }
          decodeBlock(slot, dcTab(scanDc(0)), acTab(scanAc(0)), want)
          if (want) {
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                plane((by * 8 + yy) * (bw * 8) + bx * 8 + xx) = samp(yy * 8 + xx)
                xx += 1
              }
              yy += 1
            }
          }
          mcu += 1
          bx += 1
        }
        by += 1
      }
      if (!want) return null // luma not in this scan: unsupported layout
      crop(plane, bw * 8, w, h)
    } else {
      // interleaved: MCU spans 8·hmax × 8·vmax pixels
      var hmax = 1; var vmax = 1
      var s = 0
      while (s < ns) {
        val c = scanComp(s)
        if (compH(c) > hmax) hmax = compH(c)
        if (compV(c) > vmax) vmax = compV(c)
        s += 1
      }
      val mcuW = 8 * hmax; val mcuH = 8 * vmax
      val mcuCols = (w + mcuW - 1) / mcuW
      val mcuRows = (h + mcuH - 1) / mcuH
      // luma geometry within the padded plane
      val lh = compH(lumaSlot); val lv = compV(lumaSlot)
      val planeW = mcuCols * lh * 8
      val plane = new Array[Int](planeW * mcuRows * lv * 8)
      var mcu = 0
      var my = 0
      while (my < mcuRows) {
        var mx = 0
        while (mx < mcuCols) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            r.restart(); java.util.Arrays.fill(dcPred, 0)
          }
          s = 0
          while (s < ns) {
            val slot = scanComp(s)
            val want = slot == lumaSlot
            var v = 0
            while (v < compV(slot)) {
              var hh = 0
              while (hh < compH(slot)) {
                decodeBlock(slot, dcTab(scanDc(s)), acTab(scanAc(s)), want)
                if (want) {
                  val ox = (mx * lh + hh) * 8
                  val oy = (my * lv + v) * 8
                  var yy = 0
                  while (yy < 8) {
                    var xx = 0
                    while (xx < 8) {
                      plane((oy + yy) * planeW + ox + xx) = samp(yy * 8 + xx)
                      xx += 1
                    }
                    yy += 1
                  }
                }
                hh += 1
              }
              v += 1
            }
            s += 1
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
      // luma plane is subsampled when hmax/vmax exceed the luma factors
      // (never in practice: Y carries the max factors in JFIF); treat
      // the luma plane's own sample grid as the image when it matches,
      // else scale the crop window accordingly
      val effW = math.min(w, planeW)
      val effH = math.min(h, mcuRows * lv * 8)
      if (lh != hmax || lv != vmax) {
        // Y subsampled below another component: decode is valid but
        // the luma grid is (w·lh/hmax)×(h·lv/vmax)
        val sw = (w * lh + hmax - 1) / hmax
        val sh = (h * lv + vmax - 1) / vmax
        crop(plane, planeW, math.min(sw, planeW), sh)
      } else crop(plane, planeW, effW, effH)
    }
  }

  private def crop(plane: Array[Int], planeW: Int, w: Int, h: Int): Luma = {
    if (w <= 0 || h <= 0) return null
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      System.arraycopy(plane, y * planeW, px, y * w, w)
      y += 1
    }
    new Luma(w, h, px)
  }
}
