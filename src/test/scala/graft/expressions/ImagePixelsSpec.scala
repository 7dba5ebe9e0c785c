package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[PngImage]] build → [[DHash]] decode certified against the JDK's
  * OWN image stack: ImageIO decodes our built PNGs (independent
  * spec-conformance proof), and DHash decodes ImageIO-WRITTEN PNG/BMP
  * payloads (independent filter/unfilter proof — the ImageIO PNG
  * writer picks its own scanline filters), both compared against a
  * pixel-level reference dHash computed here from BufferedImage
  * pixels. */
class ImagePixelsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference dHash straight from decoded pixels — same integer
    * definition as the expression (9×8 area means, horizontal
    * comparisons). */
  private def refDhash(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val cells = Array.ofDim[Long](8, 9)
    for (gy <- 0 until 8; gx <- 0 until 9) {
      val (x0, x1) = (gx * w / 9, (gx + 1) * w / 9)
      val (y0, y1) = (gy * h / 8, (gy + 1) * h / 8)
      var sum = 0L; var n = 0L
      for (y <- y0 until y1; x <- x0 until x1) {
        val rgb = img.getRGB(x, y)
        sum += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
        n += 1
      }
      cells(gy)(gx) = if (n == 0) 0 else sum / n
    }
    var hash = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if (cells(y)(x + 1) > cells(y)(x)) hash |= 1L << (y * 8 + x)
    hash
  }

  private def viaImageIO(img: java.awt.image.BufferedImage,
      format: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos),
      s"ImageIO cannot write $format")
    bos.toByteArray
  }

  private def randomImage(w: Int, h: Int, seed: Long) = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rng = new scala.util.Random(seed)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, rng.nextInt(0x1000000))
    img
  }

  test("DHash decodes ImageIO-written PNG (RGB, writer-chosen filters)") {
    for (seed <- Seq(1L, 7L, 42L); (w, h) <- Seq((40, 30), (9, 8), (64, 64))) {
      val img = randomImage(w, h, seed)
      val got = DHash.compute(viaImageIO(img, "png"))
      assert(got !== null, s"seed $seed ${w}x$h: decode failed")
      assert(got.longValue() === refDhash(img), s"seed $seed ${w}x$h")
    }
  }

  test("DHash decodes ImageIO-written BMP (24bpp bottom-up)") {
    for (seed <- Seq(3L, 11L)) {
      val img = randomImage(37, 23, seed) // odd width: row padding path
      val got = DHash.compute(viaImageIO(img, "bmp"))
      assert(got !== null, s"seed $seed: decode failed")
      assert(got.longValue() === refDhash(img), s"seed $seed")
    }
  }

  test("PngImage builds a PNG that ImageIO and ImageMeta both accept") {
    val seeds = 12345L * 4294967296L + 2L
    val bytes = PngImage.build(72, 64, seeds)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejects the built PNG")
    assert(img.getWidth === 72 && img.getHeight === 64)
    // pixels round-trip exactly — via raw raster samples (getRGB would
    // push gray through a gray→sRGB gamma conversion)
    for (y <- Seq(0, 13, 63); x <- Seq(0, 8, 41, 71)) {
      val v = img.getRaster.getSample(x, y, 0)
      assert(v === PngImage.pixel(12345L, 2L, x, y), s"pixel ($x,$y)")
    }
    // and the expression-side hash equals a reference computed from
    // the raw gray samples (decoder reads gray bytes directly)
    val cells = Array.ofDim[Long](8, 9)
    for (gy <- 0 until 8; gx <- 0 until 9) {
      var sum = 0L
      for (y <- gy * 8 until (gy + 1) * 8; x <- gx * 8 until (gx + 1) * 8)
        sum += img.getRaster.getSample(x, y, 0)
      cells(gy)(gx) = sum / 64
    }
    var ref = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if (cells(y)(x + 1) > cells(y)(x)) ref |= 1L << (y * 8 + x)
    assert(DHash.compute(bytes).longValue() === ref)
    // container metadata parser agrees too
    val meta = Seq(Tuple1(bytes)).toDF("b")
      .select(ImageMeta.imageMeta(col("b")).as("m"))
      .select(col("m.format"), col("m.width"), col("m.height")).head()
    assert(meta.getString(0) === "png" && meta.getInt(1) === 72 &&
      meta.getInt(2) === 64)
  }

  test("same-seed noise variants are near, different seeds far") {
    def dh(seed: Long, noise: Long): Long =
      DHash.compute(PngImage.build(72, 64, seed * 4294967296L + noise))
        .longValue()
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // identical build -> identical hash
    assert(dh(500L, 3L) === dh(500L, 3L))
    // sparse noise moves few bits; unrelated seeds move many
    val near = (1L to 8L).map(s => ham(dh(s, 1L), dh(s, 2L)))
    val far = (1L to 8L).map(s => ham(dh(s, 1L), dh(s + 1000L, 1L)))
    assert(near.max <= 12, s"noise variants too far: $near")
    assert(far.min >= 15, s"unrelated seeds too close: $far")
    assert(near.sum < far.sum / 2, s"near $near vs far $far")
  }

  /** Hand-assemble a PNG from raw pixels with ONE forced scanline
    * filter on every row — ImageIO's writer picks its own filters, so
    * this is the only way to pin each unfilter path individually. */
  private def pngWithFilter(px: Array[Array[Int]], bpp: Int,
      filter: Int): Array[Byte] = {
    val h = px.length; val w = px(0).length / bpp
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    for (y <- 0 until h) {
      val off = y * (stride + 1)
      raw(off) = filter.toByte
      for (x <- 0 until stride) {
        val cur = px(y)(x)
        val a = if (x >= bpp) px(y)(x - bpp) else 0
        val u = if (y > 0) px(y - 1)(x) else 0
        val c = if (x >= bpp && y > 0) px(y - 1)(x - bpp) else 0
        val pred = filter match {
          case 0 => 0
          case 1 => a
          case 2 => u
          case 3 => (a + u) >> 1
          case 4 =>
            val p = a + u - c
            val (pa, pu, pc) = (math.abs(p - a), math.abs(p - u), math.abs(p - c))
            if (pa <= pu && pa <= pc) a else if (pu <= pc) u else c
        }
        raw(off + 1 + x) = (cur - pred).toByte
      }
    }
    val d = new java.util.zip.Deflater(6, false)
    d.setInput(raw); d.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
    d.end()
    val idat = comp.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def chunk(tag: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length))
      val td = tag.getBytes("US-ASCII") ++ data
      out.write(td)
      val crc = new java.util.zip.CRC32; crc.update(td)
      out.write(be32(crc.getValue.toInt))
    }
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    chunk("IHDR", be32(w) ++ be32(h) ++
      Array[Byte](8, if (bpp == 1) 0 else 2, 0, 0, 0))
    chunk("IDAT", idat)
    chunk("IEND", Array.empty)
    out.toByteArray
  }

  test("all five PNG scanline filters unfilter to the same hash (gray + RGB)") {
    val rng = new scala.util.Random(29)
    for (bpp <- Seq(1, 3)) {
      val px = Array.fill(20, 27 * bpp)(rng.nextInt(256))
      val hashes = (0 to 4).map { f =>
        val got = DHash.compute(pngWithFilter(px, bpp, f))
        assert(got !== null, s"bpp $bpp filter $f: decode failed")
        got.longValue()
      }
      assert(hashes.distinct.size === 1,
        s"bpp $bpp: filters disagree: $hashes")
      // and the shared value is the pixel-level reference
      val img = new java.awt.image.BufferedImage(27, 20,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 20; x <- 0 until 27) {
        val (r, g, b) =
          if (bpp == 1) (px(y)(x), px(y)(x), px(y)(x))
          else (px(y)(x * 3), px(y)(x * 3 + 1), px(y)(x * 3 + 2))
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val ref =
        if (bpp == 1) {
          // gray decode path reads raw bytes, not getRGB's luma round trip
          val cells = Array.ofDim[Long](8, 9)
          for (gy <- 0 until 8; gx <- 0 until 9) {
            val (x0, x1) = (gx * 27 / 9, (gx + 1) * 27 / 9)
            val (y0, y1) = (gy * 20 / 8, (gy + 1) * 20 / 8)
            var s = 0L; var n = 0L
            for (y <- y0 until y1; x <- x0 until x1) { s += px(y)(x); n += 1 }
            cells(gy)(gx) = s / n
          }
          var hsh = 0L
          for (y <- 0 until 8; x <- 0 until 8)
            if (cells(y)(x + 1) > cells(y)(x)) hsh |= 1L << (y * 8 + x)
          hsh
        } else refDhash(img)
      assert(hashes.head === ref, s"bpp $bpp: hash vs pixel reference")
    }
  }

  test("unparseable payloads return NULL, not an exception") {
    assert(DHash.compute("definitely not an image".getBytes) === null)
    assert(DHash.compute(Array[Byte]()) === null)
    // a bare 33-byte header-only PNG (q81's payload) has no IDAT
    assert(DHash.compute(PngHeader.build(100, 100)) === null)
    // truncated full PNG
    val full = PngImage.build(48, 48, 9L * 4294967296L + 1L)
    assert(DHash.compute(full.take(full.length / 2)) === null)
  }

  test("crafted headers with overflowing dimensions return NULL, not a crash") {
    def be32(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
      b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
    }
    // PNG declaring w = h = 2^30: (stride+1)*h and w*h overflow Int
    // pre-cap (NegativeArraySizeException / multi-GB allocation)
    val huge = PngImage.build(8, 8, 9L * 4294967296L + 1L)
    be32(huge, 16, 1 << 30); be32(huge, 20, 1 << 30)
    assert(DHash.compute(huge) === null)
    // PNG whose first chunk declares len near 2^31: `i + 12 + len`
    // wraps negative in Int and slips past the walk's bound check
    val wrap = new Array[Byte](64)
    System.arraycopy(PngImage.build(8, 8, 1L), 0, wrap, 0, 8)
    be32(wrap, 8, 0x7ffffff5)
    wrap(12) = 'I'; wrap(13) = 'D'; wrap(14) = 'A'; wrap(15) = 'T'
    assert(DHash.compute(wrap) === null)
    // BMP whose width makes (w*3+3)&~3 wrap to a tiny stride that
    // passes the bounds check while w*h explodes the pixel allocation
    def le32(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
      b(i + 2) = (v >>> 16).toByte; b(i + 3) = (v >>> 24).toByte
    }
    val bmp = new Array[Byte](200)
    bmp(0) = 'B'; bmp(1) = 'M'
    le32(bmp, 10, 54)          // data offset
    le32(bmp, 18, 1431655766)  // width: w*3 wraps to 2 in Int
    le32(bmp, 22, 1)           // height
    bmp(28) = 24               // bits
    le32(bmp, 30, 0)           // compression
    assert(DHash.compute(bmp) === null)
    // INT_MIN height: math.abs is a no-op there
    val bmp2 = bmp.clone()
    le32(bmp2, 18, 16); le32(bmp2, 22, Int.MinValue)
    assert(DHash.compute(bmp2) === null)
  }

  test("column forms and SQL registration work end-to-end") {
    org.apache.spark.sql.GraftColumnBridge.registerFunctions(spark)
    val viaSql = spark.sql(
      "SELECT dhash(png_image(72, 64, CAST(4294967296 * 7 + 1 AS BIGINT))) AS h")
      .head().getLong(0)
    assert(viaSql ===
      DHash.compute(PngImage.build(72, 64, 7L * 4294967296L + 1L)).longValue())
    val viaCol = Seq(Tuple1(7L * 4294967296L + 1L)).toDF("s")
      .select(DHash.dhash(PngImage.pngImage(lit(72), lit(64), col("s"))))
      .head().getLong(0)
    assert(viaCol === viaSql)
  }
}
