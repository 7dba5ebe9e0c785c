package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[JpegImage]] (JDK ImageIO encoder, pinned quality) →
  * [[JpegLuma]] (hand-written baseline decoder: Huffman + dequant +
  * libjpeg islow IDCT) — two INDEPENDENT codecs, certified against
  * each other: our decoder must reproduce ImageIO's own read of the
  * same bytes (both trace to libjpeg's integer IDCT, so grayscale
  * parity is bit-exact), on built payloads and on ImageIO-written
  * color 4:2:0 JPEGs of random images; cross-container drift (JPEG is
  * lossy) is MEASURED and pinned, never assumed. */
class JpegPixelsSpec extends SparkSpec {
  import spark.implicits._

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

  private def readBack(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejected the JPEG")
    img
  }

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("built grayscale JPEGs: our decode is pixel-exact vs ImageIO") {
    for (seeds <- Seq(7L * 4294967296L + 1L, 555000555L * 4294967296L + 2L);
        (w, h) <- Seq((72, 64), (40, 30), (9, 8))) {
      val bytes = JpegImage.build(w, h, seeds)
      val img = readBack(bytes)
      assert(img.getWidth === w && img.getHeight === h)
      val got = DHash.compute(bytes)
      assert(got != null, "JpegLuma rejected a built payload")
      // PIXEL-exact against ImageIO's raster (both decoders run
      // libjpeg's islow integer IDCT). The raster, NOT getRGB: a
      // grayscale BufferedImage lives in the LINEAR gray color space
      // and getRGB gamma-converts to sRGB (linear 69 reads back as
      // 142) — a comparison trap, not a codec difference.
      val raster = img.getRaster
      val luma = JpegLuma.decode(bytes)
      for (y <- 0 until h; x <- 0 until w)
        assert(luma.px(y * w + x) === raster.getSample(x, y, 0),
          s"pixel divergence at ($x,$y) ${w}x$h seeds=$seeds")
      // and therefore hash-exact vs a raster-based reference dHash
      val cells = Array.ofDim[Long](8, 9)
      for (gy <- 0 until 8; gx <- 0 until 9) {
        val (x0, x1) = (gx * w / 9, (gx + 1) * w / 9)
        val (y0, y1) = (gy * h / 8, (gy + 1) * h / 8)
        var sum = 0L; var n = 0L
        for (y <- y0 until y1; x <- x0 until x1) {
          sum += raster.getSample(x, y, 0); n += 1
        }
        cells(gy)(gx) = if (n == 0) 0 else sum / n
      }
      var ref = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if (cells(y)(x + 1) > cells(y)(x)) ref |= 1L << (y * 8 + x)
      assert(got.longValue() === ref, s"hash divergence at ${w}x$h")
    }
  }

  test("determinism: same (w, h, seeds) build identical bytes") {
    val a = JpegImage.build(72, 64, 9L * 4294967296L + 4L)
    val b = JpegImage.build(72, 64, 9L * 4294967296L + 4L)
    assert(java.util.Arrays.equals(a, b))
  }

  test("ImageIO-written COLOR JPEG (4:2:0): luma decode matches reference") {
    val rng = new scala.util.Random(55)
    val img = new java.awt.image.BufferedImage(
      96, 80, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // smooth-ish gradient + noise: realistic JPEG content
    for (y <- 0 until 80; x <- 0 until 96) {
      val base = (x * 2 + y) & 0xff
      val r = (base + rng.nextInt(32)) & 0xff
      val g = (base + rng.nextInt(32)) & 0xff
      val b = (base + rng.nextInt(32)) & 0xff
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val got = DHash.compute(bytes)
    assert(got != null, "JpegLuma rejected an ImageIO color JPEG")
    // our hash comes from the Y plane; the reference re-derives luma
    // from ImageIO's full YCbCr->RGB pixels — per-pixel rounding of
    // the chroma path can wobble borderline cells, so the claim is
    // near-identity, not bit equality
    val ref = refDhash(readBack(bytes))
    assert(hamming(got.longValue(), ref) <= 3,
      f"luma-vs-RGB hash drift ${hamming(got.longValue(), ref)} bits " +
        f"(got ${got.longValue()}%016x ref $ref%016x)")
  }

  test("cross-container drift is small: JPEG vs PNG of the same seeds") {
    // JPEG is lossy — quantization moves a few dHash bits relative to
    // the lossless containers. Pin the measured envelope: the planted
    // gates never rely on cross-lossy equality (identical JPEG BYTES
    // hash identically), but near-dup blocking at hamming <= 3 must
    // remain plausible across re-encodes for the corpus's blocky
    // pixel model, and measured drift here is 0-2 bits.
    for (seeds <- Seq(7L * 4294967296L + 1L, 42L * 4294967296L,
        777000777L * 4294967296L + 3L)) {
      val j = DHash.compute(JpegImage.build(72, 64, seeds)).longValue()
      val p = DHash.compute(PngImage.build(72, 64, seeds)).longValue()
      assert(hamming(j, p) <= 3,
        s"cross-container drift ${hamming(j, p)} bits for seeds=$seeds")
    }
  }

  test("malformed/unsupported JPEGs return NULL, not an exception") {
    val good = JpegImage.build(72, 64, 7L * 4294967296L + 1L)
    assert(DHash.compute(good.take(good.length / 2)) === null)
    assert(DHash.compute(good.take(4)) === null)
    assert(DHash.compute(Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xd9.toByte)) === null)
    // progressive JPEG (SOF2) is declared unsupported: flip the SOF
    // marker byte and expect a clean NULL
    val idx = {
      var i = -1
      var p = 2
      while (i < 0 && p + 4 < good.length) {
        if ((good(p) & 0xff) == 0xff && (good(p + 1) & 0xff) == 0xc0) i = p
        else {
          val len = ((good(p + 2) & 0xff) << 8) | (good(p + 3) & 0xff)
          p += 2 + len
        }
      }
      i
    }
    assert(idx > 0, "no SOF0 in the built JPEG?")
    val prog = good.clone()
    prog(idx + 1) = 0xc2.toByte
    assert(DHash.compute(prog) === null)
    // dimension bomb: huge declared SOF dims
    val bomb = good.clone()
    bomb(idx + 5) = 0x7f.toByte; bomb(idx + 6) = 0xff.toByte
    bomb(idx + 7) = 0x7f.toByte; bomb(idx + 8) = 0xff.toByte
    assert(DHash.compute(bomb) === null)
  }

  test("column form and SQL registration work end-to-end") {
    org.apache.spark.sql.GraftColumnBridge.registerFunctions(spark)
    val viaSql = spark.sql(
      "SELECT dhash(jpeg_image(72, 64, CAST(4294967296 * 7 + 1 AS BIGINT))) AS h")
      .head().getLong(0)
    assert(viaSql ===
      DHash.compute(JpegImage.build(72, 64, 7L * 4294967296L + 1L)).longValue())
    val viaCol = Seq(Tuple1(7L * 4294967296L + 1L)).toDF("s")
      .select(DHash.dhash(JpegImage.jpegImage(lit(72), lit(64), col("s"))))
      .head().getLong(0)
    assert(viaCol === viaSql)
  }
}
