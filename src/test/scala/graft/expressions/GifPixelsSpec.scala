package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[GifImage]] build → [[DHash]] GIF decode certified three ways:
  * (1) pixel-model parity — a GIF and a PNG built from the same seeds
  * must hash identically (the grayscale-ramp palette makes index =
  * luma exactly); (2) against the JDK's own image stack — ImageIO
  * decodes our built GIFs pixel-exactly (independent LZW/container
  * conformance proof, including CLEAR-reset streams from random
  * indices), and DHash decodes ImageIO-WRITTEN GIFs (independent
  * encoder proof — ImageIO picks its own palette and code stream);
  * (3) malformed payloads return NULL. */
class GifPixelsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference dHash from decoded pixels — the expression's integer
    * definition (9×8 area means, horizontal comparisons). */
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
    assert(img != null, "ImageIO rejected the built GIF")
    img
  }

  test("GIF and PNG built from the same seeds share one dHash") {
    for (seeds <- Seq(7L * 4294967296L + 1L, 777000777L * 4294967296L + 3L,
        42L * 4294967296L); (w, h) <- Seq((72, 64), (40, 30), (9, 8))) {
      val gif = DHash.compute(GifImage.build(w, h, seeds))
      val png = DHash.compute(PngImage.build(w, h, seeds))
      assert(gif != null && png != null)
      assert(gif.longValue() === png.longValue(),
        s"GIF/PNG hash divergence at ${w}x$h seeds=$seeds")
    }
  }

  test("ImageIO decodes the built GIF pixel-exactly; dHash matches reference") {
    for (seeds <- Seq(7L * 4294967296L + 1L, 9L * 4294967296L + 5L)) {
      val bytes = GifImage.build(72, 64, seeds)
      val img = readBack(bytes)
      assert(img.getWidth === 72 && img.getHeight === 64)
      val seed = seeds >>> 32; val noise = seeds & 0xffffffffL
      for (y <- 0 until 64; x <- 0 until 72) {
        val expect = PngImage.pixel(seed, noise, x, y)
        assert((img.getRGB(x, y) & 0xff) === expect,
          s"pixel mismatch at ($x,$y)")
      }
      assert(DHash.compute(bytes).longValue() === refDhash(img))
    }
  }

  test("random index streams force LZW CLEAR resets and still round-trip") {
    // incompressible input: the 4096-entry table fills after ~3.8k
    // codes, so 20k random indices guarantee multiple CLEAR resets in
    // the encoder — ImageIO (independent decoder) must recover every
    // index, and DHash's own LZW must agree with the reference hash
    val rng = new scala.util.Random(1234)
    val (w, h) = (200, 100)
    val idx = Array.fill(w * h)(rng.nextInt(256))
    val bytes = GifImage.buildFromIndices(w, h, idx)
    val img = readBack(bytes)
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRGB(x, y) & 0xff) === idx(y * w + x),
        s"LZW round-trip mismatch at ($x,$y)")
    assert(DHash.compute(bytes).longValue() === refDhash(img))
  }

  test("DHash decodes ImageIO-written GIF (independent encoder, interlaced)") {
    val rng = new scala.util.Random(77)
    val img = new java.awt.image.BufferedImage(
      96, 80, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 80; x <- 0 until 96)
      img.setRGB(x, y, rng.nextInt(0x1000000))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos),
      "ImageIO cannot write gif")
    val bytes = bos.toByteArray
    // compare against ImageIO's OWN read-back of the quantized file
    val quantized = readBack(bytes)
    val got = DHash.compute(bytes)
    assert(got != null, "DHash rejected an ImageIO-written GIF")
    assert(got.longValue() === refDhash(quantized))
  }

  test("malformed GIFs return NULL, not an exception") {
    val good = GifImage.build(72, 64, 7L * 4294967296L + 1L)
    assert(DHash.compute(good.take(good.length / 2)) === null)
    assert(DHash.compute(good.take(13)) === null)
    assert(DHash.compute("GIF89a then junk that is not a gif".getBytes) === null)
    val idOff = 13 + 768 // header + GCT
    assert(good(idOff) === 0x2c.toByte)
    // crafted logical-screen/image dims past the pixel cap
    val huge = good.clone()
    huge(idOff + 5) = 0xff.toByte; huge(idOff + 6) = 0xff.toByte
    huge(idOff + 7) = 0xff.toByte; huge(idOff + 8) = 0xff.toByte
    assert(DHash.compute(huge) === null)
    // trailer with no image block (header-only container)
    val headerOnly = good.take(13 + 768) :+ 0x3b.toByte
    assert(DHash.compute(headerOnly) === null)
  }

  test("column form and SQL registration work end-to-end") {
    org.apache.spark.sql.GraftColumnBridge.registerFunctions(spark)
    val viaSql = spark.sql(
      "SELECT dhash(gif_image(72, 64, CAST(4294967296 * 7 + 1 AS BIGINT))) AS h")
      .head().getLong(0)
    assert(viaSql ===
      DHash.compute(GifImage.build(72, 64, 7L * 4294967296L + 1L)).longValue())
    val viaCol = Seq(Tuple1(7L * 4294967296L + 1L)).toDF("s")
      .select(DHash.dhash(GifImage.gifImage(lit(72), lit(64), col("s"))))
      .head().getLong(0)
    assert(viaCol === viaSql)
  }
}
