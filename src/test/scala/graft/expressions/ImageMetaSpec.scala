package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Byte-level image header parsing: real formats constructed in the
  * test, parsed distributed through the codegen'd kernel. */
class ImageMetaSpec extends SparkSpec {
  import spark.implicits._

  private def parse(payloads: Seq[Array[Byte]]) =
    payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "payload")
      .withColumn("m", ImageMeta.imageMeta(col("payload")))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"))
      .orderBy("id")
      .collect()
      .map(r => if (r.isNullAt(1)) None else Some((r.getString(1), r.getInt(2), r.getInt(3))))

  private def gif(w: Int, h: Int): Array[Byte] =
    Array[Byte]('G', 'I', 'F', '8', '9', 'a',
      (w & 0xff).toByte, (w >> 8).toByte, (h & 0xff).toByte, (h >> 8).toByte,
      0, 0, 0)

  private def bmp(w: Int, h: Int): Array[Byte] = {
    val b = new Array[Byte](26)
    b(0) = 'B'; b(1) = 'M'
    def le32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
    }
    le32(18, w); le32(22, h)
    b
  }

  /** JFIF-style JPEG: SOI, APP0 (16 bytes), DQT segment, then SOF0. */
  private def jpeg(w: Int, h: Int): Array[Byte] = {
    def seg(marker: Int, body: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte,
        ((body.length + 2) >> 8).toByte, ((body.length + 2) & 0xff).toByte) ++ body
    val sof = Array[Byte](8,
      (h >> 8).toByte, (h & 0xff).toByte, (w >> 8).toByte, (w & 0xff).toByte, 3)
    Array(0xff.toByte, 0xd8.toByte) ++
      seg(0xe0, Array.fill[Byte](14)(0)) ++   // APP0
      seg(0xdb, Array.fill[Byte](65)(1)) ++   // DQT
      seg(0xc0, sof)
  }

  test("png/gif/bmp/jpeg dimensions parse; garbage and truncation are NULL") {
    val got = parse(Seq(
      PngHeader.build(1920, 1080),
      gif(320, 200),
      bmp(640, 480),
      jpeg(1024, 768),
      "not an image at all..........".getBytes,
      PngHeader.build(1, 1).take(20),          // truncated mid-IHDR
      Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte) // SOI+EOI only
    ))
    assert(got.toSeq === Seq(
      Some(("png", 1920, 1080)),
      Some(("gif", 320, 200)),
      Some(("bmp", 640, 480)),
      Some(("jpeg", 1024, 768)),
      None, None, None))
  }

  test("bottom-up and top-down BMP heights both come out positive") {
    assert(parse(Seq(bmp(10, -20))).head === Some(("bmp", 10, 20)))
  }

  test("png_header emits a spec-conformant chunk (length, type, CRC)") {
    val b = PngHeader.build(33, 44)
    assert(b.length === 33)
    // chunk length 13, type IHDR
    assert((b(8), b(9), b(10), b(11)) === ((0.toByte, 0.toByte, 0.toByte, 13.toByte)))
    assert(new String(b.slice(12, 16)) === "IHDR")
    // CRC over type+data matches a fresh computation
    val crc = new java.util.zip.CRC32
    crc.update(b, 12, 17)
    val stored = ((b(29) & 0xffL) << 24) | ((b(30) & 0xffL) << 16) |
      ((b(31) & 0xffL) << 8) | (b(32) & 0xffL)
    assert(stored === (crc.getValue & 0xffffffffL))
  }

  test("SQL registration: image_meta(png_header(w, h)) round-trips") {
    org.apache.spark.sql.GraftColumnBridge.registerFunctions(spark)
    val r = spark.sql(
      "SELECT image_meta(png_header(12, 34)) AS m").select("m.format", "m.width", "m.height")
      .as[(String, Int, Int)].head()
    assert(r === (("png", 12, 34)))
  }

  test("audio: wav_header -> audio_meta round-trips; junk/truncation NULL") {
    val built = WavHeader.build(16000, 480)
    val got = Seq((1L, built), (2L, "RIFFxxxxJUNK".getBytes),
        (3L, built.take(30)))
      .toDF("id", "payload")
      .withColumn("m", AudioMeta.audioMeta(col("payload")))
      .select(col("id"), col("m.format"), col("m.sample_rate"),
        col("m.channels"), col("m.bits_per_sample"), col("m.n_samples"))
      .orderBy("id").collect()
    assert(!got(0).isNullAt(1))
    assert((got(0).getString(1), got(0).getInt(2), got(0).getInt(3),
      got(0).getInt(4), got(0).getLong(5)) === (("wav", 16000, 1, 16, 480L)))
    assert(got(1).isNullAt(1), "junk RIFF parsed")
    assert(got(2).isNullAt(1), "truncated fmt chunk parsed")
  }

  test("audio: odd-sized chunk before data is word-aligned correctly") {
    // RIFF/WAVE + a 3-byte LIST chunk (odd -> 1 pad byte) + fmt + data
    val fmtAndData = WavHeader.build(8000, 10).drop(12) // fmt+data section
    val odd = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0)
    val payload = WavHeader.build(8000, 10).take(12) ++ odd ++ fmtAndData
    val m = Seq((1L, payload)).toDF("id", "payload")
      .select(AudioMeta.audioMeta(col("payload")).as("m"))
      .select("m.sample_rate", "m.n_samples").as[(Int, Long)].head()
    assert(m === ((8000, 10L)))
  }
}
