package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ISO-BMFF box-tree parsing: payloads built by Mp4Header (and by hand
  * for the hostile cases), parsed distributed through the codegen'd
  * kernel. */
class VideoMetaSpec extends SparkSpec {
  import spark.implicits._

  private def parse(payloads: Seq[Array[Byte]]) =
    payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "payload")
      .withColumn("m", VideoMeta.videoMeta(col("payload")))
      .select(col("id"), col("m.brand"), col("m.timescale"),
        col("m.duration_ticks"), col("m.n_tracks"))
      .orderBy("id")
      .collect()
      .map(r => if (r.isNullAt(1)) None
        else Some((r.getString(1), r.getInt(2), r.getLong(3), r.getInt(4))))

  test("build -> parse round trip across geometries; hostile inputs are NULL") {
    val wellFormed = Mp4Header.build(90000, 2700000, 2)
    val got = parse(Seq(
      wellFormed,
      Mp4Header.build(600, 0, 0),              // zero duration, no tracks
      Mp4Header.build(1000, 123456, 5),
      "definitely not a video".getBytes,
      wellFormed.take(30),                     // truncated inside moov
      {                                        // lying child size: csz > moov end
        val b = wellFormed.clone()
        b(24) = 0x7f; b                        // mvhd size now huge
      },
      Array[Byte](0, 0, 0, 0, 'f', 't', 'y', 'p') // size < 8
    ))
    assert(got.toSeq === Seq(
      Some(("isom", 90000, 2700000L, 2)),
      Some(("isom", 600, 0L, 0)),
      Some(("isom", 1000, 123456L, 5)),
      None, None, None, None))
  }

  test("mvhd version 1 (64-bit duration) parses") {
    // hand-build: ftyp + moov{mvhd v1}
    val mvhdSz = 8 + 4 + 8 + 8 + 4 + 8 // hdr, verflags, c/m 8+8, ts, dur64
    val moovSz = 8 + mvhdSz
    val b = new Array[Byte](16 + moovSz)
    def w4(i: Int, t: String): Unit =
      (0 until 4).foreach(j => b(i + j) = t(j).toByte)
    def be32(i: Int, v: Int): Unit = {
      b(i) = (v >> 24).toByte; b(i + 1) = (v >> 16).toByte
      b(i + 2) = (v >> 8).toByte; b(i + 3) = v.toByte
    }
    be32(0, 16); w4(4, "ftyp"); w4(8, "avc1"); be32(12, 0)
    be32(16, moovSz); w4(20, "moov")
    be32(24, mvhdSz); w4(28, "mvhd")
    b(32) = 1                                  // version 1
    be32(52, 48000)                            // timescale
    be32(56, 1); be32(60, 0)                   // duration = 1L << 32
    val got = parse(Seq(b))
    assert(got.toSeq === Seq(Some(("avc1", 48000, 1L << 32, 0))))
  }

  test("hostile box geometry: truncated or short-declared mvhd is NULL, not a crash") {
    def be32(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = (v >> 24).toByte; b(i + 1) = (v >> 16).toByte
      b(i + 2) = (v >> 8).toByte; b(i + 3) = v.toByte
    }
    def w4(b: Array[Byte], i: Int, t: String): Unit =
      (0 until 4).foreach(j => b(i + j) = t(j).toByte)
    // 32-byte payload: ftyp(16) + moov(16) whose only child declares
    // csz=8 'mvhd' — the version byte would sit at offset 32, one past
    // the end of the array
    val truncated = new Array[Byte](32)
    be32(truncated, 0, 16); w4(truncated, 4, "ftyp")
    w4(truncated, 8, "isom"); be32(truncated, 12, 0)
    be32(truncated, 16, 16); w4(truncated, 20, "moov")
    be32(truncated, 24, 8); w4(truncated, 28, "mvhd")
    // short-declared mvhd (csz=12, version 0) followed by a trak box:
    // timescale/duration would be decoded from the SIBLING's bytes
    val shortDecl = new Array[Byte](16 + 8 + 12 + 8)
    be32(shortDecl, 0, 16); w4(shortDecl, 4, "ftyp")
    w4(shortDecl, 8, "isom"); be32(shortDecl, 12, 0)
    be32(shortDecl, 16, 28); w4(shortDecl, 20, "moov")
    be32(shortDecl, 24, 12); w4(shortDecl, 28, "mvhd"); be32(shortDecl, 32, 0)
    be32(shortDecl, 36, 8); w4(shortDecl, 40, "trak")
    assert(parse(Seq(truncated, shortDecl)).toSeq === Seq(None, None))
  }

  test("mp4_header clamps absurd track counts instead of overflowing") {
    // 8 * 300M overflows Int without the clamp -> NegativeArraySizeException
    val b = Mp4Header.build(600, 100, 300000000)
    val got = parse(Seq(b))
    assert(got.head.map(_._4) === Some(1 << 20))
  }

  test("SQL registration: video_meta(mp4_header(ts, dur, k)) round-trips") {
    org.apache.spark.sql.GraftColumnBridge.registerFunctions(spark)
    val r = spark.sql(
      "SELECT video_meta(mp4_header(600, 3000, 2)) AS m")
      .select("m.brand", "m.timescale", "m.duration_ticks", "m.n_tracks")
      .as[(String, Int, Long, Int)].head()
    assert(r === (("isom", 600, 3000L, 2)))
  }

  test("kernel is codegen (no interpreted fallback in the projection)") {
    val df = Seq((1, Mp4Header.build(600, 600, 1))).toDF("id", "p")
      .select(VideoMeta.videoMeta(col("p")).as("m"))
    // would throw if doGenCode emitted uncompilable code; also assert a
    // value to make sure the path actually ran
    assert(df.head().getStruct(0).getInt(1) === 600)
  }
}
