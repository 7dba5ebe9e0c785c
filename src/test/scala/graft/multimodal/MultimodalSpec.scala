package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def records = {
    Seq(
      MediaRecord(1L, "video/fake", Array.tabulate[Byte](640)(_.toByte)),
      MediaRecord(2L, "video/fake", Array.tabulate[Byte](100)(_.toByte)),
      MediaRecord(3L, "video/fake", Array.empty[Byte])
    ).toDS()
  }

  test("extractMeta dispatches on magic bytes to the real container parsers") {
    import graft.expressions.{Mp4Header, PngHeader, WavHeader}
    val mixed = Seq(
      MediaRecord(1L, "x", PngHeader.build(640, 480)),
      MediaRecord(2L, "x", WavHeader.build(16000, 100)),
      MediaRecord(3L, "x", Mp4Header.build(600, 3000, 2)),
      MediaRecord(4L, "x", "plain old text".getBytes("UTF-8")),
      MediaRecord(5L, "x", Array.empty[Byte])
    ).toDS()
    val m = Multimodal.extractMeta(mixed).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(m(1L).getAs[String]("container") === "png")
    assert(m(1L).getAs[Int]("width") === 640)
    assert(m(1L).getAs[Int]("height") === 480)
    assert(m(2L).getAs[String]("container") === "wav")
    assert(m(2L).getAs[Int]("sample_rate") === 16000)
    assert(m(2L).getAs[Int]("channels") === 1)
    assert(m(2L).getAs[Long]("n_samples") === 100L)
    assert(m(3L).getAs[String]("container") === "isom")
    assert(m(3L).getAs[Int]("timescale") === 600)
    assert(m(3L).getAs[Long]("duration_ticks") === 3000L)
    assert(m(3L).getAs[Int]("n_tracks") === 2)
    // unknown containers are quarantined explicitly, never faked
    assert(m(4L).getAs[String]("container") === "unknown")
    assert(m(4L).isNullAt(m(4L).fieldIndex("width")))
    assert(m(4L).getAs[Long]("byte_len") === 14L)
    assert(m(5L).getAs[String]("container") === "unknown")
    assert(m(5L).getAs[Long]("byte_len") === 0L)
  }

  test("extractMeta quarantines a lying magic (bad body) as unknown") {
    // RIFF....WAVE prefix but a truncated/garbage chunk list: the
    // parser's structural validation must NULL out, landing the row in
    // the unknown branch rather than emitting garbage params
    val bad = "RIFFxxxxWAVE".getBytes("ISO-8859-1")
    val m = Multimodal.extractMeta(
      Seq(MediaRecord(9L, "x", bad)).toDS()).head()
    assert(m.getAs[String]("container") === "unknown")
    assert(m.isNullAt(m.fieldIndex("sample_rate")))
  }

  test("sampleFrames emits every stride-th fixed-size window") {
    val f = Multimodal.sampleFrames(records, stride = 2, frameBytes = 64)
      .collect().groupBy(_.media_id)
    // 640/64 = 10 frames, stride 2 -> indices 0,2,4,6,8
    assert(f(1L).map(_.frame_index).sorted.toSeq === Seq(0, 2, 4, 6, 8))
    assert(f(1L).forall(_.frame_payload.length === 64))
    // 100/64 -> 1 frame; empty payload -> 1 (empty) frame row
    assert(f(2L).length === 1)
    assert(f(3L).length === 1 && f(3L).head.frame_payload.isEmpty)
  }

  test("sharedFramePairs pairs media by common frame fingerprints") {
    // media 1 and 4: identical payloads -> share every frame; byte
    // values wrap mod 256 so the 10 windows hold only 4 DISTINCT
    // contents (period 256/64), and fingerprints count distinct;
    // media 5 shares only the first 128 bytes (frames 0-1) with them;
    // media 2 (different bytes at every position after tabulate offset)
    // shares nothing
    val recs = Seq(
      MediaRecord(1L, "v", Array.tabulate[Byte](640)(_.toByte)),
      MediaRecord(4L, "v", Array.tabulate[Byte](640)(_.toByte)),
      MediaRecord(5L, "v",
        Array.tabulate[Byte](640)(i => if (i < 128) i.toByte else (i + 7).toByte)),
      MediaRecord(2L, "v", Array.tabulate[Byte](640)(i => (i + 1).toByte))
    ).toDS()
    val pairs = Multimodal.sharedFramePairs(recs, stride = 1, frameBytes = 64)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 4L)) === 4L)
    assert(pairs((1L, 5L)) === 2L)
    assert(pairs((4L, 5L)) === 2L)
    assert(!pairs.keySet.exists(p => p._1 == 2L || p._2 == 2L))
    // minShared filters weak overlaps
    val strict = Multimodal.sharedFramePairs(recs, stride = 1, frameBytes = 64,
      minShared = 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict === Set((1L, 4L)))
    // a degenerate frame shared by everything is capped out
    val capped = Multimodal.sharedFramePairs(recs, stride = 1, frameBytes = 64,
      maxFrameDf = 1).collect()
    assert(capped.isEmpty)
  }

  test("resize maps any payload to exactly targetBytes") {
    val out = Multimodal.resize(records, targetBytes = 32).collect()
    assert(out.forall(_.payload.length === 32))
    // deterministic: first byte of media 1 is src(0)
    assert(out.find(_.media_id == 1L).get.payload(0) === 0.toByte)
  }
}
