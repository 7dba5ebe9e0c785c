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

  test("extractMeta derives deterministic metadata from payload bytes") {
    val m = Multimodal.extractMeta(records).collect().map(r => r.media_id -> r).toMap
    assert(m(1L).byte_len === 640L)
    assert(m(1L).fake_width === 0L)  // 640 % 640
    assert(m(1L).fake_height === 1L) // (640/640) % 480
    assert(m(3L).byte_len === 0L)
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

  test("resize maps any payload to exactly targetBytes") {
    val out = Multimodal.resize(records, targetBytes = 32).collect()
    assert(out.forall(_.payload.length === 32))
    // deterministic: first byte of media 1 is src(0)
    assert(out.find(_.media_id == 1L).get.payload(0) === 0.toByte)
  }
}
