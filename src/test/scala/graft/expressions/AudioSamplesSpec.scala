package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[WavTone]] build → [[AudioFp]] decode certified against the JDK's
  * OWN audio stack: javax.sound decodes our built WAVs (independent
  * container-conformance proof) and yields the samples from which a
  * reference fingerprint is computed here. */
class AudioSamplesSpec extends SparkSpec {
  import spark.implicits._

  private def decodeViaJavax(bytes: Array[Byte]): Array[Int] = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getChannels === 1 && fmt.getSampleSizeInBits === 16)
    val raw = in.readAllBytes()
    val out = new Array[Int](raw.length / 2)
    var t = 0
    while (t < out.length) {
      out(t) = ((raw(t * 2) & 0xff) | (raw(t * 2 + 1) << 8)).toShort.toInt
      t += 1
    }
    out
  }

  private def refFp(samples: Array[Int]): Long = {
    val n = samples.length
    val e = (0 until 65).map { f =>
      val (t0, t1) = ((f.toLong * n / 65).toInt, ((f + 1).toLong * n / 65).toInt)
      (t0 until t1).map(t => math.abs(samples(t).toLong)).sum
    }
    var hash = 0L
    for (f <- 0 until 64) if (e(f + 1) > e(f)) hash |= 1L << f
    hash
  }

  test("AudioFp of a built WAV matches a javax.sound-decoded reference") {
    for (seed <- Seq(1L, 9L, 303L); noise <- Seq(0L, 2L)) {
      val bytes = WavTone.build(16000, 6400, seed * 4294967296L + noise)
      val samples = decodeViaJavax(bytes)
      assert(samples.length === 6400)
      // builder pixels round-trip through the JDK decoder
      for (t <- Seq(0, 99, 3200, 6399))
        assert(samples(t) === WavTone.sample(seed, noise, t, 6400),
          s"seed $seed noise $noise sample $t")
      val got = AudioFp.compute(bytes)
      assert(got !== null)
      assert(got.longValue() === refFp(samples), s"seed $seed noise $noise")
    }
  }

  test("AudioMeta parses the full-PCM build (container conformance)") {
    val bytes = WavTone.build(8000, 800, 7L * 4294967296L + 1L)
    val m = Seq(Tuple1(bytes)).toDF("b")
      .select(AudioMeta.audioMeta(col("b")).as("m"))
      .select(col("m.sample_rate"), col("m.channels"), col("m.n_samples"))
      .head()
    assert(m.getInt(0) === 8000 && m.getInt(1) === 1 && m.getLong(2) === 800L)
  }

  test("same-seed noise variants are near, different seeds far") {
    def fp(seed: Long, noise: Long): Long =
      AudioFp.compute(WavTone.build(16000, 6400,
        seed * 4294967296L + noise)).longValue()
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(fp(500L, 3L) === fp(500L, 3L))
    val near = (1L to 8L).map(s => ham(fp(s, 1L), fp(s, 2L)))
    val far = (1L to 8L).map(s => ham(fp(s, 1L), fp(s + 1000L, 1L)))
    assert(near.max <= 12, s"noise variants too far: $near")
    assert(far.min >= 15, s"unrelated seeds too close: $far")
  }

  test("unparseable payloads return NULL, not an exception") {
    assert(AudioFp.compute("not audio at all, sorry".getBytes) === null)
    assert(AudioFp.compute(Array[Byte]()) === null)
    // header-only WAV (q82's payload): declared data extends past the buffer
    assert(AudioFp.compute(WavHeader.build(16000, 6400)) === null)
    // too short for 65 frames
    assert(AudioFp.compute(WavTone.build(16000, 64, 4294967296L)) === null)
    val full = WavTone.build(16000, 6400, 4294967296L)
    assert(AudioFp.compute(full.take(2000)) === null)
  }

  test("crafted chunk sizes near 2^31/2^32 return NULL, not a crash") {
    def le32(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
      b(i + 2) = (v >>> 16).toByte; b(i + 3) = (v >>> 24).toByte
    }
    // RIFF/WAVE whose first chunk declares size 0x7fffff00: an Int
    // walk offset wraps negative, passes the `i + 8 <= length` guard,
    // and the tag read throws ArrayIndexOutOfBoundsException
    val b = new Array[Byte](128)
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    le32(b, 4, 120)
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    b(12) = 'J'; b(13) = 'U'; b(14) = 'N'; b(15) = 'K'
    le32(b, 16, 0x7fffff00)
    assert(AudioFp.compute(b) === null)
    assert(AudioMeta.parse(b) === null)
    // size 0xfffffff0: AudioMeta's unsigned-long size truncated to Int
    // went negative and walked the offset BACKWARDS (loop, bad reads)
    val b2 = b.clone()
    le32(b2, 16, 0xfffffff0)
    assert(AudioFp.compute(b2) === null)
    assert(AudioMeta.parse(b2) === null)
  }

  test("column forms and SQL registration work end-to-end") {
    org.apache.spark.sql.GraftColumnBridge.registerFunctions(spark)
    val viaSql = spark.sql(
      "SELECT audio_fp(wav_tone(16000, 6400, CAST(4294967296 * 7 + 1 AS BIGINT))) AS h")
      .head().getLong(0)
    assert(viaSql ===
      AudioFp.compute(WavTone.build(16000, 6400, 7L * 4294967296L + 1L))
        .longValue())
  }
}
