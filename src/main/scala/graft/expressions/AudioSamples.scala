package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Deterministic FULL-PCM WAV builder — the audio counterpart of
  * [[PngImage]] (and the content-level sibling of [[WavHeader]], which
  * emits a 44-byte header with an empty data chunk): a complete mono
  * 16-bit PCM WAV whose samples are a pure function of
  * `(seed, noiseSeed, t)`. The test corpus has no real audio, so
  * perceptual-dedup queries BUILD payloads on-cluster and certify the
  * decode→fingerprint path on them.
  *
  * Signal model: 64 equal time segments, each a square wave (period 16
  * samples) whose amplitude is an avalanche mix of `(seed, segment)` —
  * a blocky loudness envelope, so two payloads with the same `seed`
  * share their coarse energy contour. `noiseSeed != 0` overrides
  * ~1/64 of samples with noise-derived values: same-seed payloads with
  * different noise seeds are PERCEPTUAL near-duplicates, different
  * seeds are unrelated — the [[PngImage]] family scheme, for audio. */
case class WavTone(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (IntegerType, IntegerType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int rate, int samples, bigint seeds), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_tone"

  override protected def nullSafeEval(r: Any, n: Any, seeds: Any): Any =
    WavTone.build(r.asInstanceOf[Int], n.asInstanceOf[Int],
      seeds.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, n, s) =>
      s"graft.expressions.WavTone$$.MODULE$$.build($r, $n, $s)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): WavTone =
    copy(first = f, second = s, third = t)
}

object WavTone {

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Sample value at index `t` of `n` total (16-bit signed). */
  def sample(seed: Long, noiseSeed: Long, t: Int, n: Int): Int = {
    val seg = (t.toLong * 64L / n).toInt
    val amp = (mix(seed * 2099L + seg) & 0x3fffL).toInt // 0..16383
    val base = if (((t / 16) & 1) == 0) amp else -amp   // square wave
    if (noiseSeed == 0L) base
    else {
      val nz = mix(noiseSeed * 4099L + t)
      if ((nz & 63L) == 0L) ((nz >>> 8) & 0x7fffL).toInt - 16384 else base
    }
  }

  /** `seeds` packs (seed, noiseSeed) as seed·2³² + noiseSeed — the
    * [[PngImage.build]] convention. */
  def build(sampleRate: Int, nSamples: Int, seeds: Long): Array[Byte] = {
    require(sampleRate >= 1 && nSamples >= 1 && nSamples <= (1 << 24),
      s"wav_tone args out of range: rate=$sampleRate n=$nSamples")
    val seed = seeds >>> 32
    val noiseSeed = seeds & 0xffffffffL
    val out = new Array[Byte](44 + nSamples * 2)
    System.arraycopy(WavHeader.build(sampleRate, nSamples), 0, out, 0, 44)
    var t = 0
    while (t < nSamples) {
      val v = sample(seed, noiseSeed, t, nSamples)
      out(44 + t * 2) = v.toByte
      out(44 + t * 2 + 1) = (v >> 8).toByte
      t += 1
    }
    out
  }

  /** Column form; seed/noise packed into one long. */
  def wavTone(rate: Column, nSamples: Column, seeds: Column): Column =
    GraftColumnBridge.column(WavTone(
      GraftColumnBridge.expression(rate),
      GraftColumnBridge.expression(nSamples),
      GraftColumnBridge.expression(seeds)))
}

/** 64-bit perceptual ENERGY-DELTA fingerprint of an encoded audio
  * payload — the [[DHash]] analog for audio (public shape: the
  * coarse loudness contour survives small perturbations, so adjacent-
  * frame energy comparisons yield a noise-tolerant signature):
  * decode mono 16-bit PCM WAV (RIFF chunk walk, no codec lib), split
  * the samples into 65 equal frames by integer boundaries, sum
  * |sample| per frame (exact BIGINT energy), emit bit f =
  * energy[f+1] > energy[f]. Brightness/volume scaling preserves the
  * comparisons; sparse sample noise moves few bits — hamming-band
  * blocking over the fingerprint (the SimHash bander,
  * pigeonhole-lossless at distance ≤ 3) finds near-duplicate AUDIO,
  * the stage q82 (container metadata) structurally misses.
  *
  * NULL for anything unparseable: wrong container, non-PCM,
  * non-mono, non-16-bit, a declared data chunk longer than the
  * payload (e.g. [[WavHeader]]'s header-only builds), or fewer than
  * 65 samples. Every step integer-deterministic. */
case class AudioFp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_fp"

  override protected def nullSafeEval(b: Any): Any =
    AudioFp.compute(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.freshName("afp")
    nullSafeCodeGen(ctx, ev, c =>
      s"""java.lang.Long $v = graft.expressions.AudioFp$$.MODULE$$.compute($c);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v.longValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): AudioFp =
    copy(child = newChild)
}

object AudioFp {

  private val Frames = 65

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3)

  def compute(b: Array[Byte]): java.lang.Long = {
    if (b.length < 44 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    // chunk walk: need fmt (PCM, mono, 16-bit) and the data extent.
    // The offset is tracked in LONG: a crafted chunk size near 2³¹
    // would wrap an Int offset negative, slip past the `i + 8 <=
    // length` guard, and crash the tag read — the walk must return
    // NULL on malformed sizes, never throw.
    var i = 12L
    var ok = false
    var dataOff = -1
    var dataLen = -1
    while (i + 8 <= b.length && (!ok || dataOff < 0)) {
      val ii = i.toInt
      val sz = le32(b, ii + 4)
      if (sz < 0) return null
      if (tag(b, ii, "fmt ")) {
        if (ii + 8 + 16 > b.length) return null
        ok = le16(b, ii + 8) == 1 && le16(b, ii + 10) == 1 &&
          le16(b, ii + 22) == 16
      } else if (tag(b, ii, "data")) {
        dataOff = ii + 8; dataLen = sz
      }
      i += 8L + sz + (sz & 1) // chunks pad to even
    }
    if (!ok || dataOff < 0 || dataLen < 0 ||
      dataOff.toLong + dataLen > b.length) return null
    val n = dataLen / 2
    if (n < Frames) return null
    val energy = new Array[Long](Frames)
    var f = 0
    while (f < Frames) {
      val t0 = (f.toLong * n / Frames).toInt
      val t1 = ((f + 1).toLong * n / Frames).toInt
      var s = 0L
      var t = t0
      while (t < t1) {
        val v = (le16(b, dataOff + t * 2) << 16) >> 16 // sign-extend
        s += math.abs(v.toLong)
        t += 1
      }
      energy(f) = s
      f += 1
    }
    var hash = 0L
    f = 0
    while (f < Frames - 1) {
      if (energy(f + 1) > energy(f)) hash |= 1L << f
      f += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** Column form. */
  def audioFp(c: Column): Column =
    GraftColumnBridge.column(AudioFp(GraftColumnBridge.expression(c)))
}
