package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal record: an opaque binary payload plus typed metadata.
  * Image/audio/video bytes ride through the pipeline as `binary` columns;
  * only narrow metadata is materialized relationally. */
case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

/** One sampled frame of a media payload. */
case class MediaFrame(
    media_id: Long,
    frame_index: Int,
    frame_payload: Array[Byte])

/** Multimodal-column plumbing: container sniffing, header parsing,
  * partition-wise batch decode, and frame-level dedup.
  *
  * Header metadata is extracted by REAL byte-level parsers
  * ([[graft.expressions.ImageMeta]] PNG/GIF/BMP/JPEG,
  * [[graft.expressions.AudioMeta]] RIFF/WAVE,
  * [[graft.expressions.VideoMeta]] ISO-BMFF) — codegen'd Catalyst
  * expressions, no codec library. Full payload DECODE (pixel/sample
  * data) would need image/audio libs this container lacks; [[batchMap]]
  * is the per-partition entry point where a production deployment
  * plugs a JNI/FFI decoder so per-batch library init amortizes.
  */
object Multimodal {

  /** Wrap a text table as binary media records (the test corpus has no
    * real media; payload = UTF-8 bytes of the text column). */
  def asMediaRecords(
      df: DataFrame,
      idCol: String,
      textCol: String,
      kind: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("media_id"),
        lit(kind).as("kind"),
        encode(col(textCol), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Container-sniffed metadata extraction: magic-byte prefix checks
    * dispatch each payload to the REAL parser for its container —
    * PNG/GIF/BMP/JPEG dimensions ([[graft.expressions.ImageMeta]]),
    * RIFF/WAVE audio params ([[graft.expressions.AudioMeta]]),
    * ISO-BMFF movie headers ([[graft.expressions.VideoMeta]]). A
    * payload matching no known magic, or failing its parser's
    * structural validation, lands in the explicit `unknown`-container
    * branch carrying byte-length-only metadata (NULL parser fields) —
    * quarantined visibly, never faked. Pure column expressions
    * end-to-end: the sniff is a handful of binary prefix equality
    * checks and every parser is a codegen'd Catalyst expression, so
    * extraction stays inside whole-stage codegen — no UDF, no shuffle,
    * trivially scan-parallel at any corpus size. */
  def extractMeta(records: Dataset[MediaRecord]): DataFrame = {
    import graft.expressions.{AudioMeta, ImageMeta, VideoMeta}
    val p = col("payload")
    def magic(off: Int, s: String): Column =
      substring(p, off, s.length) === lit(s.getBytes("ISO-8859-1"))
    val isImage = magic(1, "\u0089PNG") || magic(1, "GIF8") ||
      magic(1, "BM") || magic(1, "\u00FF\u00D8")
    val isWave = magic(1, "RIFF") && magic(9, "WAVE")
    val isBmff = magic(5, "ftyp")
    val img = when(isImage, ImageMeta.imageMeta(p))
    val aud = when(isWave, AudioMeta.audioMeta(p))
    val vid = when(isBmff, VideoMeta.videoMeta(p))
    records.toDF().select(
      col("media_id"), col("kind"),
      length(p).cast("long").as("byte_len"),
      coalesce(
        img.getField("format"), aud.getField("format"),
        vid.getField("brand"), lit("unknown")).as("container"),
      img.getField("width").as("width"),
      img.getField("height").as("height"),
      aud.getField("sample_rate").as("sample_rate"),
      aud.getField("channels").as("channels"),
      aud.getField("bits_per_sample").as("bits_per_sample"),
      aud.getField("n_samples").as("n_samples"),
      vid.getField("timescale").as("timescale"),
      vid.getField("duration_ticks").as("duration_ticks"),
      vid.getField("n_tracks").as("n_tracks"))
  }

  /** The general per-partition batch shape with a pluggable kernel: the
    * production entry point for full payload decoding, where a JNI/FFI
    * decoder replaces the kernel. The kernel factory runs ONCE per
    * partition (amortizing decoder/library init), then records stream
    * through the returned function. */
  def batchMap[T: org.apache.spark.sql.Encoder](
      records: Dataset[MediaRecord])(kernel: MediaRecord => T): Dataset[T] =
    records.mapPartitions { it =>
      // expensive per-partition init (decoder handles, model weights)
      // would happen here, captured by the closure below
      it.map(kernel)
    }

  /** STUB frame sampling: every `stride`-th fixed-size byte window of
    * the payload stands in for a decoded video frame. Real decoders
    * replace the slicing, not the plumbing: one row per sampled frame,
    * frames of one media item stay in the producing partition (no
    * shuffle), downstream ops key on (media_id, frame_index). */
  def sampleFrames(
      records: Dataset[MediaRecord],
      stride: Int,
      frameBytes: Int = 64): Dataset[MediaFrame] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.flatMap { r =>
      val n = math.max(1, r.payload.length / frameBytes)
      (0 until n by stride).map { i =>
        MediaFrame(r.media_id, i,
          r.payload.slice(i * frameBytes,
            math.min((i + 1) * frameBytes, r.payload.length)))
      }
    }
  }

  /** Cross-media shared-frame near-duplicate pairs — the video-dedup
    * shape: sample frames, fingerprint each frame's BYTES, build a
    * frame-hash inverted index, and pair media items sharing ≥
    * `minShared` distinct frame fingerprints. The frame hash is the
    * shuffle/join key, so the pair space is per-fingerprint local;
    * `maxFrameDf` drops degenerate fingerprints (a black/silent frame
    * appearing in half the corpus would go quadratic — same cap as the
    * text LSH buckets). Exact given the sampling parameters, but not
    * SQL-expressible here (no BLOB windowing in the oracle engine) →
    * rows-only checked with a planted identical pair in q51.
    *
    * @return (id_a, id_b, n_shared) with id_a < id_b
    */
  def sharedFramePairs(
      records: Dataset[MediaRecord],
      stride: Int = 1,
      frameBytes: Int = 64,
      maxFrameDf: Int = 100000,
      minShared: Int = 1): DataFrame = {
    val frames = sampleFrames(records, stride, frameBytes).toDF()
      .select(col("media_id"), md5(col("frame_payload")).as("fh"))
      .distinct()
    val capped = graft.dedup.Dedup.capBuckets(frames, maxFrameDf, Seq("fh"))
    capped.as("l")
      .join(capped.as("r"),
        col("l.fh") === col("r.fh") && col("l.media_id") < col("r.media_id"))
      .groupBy(col("l.media_id").as("id_a"), col("r.media_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Exact (stride = 1) shared-frame partners of a PROBE subset
    * against the whole corpus — the truth set for measuring
    * [[sharedFramePairs]]' sampling recall. Only probe-side frames
    * seed the join, so the cost is the inverted-index lookup of the
    * probes' frames — linear in corpus frame count, never all-pairs.
    * `countDistinct` on the frame hash collapses direction duplicates
    * when both endpoints are probes. */
  def probeSharedFrameTruth(
      records: Dataset[MediaRecord],
      probePred: Column,
      frameBytes: Int = 64,
      maxFrameDf: Int = 100000,
      minShared: Int = 1): DataFrame = {
    val frames = sampleFrames(records, 1, frameBytes).toDF()
      .select(col("media_id"), md5(col("frame_payload")).as("fh"))
      .distinct()
    val capped = graft.dedup.Dedup.capBuckets(frames, maxFrameDf, Seq("fh"))
    capped.where(probePred).as("l")
      .join(capped.as("r"),
        col("l.fh") === col("r.fh") && col("l.media_id") =!= col("r.media_id"))
      .groupBy(
        least(col("l.media_id"), col("r.media_id")).as("id_a"),
        greatest(col("l.media_id"), col("r.media_id")).as("id_b"))
      .agg(countDistinct(col("l.fh")).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** STUB resize: deterministic byte down/up-sampling to `targetBytes`
    * standing in for an image resize — preserves the payload-as-binary
    * contract so the pipeline shape (binary in, binary out, metadata
    * untouched) is real. */
  def resize(
      records: Dataset[MediaRecord],
      targetBytes: Int): Dataset[MediaRecord] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val src = r.payload
        val out = Array.tabulate[Byte](targetBytes) { i =>
          if (src.isEmpty) 0 else src((i.toLong * src.length / targetBytes).toInt)
        }
        r.copy(payload = out)
      }
    }
  }
}
