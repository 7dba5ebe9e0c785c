package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal record: an opaque binary payload plus typed metadata.
  * Image/audio/video bytes ride through the pipeline as `binary` columns;
  * only narrow metadata is materialized relationally. */
case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

/** Extracted (stub) media features. */
case class MediaMeta(
    media_id: Long,
    kind: String,
    byte_len: Long,
    fake_width: Long,
    fake_height: Long,
    fake_frames: Long)

/** One sampled frame of a media payload. */
case class MediaFrame(
    media_id: Long,
    frame_index: Int,
    frame_payload: Array[Byte])

/** Multimodal-column plumbing: schema, partition-wise batch decode, and
  * feature extraction signatures.
  *
  * The actual decoders (image/audio libs) are NOT available in this
  * container, so [[stubDecode]] is a clearly-marked deterministic fake —
  * the Spark-side plumbing (binary columns, typed Dataset encoders,
  * mapPartitions batch shape, partition sizing) is real and tested. In
  * production, swap `stubDecode` for a JNI/FFI decoder invoked once per
  * partition so per-batch library init amortizes — exactly the shape
  * `mapPartitions` provides.
  */
object Multimodal {

  /** STUB: deterministic fake decode. Replace with a real decoder.
    * Derives pretend dimensions from the payload length only, so the
    * values are reproducible by the SQL oracle. */
  def stubDecode(r: MediaRecord): MediaMeta = {
    val len = r.payload.length.toLong
    MediaMeta(
      media_id = r.media_id,
      kind = r.kind,
      byte_len = len,
      fake_width = len % 640,
      fake_height = (len / 640) % 480,
      fake_frames = len % 30)
  }

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

  /** Batch feature extraction: one decoder instantiation per partition,
    * records streamed through it — the pattern a real image/audio decoder
    * needs. Output is a typed Dataset with a narrow relational schema. */
  def extractMeta(records: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    val spark = records.sparkSession
    import spark.implicits._
    batchMap(records)(stubDecode)
  }

  /** The general per-partition batch shape with a pluggable kernel: the
    * production entry point where `stubDecode`-style fakes are swapped
    * for a real JNI/FFI decoder. The kernel factory runs ONCE per
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
