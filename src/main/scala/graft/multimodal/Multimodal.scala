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
    records.mapPartitions { it =>
      // Real pipelines initialize the (expensive) decoder here, once per
      // partition, then stream records through it.
      it.map(stubDecode)
    }
  }
}
