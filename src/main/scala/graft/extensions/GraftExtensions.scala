package graft.extensions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{AudioMeta, BitmapFromIds, BitmapJaccard, CharNGrams, DeflateSize, DotProduct, ImageMeta, JaccardSim, LshBucket, Mp4Header, NfcNormalize, PngHeader, RollingHash, RollingWindows, SqDot, SqEncode, VideoMeta, WavHeader, WordNGrams}

/** Session extension wiring for graft's native expressions: configure
  * `spark.sql.extensions=graft.extensions.GraftExtensions` and SQL users
  * get `jaccard_sim(arr, arr)`, `rolling_hash(str)`,
  * `rolling_windows(str, k)`, `dot_product(arr, arr)` and
  * `lsh_bucket(vec, dim, planes[, table])`
  * alongside the built-ins. (On an already-running session use
  * `GraftColumnBridge.registerFunctions(spark)`.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, clazz, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        builder))
    }
}

object GraftExtensions {

  /** Extract a literal Int argument (e.g. `lsh_bucket(v, 64, 6)`). */
  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case lit: org.apache.spark.sql.catalyst.expressions.Literal =>
      lit.value match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"$fn: $arg must be an integer literal, got $other")
      }
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a literal, got ${other.sql}")
  }

  /** (name, expression class, builder) for every native function —
    * shared by the extension injector and the runtime bridge. */
  val builders: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("jaccard_sim", classOf[JaccardSim],
      (children: Seq[Expression]) => JaccardSim(children(0), children(1))),
    ("rolling_hash", classOf[RollingHash],
      (children: Seq[Expression]) => RollingHash(children.head)),
    ("nfc_normalize", classOf[NfcNormalize],
      (children: Seq[Expression]) => NfcNormalize(children.head)),
    ("deflate_size", classOf[DeflateSize],
      (children: Seq[Expression]) => DeflateSize(children.head)),
    ("rolling_windows", classOf[RollingWindows],
      (children: Seq[Expression]) => RollingWindows(
        children(0), litInt(children(1), "rolling_windows", "k"))),
    ("word_ngrams", classOf[WordNGrams],
      (children: Seq[Expression]) => WordNGrams(
        children(0), litInt(children(1), "word_ngrams", "n"))),
    ("char_ngrams", classOf[CharNGrams],
      (children: Seq[Expression]) => CharNGrams(
        children(0), litInt(children(1), "char_ngrams", "n"))),
    ("dot_product", classOf[DotProduct],
      (children: Seq[Expression]) => DotProduct(children(0), children(1))),
    ("lsh_bucket", classOf[LshBucket],
      (children: Seq[Expression]) => LshBucket(
        children(0),
        litInt(children(1), "lsh_bucket", "dim"),
        litInt(children(2), "lsh_bucket", "numPlanes"),
        if (children.length > 3) litInt(children(3), "lsh_bucket", "table")
        else 0)),
    ("image_meta", classOf[ImageMeta],
      (children: Seq[Expression]) => ImageMeta(children.head)),
    ("png_header", classOf[PngHeader],
      (children: Seq[Expression]) => PngHeader(children(0), children(1))),
    ("png_image", classOf[graft.expressions.PngImage],
      (children: Seq[Expression]) =>
        graft.expressions.PngImage(children(0), children(1), children(2))),
    ("jpeg_image", classOf[graft.expressions.JpegImage],
      (children: Seq[Expression]) =>
        graft.expressions.JpegImage(children(0), children(1), children(2))),
    ("gif_image", classOf[graft.expressions.GifImage],
      (children: Seq[Expression]) =>
        graft.expressions.GifImage(children(0), children(1), children(2))),
    ("dhash", classOf[graft.expressions.DHash],
      (children: Seq[Expression]) => graft.expressions.DHash(children.head)),
    ("wav_tone", classOf[graft.expressions.WavTone],
      (children: Seq[Expression]) =>
        graft.expressions.WavTone(children(0), children(1), children(2))),
    ("audio_fp", classOf[graft.expressions.AudioFp],
      (children: Seq[Expression]) => graft.expressions.AudioFp(children.head)),
    ("audio_meta", classOf[AudioMeta],
      (children: Seq[Expression]) => AudioMeta(children.head)),
    ("wav_header", classOf[WavHeader],
      (children: Seq[Expression]) => WavHeader(children(0), children(1))),
    ("video_meta", classOf[VideoMeta],
      (children: Seq[Expression]) => VideoMeta(children.head)),
    ("sq_encode", classOf[SqEncode],
      (children: Seq[Expression]) => SqEncode(children.head)),
    ("sq_dot", classOf[SqDot],
      (children: Seq[Expression]) => SqDot(children(0), children(1))),
    ("mp4_header", classOf[Mp4Header],
      (children: Seq[Expression]) => Mp4Header(
        children(0), children(1), children(2))),
    ("bitmap_from_ids", classOf[BitmapFromIds],
      (children: Seq[Expression]) => BitmapFromIds(children(0), children(1))),
    ("bitmap_jaccard", classOf[BitmapJaccard],
      (children: Seq[Expression]) => BitmapJaccard(children(0), children(1))))
}
