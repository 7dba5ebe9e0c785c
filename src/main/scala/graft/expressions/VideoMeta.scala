package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native video-container metadata parser — completes the
  * image ([[ImageMeta]]) / audio ([[AudioMeta]]) / video triad: an
  * ISO-BMFF (MP4) box-tree walk, no codec library, real distributed
  * byte work. Reads the `ftyp` major brand, the `moov`→`mvhd` movie
  * header (timescale + duration, versions 0 and 1) and counts `trak`
  * children. Returns `struct(brand string, timescale int,
  * duration_ticks bigint, n_tracks int)`; NULL for unrecognized,
  * truncated or malformed box trees (filter-don't-throw). Duration in
  * seconds is `duration_ticks / timescale` downstream — the
  * video-curation budgeting number. */
case class VideoMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.catalogString}")
  }

  override def dataType: DataType = VideoMeta.outType
  override def nullable: Boolean = true
  override def prettyName: String = "video_meta"

  override protected def nullSafeEval(b: Any): Any =
    VideoMeta.parse(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.VideoMeta$$.MODULE$$.parse($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VideoMeta =
    copy(child = newChild)
}

object VideoMeta {

  val outType: StructType = StructType(Seq(
    StructField("brand", StringType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration_ticks", LongType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xffffffffL
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3)

  /** NULL for anything that is not a well-formed `ftyp` + `moov` box
    * tree. Box sizes are trusted only after bounds checks — a lying
    * size field yields NULL, never an exception or an overread. */
  def parse(b: Array[Byte]): InternalRow = {
    val n = b.length
    var i = 0
    var brand: String = null
    var timescale = -1
    var duration = -1L
    var tracks = 0
    var sawMoov = false
    while (i + 8 <= n) {
      val sz = be32(b, i)
      if (sz < 8 || i + sz > n) return null
      if (tag(b, i + 4, "ftyp")) {
        if (sz < 16) return null
        brand = new String(b, i + 8, 4, "US-ASCII")
      } else if (tag(b, i + 4, "moov")) {
        sawMoov = true
        val end = i + sz.toInt
        var j = i + 8
        while (j + 8 <= end) {
          val csz = be32(b, j)
          if (csz < 8 || j + csz > end) return null
          if (tag(b, j + 4, "mvhd")) {
            // every header read must sit inside the mvhd box's OWN
            // declared size (csz <= end is already proven): checking
            // against the moov end would let a short-declared mvhd
            // silently decode its sibling's bytes, and the version
            // byte itself needs a guard (csz = 8 passes the generic
            // loop check but holds no payload at all)
            if (csz < 9) return null
            val ver = u8(b, j + 8)
            if (ver == 0) {
              // reads through j+27 (timescale j+20..23, duration j+24..27)
              if (csz < 28) return null
              timescale = be32(b, j + 20).toInt
              duration = be32(b, j + 24)
            } else if (ver == 1) {
              // reads through j+39 (timescale j+28..31, duration j+32..39)
              if (csz < 40) return null
              timescale = be32(b, j + 28).toInt
              duration = be64(b, j + 32)
            } else return null
          } else if (tag(b, j + 4, "trak")) {
            tracks += 1
          }
          j += csz.toInt
        }
      }
      i += sz.toInt
    }
    if (brand == null || !sawMoov || timescale <= 0 || duration < 0) null
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString(brand), timescale, duration, tracks))
  }

  /** Column form. */
  def videoMeta(c: Column): Column =
    GraftColumnBridge.column(VideoMeta(GraftColumnBridge.expression(c)))
}

/** Minimal ISO-BMFF payload builder pairing with [[VideoMeta]], same
  * role as [[WavHeader]]/[[PngHeader]]: `ftyp` (isom) + `moov`
  * containing a version-0 `mvhd` (unity matrix, given timescale +
  * duration ticks) and `nTracks` placeholder `trak` boxes. The box
  * TREE is spec-shaped (sized, nested, walkable); the trak boxes are
  * empty placeholders — the parser under test only counts them. */
case class Mp4Header(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (IntegerType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (timescale int, durationTicks int, " +
          s"nTracks int), got (${a.catalogString}, ${b.catalogString}, " +
          s"${c.catalogString})")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "mp4_header"

  override protected def nullSafeEval(ts: Any, dur: Any, nt: Any): Any =
    Mp4Header.build(ts.asInstanceOf[Int], dur.asInstanceOf[Int],
      nt.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, d, k) =>
      s"graft.expressions.Mp4Header$$.MODULE$$.build($t, $d, $k)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Mp4Header =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object Mp4Header {

  /** ftyp(16) + moov(8 + mvhd 108 + 8·nTracks). nTracks clamps to
    * [0, 2^20]: 8·nTracks in Int arithmetic would overflow negative for
    * absurd counts and NegativeArraySizeException out of the
    * SQL-registered function — a million placeholder boxes (8 MB) is
    * already far past any sane test payload. */
  def build(timescale: Int, durationTicks: Int, nTracks: Int): Array[Byte] = {
    val k = math.min(math.max(0, nTracks), 1 << 20)
    val moovSz = 8 + 108 + 8 * k
    val out = new Array[Byte](16 + moovSz)
    def w4(i: Int, t: String): Unit =
      (0 until 4).foreach(j => out(i + j) = t(j).toByte)
    def be32(i: Int, v: Int): Unit = {
      out(i) = (v >> 24).toByte; out(i + 1) = (v >> 16).toByte
      out(i + 2) = (v >> 8).toByte; out(i + 3) = v.toByte
    }
    // ftyp: major brand isom, minor version 0, no compatible list
    be32(0, 16); w4(4, "ftyp"); w4(8, "isom"); be32(12, 0)
    // moov
    be32(16, moovSz); w4(20, "moov")
    // mvhd v0
    val m = 24
    be32(m, 108); w4(m + 4, "mvhd")
    be32(m + 8, 0)               // version 0 + flags
    be32(m + 12, 0)              // creation
    be32(m + 16, 0)              // modification
    be32(m + 20, timescale)
    be32(m + 24, durationTicks)
    be32(m + 28, 0x00010000)     // rate 1.0
    out(m + 32) = 0x01           // volume 1.0 (hi byte)
    // 10 reserved bytes already zero
    be32(m + 44, 0x00010000)     // unity matrix
    be32(m + 60, 0x00010000)
    be32(m + 76, 0x40000000)
    // 24 pre_defined bytes already zero
    be32(m + 104, k + 1)         // next_track_id
    // placeholder trak boxes
    var t = m + 108
    for (_ <- 0 until k) { be32(t, 8); w4(t + 4, "trak"); t += 8 }
    out
  }

  /** Column form. */
  def mp4Header(timescale: Column, durationTicks: Column,
      nTracks: Column): Column =
    GraftColumnBridge.column(Mp4Header(
      GraftColumnBridge.expression(timescale),
      GraftColumnBridge.expression(durationTicks),
      GraftColumnBridge.expression(nTracks)))
}
