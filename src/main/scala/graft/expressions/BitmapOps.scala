package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Packed-bitmap set kernels for the SMALL-VOCABULARY tier of the exact
  * similarity join ([[graft.dedup.Dedup.jaccardJoin]]).
  *
  * When the per-block token universe is small (char 3-grams: a few
  * thousand distinct shingles per language), prefix filtering degrades
  * with corpus growth — every token's document frequency scales with
  * the corpus, so "rare prefix tokens" stop being rare and the
  * candidate volume Σ_t C(df_t, 2) approaches all-pairs (measured at
  * 10× sf0.1: 68 % of all same-block pairs became candidates). In that
  * regime the better EXACT representation is a dictionary-coded bitmap:
  * each document's distinct-shingle set becomes `ceil(vocab/8)` bytes,
  * and Jaccard collapses to popcount(AND)/popcount(OR) — one fused
  * pass over a few hundred longs, no candidate shuffle, no
  * array-carrying verify joins.
  *
  * Value semantics are IDENTICAL to [[JaccardSim]] on distinct-element
  * inputs: `inter / (|A| + |B| − inter)` in double division, so DuckDB
  * oracles verify the tier swap unchanged.
  */
object BitmapOps {

  /** Pack a distinct dictionary-id array into a little-endian bitmap of
    * `ceil(nbits/8)` bytes. NULL on any id outside [0, nbits) — an
    * out-of-range id means the caller's dictionary is broken, and the
    * filter-don't-throw convention reports that as a NULL set rather
    * than silently aliasing into a wrong bit (the [[graft.etl.ZOrder]]
    * domain-guard precedent). */
  def fromIds(ids: ArrayData, nbits: Int): Array[Byte] = {
    val out = new Array[Byte]((nbits + 7) >> 3)
    val n = ids.numElements()
    var i = 0
    while (i < n) {
      val id = ids.getInt(i)
      if (id < 0 || id >= nbits) return null
      out(id >> 3) = (out(id >> 3) | (1 << (id & 7))).toByte
      i += 1
    }
    out
  }

  /** Pack a distinct-token array into a little-endian bitmap against a
    * SORTED per-block vocabulary: each token's bit index is its binary-
    * search position in `vocab` (identical mapping to the dense
    * row_number dictionary the join-encode path assigns — both are the
    * token's rank in UTF8 binary order). This is the broadcast-encode
    * kernel: one pass over the document's own shingle array, no token
    * explode, no (block, token) join shuffle, no collect_list re-group.
    * NULL when a token is absent from `vocab` — that means the caller's
    * vocabulary was not built from this corpus (contract break), and
    * the filter-don't-throw convention reports it as a NULL set rather
    * than silently dropping the token (the [[fromIds]] precedent). */
  def encodeSorted(sh: ArrayData, vocab: ArrayData): Array[Byte] = {
    val nbits = vocab.numElements()
    val out = new Array[Byte]((nbits + 7) >> 3)
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      val t = sh.getUTF8String(i)
      var lo = 0
      var hi = nbits - 1
      var found = -1
      while (lo <= hi && found < 0) {
        val mid = (lo + hi) >>> 1
        val c = vocab.getUTF8String(mid).compareTo(t)
        if (c == 0) found = mid
        else if (c < 0) lo = mid + 1
        else hi = mid - 1
      }
      if (found < 0) return null
      out(found >> 3) = (out(found >> 3) | (1 << (found & 7))).toByte
      i += 1
    }
    out
  }

  /** Exact Jaccard of two packed bitmaps: one pass computing the
    * intersection and both cardinalities with `Long.bitCount` on
    * 8-byte strides. Bitmaps of unequal length are zero-extended (the
    * shorter one simply has no high bits), so per-block bitmaps of
    * different vocab sizes cannot crash — though the join only ever
    * compares same-block rows. Division mirrors [[JaccardSim]]
    * exactly, including 0/0 = NaN for two empty sets (unreachable from
    * the join: empty documents drop out at the token explode). */
  def jaccard(a: Array[Byte], b: Array[Byte]): Double = {
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    var inter = 0
    var cs = 0
    var cl = 0
    var i = 0
    val sw = s.length - 7
    // 8-byte strides over the common span
    while (i < sw) {
      val ws = getLongLE(s, i)
      val wl = getLongLE(l, i)
      inter += java.lang.Long.bitCount(ws & wl)
      cs += java.lang.Long.bitCount(ws)
      cl += java.lang.Long.bitCount(wl)
      i += 8
    }
    // byte tail of the common span
    while (i < s.length) {
      val bs = s(i) & 0xff
      val bl = l(i) & 0xff
      inter += Integer.bitCount(bs & bl)
      cs += Integer.bitCount(bs)
      cl += Integer.bitCount(bl)
      i += 1
    }
    // remainder of the longer bitmap (no intersection contribution)
    val lw = l.length - 7
    while (i < lw) { cl += java.lang.Long.bitCount(getLongLE(l, i)); i += 8 }
    while (i < l.length) { cl += Integer.bitCount(l(i) & 0xff); i += 1 }
    inter.toDouble / (cs + cl - inter).toDouble
  }

  private def getLongLE(a: Array[Byte], i: Int): Long =
    (a(i) & 0xffL) |
      ((a(i + 1) & 0xffL) << 8) |
      ((a(i + 2) & 0xffL) << 16) |
      ((a(i + 3) & 0xffL) << 24) |
      ((a(i + 4) & 0xffL) << 32) |
      ((a(i + 5) & 0xffL) << 40) |
      ((a(i + 6) & 0xffL) << 48) |
      ((a(i + 7) & 0xffL) << 56)

  /** Column forms. */
  def bitmapFromIds(ids: Column, nbits: Column): Column =
    GraftColumnBridge.column(BitmapFromIds(
      GraftColumnBridge.expression(ids), GraftColumnBridge.expression(nbits)))
  def bitmapJaccard(a: Column, b: Column): Column =
    GraftColumnBridge.column(BitmapJaccard(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def bitmapEncodeSorted(sh: Column, vocab: Column): Column =
    GraftColumnBridge.column(BitmapEncodeSorted(
      GraftColumnBridge.expression(sh), GraftColumnBridge.expression(vocab)))
}

/** `bitmap_encode_sorted(array<string>, array<string>)` → binary. */
case class BitmapEncodeSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<string>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "bitmap_encode_sorted"

  override protected def nullSafeEval(sh: Any, vocab: Any): Any =
    BitmapOps.encodeSorted(
      sh.asInstanceOf[ArrayData], vocab.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sh, vocab) => s"""
      ${ev.value} = graft.expressions.BitmapOps.encodeSorted($sh, $vocab);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapEncodeSorted =
    copy(left = newLeft, right = newRight)
}

/** `bitmap_from_ids(array<int>, nbits)` → binary. */
case class BitmapFromIds(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, int), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "bitmap_from_ids"

  override protected def nullSafeEval(ids: Any, nbits: Any): Any =
    BitmapOps.fromIds(ids.asInstanceOf[ArrayData], nbits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ids, nbits) => s"""
      ${ev.value} = graft.expressions.BitmapOps.fromIds($ids, $nbits);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapFromIds =
    copy(left = newLeft, right = newRight)
}

/** `bitmap_jaccard(binary, binary)` → double. */
case class BitmapJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, binary), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "bitmap_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitmapOps.jaccard(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.BitmapOps.jaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapJaccard =
    copy(left = newLeft, right = newRight)
}
