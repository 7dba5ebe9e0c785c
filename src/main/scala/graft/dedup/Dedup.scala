package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Deduplication operators for LLM training-data pipelines.
  *
  * Every operator is expressed as declarative DataFrame transforms so
  * Catalyst plans the shuffles: exact/fingerprint dedup is one hash
  * aggregation; the near-dup family (MinHash, SimHash) maps each document
  * to a small number of bucket keys and only joins within buckets,
  * turning the O(n²) pair space into per-bucket local work — the shuffle
  * key IS the bucket, so this scales horizontally.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical key value; report
    * group size. */
  def exact(df: DataFrame, idCol: String, keyCol: Column): DataFrame =
    df.groupBy(keyCol.as("dup_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("group_size"))

  /** Latest-record-per-natural-key dedup (window row_number). */
  def latestPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderDesc: Seq[String]): DataFrame = {
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderDesc.map(c => col(c).desc): _*)
    df.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
  }

  /** Distinct word-shingle array (k consecutive lowercase tokens). */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = split(TextAnalysis.canonical(text), " ")
    array_distinct(
      filter(
        transform(
          sequence(lit(0), greatest(size(toks) - k, lit(0))),
          i => when(i + k <= size(toks), concat_ws(" ", slice(toks, i + 1, lit(k))))),
        x => x.isNotNull))
  }

  /** Distinct character n-gram array of the canonical text. */
  def charShingles(text: Column, n: Int): Column = {
    val c = TextAnalysis.canonical(text)
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(c) - (n - 1), lit(1))),
        i => c.substr(i, lit(n))))
  }

  /** Exact Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter).cast("double")
  }

  // ---------------------------------------------------------------------
  // MinHash + LSH banding
  // ---------------------------------------------------------------------

  /** Deterministic hash companions for the MinHash permutations:
    * h_i(x) = (a_i * x + b_i) mod p with p = 2^31 − 1 (Mersenne prime),
    * x = xxhash64 of the shingle reduced mod p. Keeping a, b, x < 2^31
    * means a·x + b < 2^62 — no Long overflow, so the universal-hash
    * guarantee actually holds. Constants come from a fixed linear
    * congruential sequence — fully deterministic, no RNG at plan time. */
  private val MersennePrime = (1L << 31) - 1
  private def permConstants(numPerm: Int): Seq[(Long, Long)] = {
    var state = 0x9E3779B97F4A7C15L
    def next(): Long = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 3) | 1L // odd, positive
    }
    (0 until numPerm).map(_ => (next() % MersennePrime, next() % MersennePrime))
  }

  /** MinHash signatures as one row per doc with numPerm scalar columns
    * m0..m{numPerm-1}.
    *
    * Plan shape matters here: computing the signature as nested
    * array-lambda expressions (transform/array_min per permutation)
    * multiplies the shingle pipeline into every permutation's expression
    * tree — higher-order functions are interpreted, not codegen'd, so the
    * whole thing re-evaluates the tokenizer hundreds of times per row.
    * Instead we explode to (id, shingleHash) rows — one xxhash per
    * shingle — and fold the permutations with a single hash aggregation
    * of numPerm codegen'd scalar `min` expressions. Map-side partial
    * aggregation collapses each doc to one row before the shuffle, so
    * shuffle volume is O(docs × numPerm longs) regardless of text size.
    */
  def minHashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int,
      numPerm: Int): DataFrame = {
    val hashed = df
      .select(col(idCol).as("id"),
        explode(wordShingles(col(textCol), shingleK)).as("sh"))
      .select(col("id"), pmod(xxhash64(col("sh")), lit(MersennePrime)).as("x"))
    val minExprs = permConstants(numPerm).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("x") * a + b, lit(MersennePrime))).as(s"m$i")
    }
    hashed.groupBy(col("id")).agg(minExprs.head, minExprs.tail: _*)
  }

  /** LSH banding over scalar signature columns m0..: one (band, bucket)
    * key per band, bucket = xxhash64 of the band's components. */
  private def bandKeys(bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64(concat_ws(",",
          (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}")): _*))
          .as("bucket"))
    }: _*)

  /** Drop degenerate LSH buckets (e.g. the empty/boilerplate doc): a
    * bucket with more than `maxBucketSize` members would make the
    * per-bucket self-join quadratic. The count is a window over the
    * bucket key — same shuffle the join needs anyway. */
  private def capBuckets(buckets: DataFrame, maxBucketSize: Int): DataFrame =
    buckets
      .withColumn("bsz",
        count(lit(1)).over(Window.partitionBy(col("bk"))))
      .where(col("bsz") <= maxBucketSize)
      .drop("bsz")

  /** MinHash/LSH near-duplicate pairs: candidate pairs share ≥1 LSH band
    * bucket; candidates are verified with exact Jaccard over the shingle
    * arrays and kept when ≥ `threshold`.
    *
    * Plan shape: explode shingles → signature agg (shuffle on id) →
    * explode bands → shuffle on (band, bucket) → per-bucket self-join
    * (bounded by `maxBucketSize`) → distinct pairs → verify. No stage
    * touches the full cross product.
    */
  def minHashDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numPerm: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5,
      maxBucketSize: Int = 100000): DataFrame = {
    require(numPerm % bands == 0, "numPerm must divide evenly into bands")
    val sig = minHashSignatures(df, idCol, textCol, shingleK, numPerm)
    val buckets = sig.select(col("id"),
      explode(bandKeys(bands, numPerm / bands)).as("bk"))
    val capped = capBuckets(buckets, maxBucketSize)
    val pairs = capped.as("l")
      .join(capped.as("r"),
        col("l.bk") === col("r.bk") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val sh = df.select(col(idCol).as("id"),
      wordShingles(col(textCol), shingleK).as("shingles"))
    pairs
      .join(sh.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("jaccard_sim", round(jaccard(col("sh_a"), col("sh_b")), 6))
      .where(col("jaccard_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard_sim"))
  }

  // ---------------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------------

  /** 64-bit SimHash per doc: sum per bit position of +1/-1 weighted by
    * each token's xxhash64 bit, then take the sign.
    *
    * Same plan-shape reasoning as [[minHashSignatures]]: explode to
    * (id, tokenHash) rows — one xxhash per token — then one hash
    * aggregation with 64 codegen'd scalar `sum` expressions; the final
    * sign-bit packing is 64 cheap scalar conditionals on the aggregated
    * row. Map-side combine keeps shuffle volume at O(docs × 64 longs). */
  def simHashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val hashed = df
      .select(col(idCol).as("id"),
        explode(split(TextAnalysis.canonical(col(textCol)), " ")).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1L).otherwise(-1L))
        .as(s"s$i")
    }
    val sums = hashed.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64)
      .map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    sums.select(col("id"), sig.as("sig"))
  }

  /** SimHash near-dup pairs: block on 16-bit quarters of the signature
    * (a pair within hamming distance ≤ 3 of a 64-bit signature must agree
    * exactly on at least one of the 4 quarters — pigeonhole), verify with
    * popcount of XOR ≤ maxHamming. Degenerate quarter-buckets are capped
    * like the MinHash buckets. */
  def simHashDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 100000): DataFrame = {
    val sigs = simHashSignatures(df, idCol, textCol)
    val blocked = sigs.select(
      col("id"), col("sig"),
      explode(array((0 until 4).map { q =>
        struct(lit(q).as("q"),
          shiftright(col("sig"), q * 16).bitwiseAND(0xFFFFL).as("chunk"))
      }: _*)).as("bk"))
    val capped = capBuckets(blocked, maxBucketSize)
    val pairs = capped.as("l")
      .join(capped.as("r"),
        col("l.bk") === col("r.bk") && col("l.id") < col("r.id"))
      .select(
        col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.sig").as("sig_a"), col("r.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
    pairs
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
