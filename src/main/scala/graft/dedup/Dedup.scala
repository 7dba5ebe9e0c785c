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

  /** MinHash signature (array of numPerm longs) over a shingle array. */
  def minHashSignature(shingles: Column, numPerm: Int): Column = {
    val base = transform(shingles, s => pmod(xxhash64(s), lit(MersennePrime)))
    val mins = permConstants(numPerm).map { case (a, b) =>
      array_min(transform(base, x =>
        pmod(x * lit(a) + lit(b), lit(MersennePrime))))
    }
    array(mins: _*)
  }

  /** LSH banding: split the signature into `bands` bands of `rowsPerBand`
    * and emit one (bandIndex, bandHash) bucket key per band. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64(concat_ws(",",
          (0 until rowsPerBand).map(r => sig.getItem(b * rowsPerBand + r)): _*))
          .as("bucket"))
    }: _*)

  /** MinHash/LSH near-duplicate pairs: candidate pairs share ≥1 LSH band
    * bucket; candidates are verified with exact Jaccard over the shingle
    * arrays and kept when ≥ `threshold`.
    *
    * Plan shape: explode bands → shuffle on (band, bucket) → per-bucket
    * self-join (each bucket is small) → distinct pairs → verify. No stage
    * touches the full cross product.
    */
  def minHashDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numPerm: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    val withSig = df
      .select(
        col(idCol).as("id"),
        wordShingles(col(textCol), shingleK).as("shingles"))
      .where(size(col("shingles")) > 0)
      .withColumn("bands", lshBands(
        minHashSignature(col("shingles"), numPerm), bands, numPerm / bands))
    val buckets = withSig
      .select(col("id"), col("shingles"), explode(col("bands")).as("bk"))
    val pairs = buckets.as("l")
      .join(buckets.as("r"),
        col("l.bk") === col("r.bk") && col("l.id") < col("r.id"))
      .select(
        col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.shingles").as("sh_a"), col("r.shingles").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    pairs
      .withColumn("jaccard_sim", round(jaccard(col("sh_a"), col("sh_b")), 6))
      .where(col("jaccard_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard_sim"))
  }

  // ---------------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------------

  /** 64-bit SimHash over the word-token multiset: sum per bit position of
    * +1/-1 weighted by each token's xxhash64 bit, then take the sign. */
  def simHash(text: Column): Column = {
    val toks = split(TextAnalysis.canonical(text), " ")
    val hashes = transform(toks, t => xxhash64(t))
    val bits = (0 until 64).map { i =>
      val bitSum = aggregate(
        hashes,
        lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash near-dup pairs: block on 16-bit quarters of the signature
    * (a pair within hamming distance ≤ 3 of a 64-bit signature must agree
    * exactly on at least one of the 4 quarters — pigeonhole), verify with
    * popcount of XOR ≤ maxHamming. */
  def simHashDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simHash(col(textCol)).as("sig"))
    val blocked = sigs.select(
      col("id"), col("sig"),
      explode(array((0 until 4).map { q =>
        struct(lit(q).as("q"),
          shiftright(col("sig"), q * 16).bitwiseAND(0xFFFFL).as("chunk"))
      }: _*)).as("bk"))
    val pairs = blocked.as("l")
      .join(blocked.as("r"),
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
