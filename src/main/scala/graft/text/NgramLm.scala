package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model perplexity filtering (Wenzek et
  * al., "CCNet: Extracting High Quality Monolingual Datasets from Web
  * Crawl Data", 2020 — public technique), re-expressed without an
  * external KenLM artifact: the LM is a hashed-bucket bigram model with
  * add-1 smoothing trained on the corpus itself in the same pass that
  * scores it. Documents whose average bigram negative-log-likelihood
  * beats the uniform-distribution baseline `ln(buckets)` read as
  * "speaks like the corpus"; gibberish, rare-token soup, and
  * wrong-alphabet docs do not.
  *
  * Reference scope note: the reference warehouse has no LM-quality
  * stage; this is LLM-pipeline extension surface per the build brief.
  *
  * Numeric contract (the [[graft.curate.Importance]] lesson): the only
  * floating computation is the per-BUCKET-PAIR smoothed conditional
  * `-ln((c(b1,b2)+1) / (c(b1)+B))`, rounded ONCE to integer micro-nats
  * on the observed-bigram score table (≤ B² rows of metadata). Per-doc
  * numbers are BIGINT sums of those integers — partitioning- and
  * order-independent, so the result hash-matches an ANSI-SQL oracle.
  * The per-token average uses integer division; every NLL is
  * non-negative so truncate-toward-zero and floor agree (the q57/q59
  * division-asymmetry lesson cannot bite).
  *
  * Scale shape: bigrams are formed WITHOUT a window shuffle — the
  * token array is zipped with its own tail (`arrays_zip(slice, slice)`)
  * inside the row, so the corpus-scale pass stays embarrassingly
  * parallel. The count table is one map-side-combinable groupBy over
  * (b1, b2) — at most B² rows survive the partial aggregate per
  * partition, so the shuffle is bounded by buckets², not corpus size.
  * The score table is broadcast back (no corpus shuffle); the only
  * corpus-keyed shuffle is the final per-doc aggregation.
  */
object NgramLm {

  val DefaultBuckets = 256

  /** (id, b1, b2) bigram-bucket rows — formed inside the row
    * (arrays_zip of the bucket array with its own tail), no window
    * shuffle. Docs with < 2 canonical tokens emit nothing. */
  private[graft] def bigramRows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int): DataFrame = {
    val bucketed = docs
      .select(col(idCol), transform(
        filter(WordGrams.tokens(col(textCol)), t => length(t) > 0),
        t => conv(substring(md5(t), 1, 8), 16, 10).cast("long") % buckets
      ).as("b"))
      .where(size(col("b")) >= 2)
    bucketed
      .select(col(idCol), explode(arrays_zip(
        slice(col("b"), lit(1), size(col("b")) - 1).as("b1"),
        slice(col("b"), lit(2), size(col("b")) - 1).as("b2"))).as("p"))
      .select(col(idCol), col("p.b1").as("b1"), col("p.b2").as("b2"))
  }

  /** The ≤ B²-row (b1, b2, c_bi) count table for a doc frame — one
    * map-side-combinable pass; the unit the STREAMING tier folds
    * incrementally (counts are plain sums: commutative, associative,
    * slicing-invariant). */
  def bigramCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = DefaultBuckets): DataFrame =
    bigramRows(docs, idCol, textCol, buckets)
      .groupBy(col("b1"), col("b2")).agg(count(lit(1)).as("c_bi"))

  /** Per-context totals c(b1) = Σ_b2 c(b1,b2) — the ≤ B-row companion
    * the serving path needs to price UNSEEN bigrams. */
  def contextCounts(bi: DataFrame): DataFrame =
    bi.groupBy(col("b1")).agg(sum(col("c_bi")).as("c_uni"))

  /** Integer micro-nat NLL score table derived from a bigram count
    * table — deterministic in the counts. */
  def scoreFromCounts(bi: DataFrame, buckets: Int = DefaultBuckets): DataFrame =
    bi.join(contextCounts(bi), "b1").select(col("b1"), col("b2"),
      round(lit(-1e6) * log(
        (col("c_bi") + 1.0) / (col("c_uni") + buckets)), 0)
        .cast("long").as("nll_micro"))

  /** Score a doc frame against an existing NLL model (both tables
    * broadcast). Bigrams UNSEEN by the model — possible when it
    * trained on a different corpus, the streaming serving path — are
    * priced by the SAME add-1 formula at zero count:
    * `-ln(1/(c_uni+B))` under a known context, `ln B` under an unknown
    * one. They must count against the doc, not silently vanish: a
    * mostly-unknown document is exactly the kind the filter exists to
    * reject. On the self-trained path every bigram is observed, so the
    * fallback never fires and [[perplexityFilter]]'s output is
    * unchanged bit-for-bit. */
  def scoreDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      score: DataFrame,
      contexts: DataFrame,
      buckets: Int = DefaultBuckets): DataFrame = {
    val uniformMicro = math.round(1e6 * math.log(buckets.toDouble))
    bigramRows(docs, idCol, textCol, buckets)
      .join(broadcast(score), Seq("b1", "b2"), "left")
      .join(broadcast(contexts), Seq("b1"), "left")
      .select(col(idCol),
        coalesce(col("nll_micro"),
          round(lit(1e6) * log(coalesce(col("c_uni"), lit(0L)) + buckets), 0)
            .cast("long")).as("nll_micro"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("nll_micro")).as("nll_micro_sum"))
      .select(col(idCol),
        (col("n_bigrams") + 1L).as("n_tokens"),
        col("n_bigrams"),
        col("nll_micro_sum"),
        expr("nll_micro_sum div n_bigrams").as("avg_nll_micro"))
      .withColumn("kept", col("avg_nll_micro") < lit(uniformMicro))
  }

  /** One row per document with ≥ 2 canonical tokens (shorter docs carry
    * no bigram evidence and emit nothing): token count, bigram count,
    * total NLL in integer micro-nats, the per-bigram average
    * (`nll_micro_sum DIV n_bigrams`), and
    * `kept = avg NLL < ln(buckets)` — strictly better than the
    * uniform baseline. The ≤ B²-row count table is materialized once
    * (it feeds both the context rollup and the score projection;
    * without this the corpus-scale bigram pass runs once per
    * consumer). */
  def perplexityFilter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = DefaultBuckets): DataFrame = {
    require(buckets > 1, s"buckets must be > 1, got $buckets")
    val bi = graft.util.Blocks.lazyCheckpoint(
      bigramCounts(docs, idCol, textCol, buckets))
    scoreDocs(docs, idCol, textCol, scoreFromCounts(bi, buckets),
      contextCounts(bi), buckets)
  }
}
