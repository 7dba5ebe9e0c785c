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

  /** One row per document with ≥ 2 canonical tokens (shorter docs carry
    * no bigram evidence and emit nothing): token count, bigram count,
    * total NLL in integer micro-nats, the per-bigram average
    * (`nll_micro_sum DIV n_bigrams`), and
    * `kept = avg NLL < ln(buckets)` — strictly better than the
    * uniform baseline. */
  def perplexityFilter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = DefaultBuckets): DataFrame = {
    require(buckets > 1, s"buckets must be > 1, got $buckets")
    val bucketed = docs
      .select(col(idCol), transform(
        filter(WordGrams.tokens(col(textCol)), t => length(t) > 0),
        t => conv(substring(md5(t), 1, 8), 16, 10).cast("long") % buckets
      ).as("b"))
      .where(size(col("b")) >= 2)

    val pairs = bucketed
      .select(col(idCol), explode(arrays_zip(
        slice(col("b"), lit(1), size(col("b")) - 1).as("b1"),
        slice(col("b"), lit(2), size(col("b")) - 1).as("b2"))).as("p"))
      .select(col(idCol), col("p.b1").as("b1"), col("p.b2").as("b2"))

    // Observed-bigram counts; context counts derived from the SAME
    // table (c(b1) = Σ_b2 c(b1,b2)) so the corpus is scanned once —
    // and the ≤ B²-row table is materialized once, because it feeds
    // both the context rollup and the score projection (otherwise the
    // corpus-scale bigram pass runs once per consumer).
    val bi = graft.util.Blocks.lazyCheckpoint(
      pairs.groupBy(col("b1"), col("b2")).agg(count(lit(1)).as("c_bi")))
    val uni = bi.groupBy(col("b1")).agg(sum(col("c_bi")).as("c_uni"))
    val score = bi.join(uni, "b1").select(col("b1"), col("b2"),
      round(lit(-1e6) * log(
        (col("c_bi") + 1.0) / (col("c_uni") + buckets)), 0)
        .cast("long").as("nll_micro"))

    val uniformMicro = math.round(1e6 * math.log(buckets.toDouble))
    pairs
      .join(broadcast(score), Seq("b1", "b2"))
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
}
