package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting over hashed token buckets (Xie et
  * al., "Data Selection for Language Models via Importance Resampling",
  * 2023 — public technique): score every document by how much more
  * likely its tokens are under a TARGET distribution than under the RAW
  * corpus distribution, with both distributions estimated over a fixed
  * number of hashed unigram buckets.
  *
  * Reference scope note: the reference warehouse has no data-selection
  * stage; this is part of the LLM-pipeline extension surface the build
  * brief asks for alongside SURVEY §2.
  *
  * Numeric contract — integer-exact where it matters: the only floating
  * computation is the per-BUCKET log-ratio
  * `ln(((c_t+1)(R+B)) / ((c_r+1)(T+B)))` (add-1 smoothing over B
  * buckets), rounded ONCE to integer micro-nats on the bucket table
  * (B rows of metadata). Every per-document number is then a BIGINT sum
  * of those integers — independent of partitioning and aggregation
  * order, so the result hash-matches an ANSI-SQL oracle on any engine.
  * A per-doc float sum of raw logs would not be (float addition is
  * order-dependent and Spark's aggregation order is not deterministic).
  *
  * Scale shape: one map-side-combinable pass builds the B-row bucket
  * table (carrying target and raw counts together — `sum(is_target)`
  * rides the same aggregate as `count(*)`, no second scan); the score
  * table is broadcast back onto the token stream (no shuffle); the only
  * corpus-scale shuffle is the final doc-keyed partial-aggregated
  * groupBy. Selection is `w_micro_sum > 0` — a sign test, so no
  * floor-vs-truncate division asymmetry between engines can bite
  * (the q57/q59 lesson).
  */
object Importance {

  val DefaultBuckets = 1024

  /** Hashed unigram bucket in [0, buckets) for a token column — the
    * first 8 hex chars of md5 as an integer, mod B. Portable: any
    * engine with md5 computes the identical bucket. */
  def tokenBucket(token: Column, buckets: Int): Column =
    conv(substring(md5(token), 1, 8), 16, 10).cast("long") % buckets

  /** Token-bucket rows for a doc frame: one (id, _tgt, b) row per
    * canonical token. The corpus-scale intermediate every stage keys
    * off. */
  private[graft] def tokenBuckets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      buckets: Int): DataFrame =
    docs
      .select(col(idCol), targetPred.as("_tgt"),
        explode(graft.text.WordGrams.tokens(col(textCol))).as("tok"))
      .where(length(col("tok")) > 0)
      .select(col(idCol), col("_tgt"),
        tokenBucket(col("tok"), buckets).as("b"))

  /** The ≤ B-row (b, c_r, c_t) count table for a doc frame — one
    * map-side-combinable pass; the unit the STREAMING tier folds
    * incrementally (counts are plain sums: commutative, associative,
    * slicing-invariant). */
  def bucketCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      buckets: Int = DefaultBuckets): DataFrame =
    tokenBuckets(docs, idCol, textCol, targetPred, buckets)
      .groupBy(col("b")).agg(
        count(lit(1)).as("c_r"),
        sum(when(col("_tgt"), 1L).otherwise(0L)).as("c_t"))

  /** Integer micro-nat score table derived from a (b, c_r, c_t) count
    * table — deterministic in the counts, so any engine (or any
    * micro-batch slicing that produced the same counts) derives the
    * identical model. */
  def scoreFromCounts(counts: DataFrame, buckets: Int = DefaultBuckets): DataFrame =
    counts
      .crossJoin(broadcast(counts.agg(
        sum(col("c_r")).as("r_n"), sum(col("c_t")).as("t_n"))))
      .select(col("b"),
        round(lit(1e6) * log(
          (col("c_t") + 1.0) * (col("r_n") + buckets) /
            ((col("c_r") + 1.0) * (col("t_n") + buckets))), 0)
          .cast("long").as("w_micro"))

  /** Score a doc frame against an existing score table (broadcast —
    * no corpus shuffle beyond the final doc-keyed aggregate). The
    * serving half of the streaming tier: the model may come from a
    * snapshot store rather than this corpus. */
  def scoreDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      score: DataFrame,
      buckets: Int = DefaultBuckets): DataFrame =
    tokenBuckets(docs, idCol, textCol, targetPred, buckets)
      .join(broadcast(score), "b")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("w_micro")).as("w_micro_sum"))
      .withColumn("selected", col("w_micro_sum") > 0L)

  /** Per-document importance weights: one row per document that has at
    * least one canonical token (empty docs emit nothing — they carry no
    * evidence either way), with the token count, the integer micro-nat
    * weight sum, and `selected = w_micro_sum > 0` (the doc is more
    * target-like than raw-like on average).
    *
    * `targetPred` marks the target (seed) membership per document row —
    * in production a quality-classifier verdict or a join flag against
    * a curated seed corpus; any Column over the doc row works.
    */
  def importanceWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      buckets: Int = DefaultBuckets): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // B-row bucket table with raw AND target counts from one pass —
    // materialized once (it feeds both the totals aggregate and the
    // score projection; without this the corpus-scale token pass runs
    // twice, one full scan per consumer). Totals derive from the
    // bucket table itself, the log-ratio is rounded once to
    // micro-nats, and everything downstream is integer arithmetic.
    val counts = graft.util.Blocks.lazyCheckpoint(
      bucketCounts(docs, idCol, textCol, targetPred, buckets))
    scoreDocs(docs, idCol, textCol, targetPred,
      scoreFromCounts(counts, buckets), buckets)
  }
}
