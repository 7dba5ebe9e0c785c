package graft.curate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-source token-distribution drift: smoothed KL divergence of each
  * source's hashed-unigram-bucket distribution from the corpus-wide
  * distribution — the mixture-design diagnostic that ranks sources by
  * how far their language deviates from the blend (DoReMi-style domain
  * reweighting and any data-mixing ablation starts from exactly this
  * table; public technique). A source with near-zero drift is
  * interchangeable filler; a high-drift source is the one whose weight
  * moves downstream eval.
  *
  * Reference scope note: LLM-pipeline extension surface, sibling to
  * [[Importance]] / [[Classifier]] whose hashed-bucket machinery it
  * shares.
  *
  * Numeric contract: per dense (source, bucket) cell the ONLY float is
  * `p_s * ln(p_s / p_c)` with `p_s = (c_sb + 1) / (tot_s + B)` and
  * `p_c = (c_b + 1) / (tot + B)` (add-1 smoothing keeps every term
  * finite), rounded ONCE to integer micro-nats; the per-source KL is
  * then a BIGINT sum over the B-bucket spine — order-independent, so
  * it hash-matches an ANSI-SQL oracle. The declared precision is
  * micro-nat-per-bucket (≤ B/2 micro-nats absolute, ~0.0005 nats at
  * B = 1024) — a rounding contract, not an estimate.
  *
  * Scale shape: ONE corpus pass builds the ≤ S·B (source, bucket)
  * count table (map-side combinable); the corpus marginal, totals,
  * dense spine, and KL rollup all derive from that metadata-sized
  * table — nothing downstream of the first aggregate touches the
  * corpus again, and every join below it is broadcast.
  */
object Drift {

  /** (source, n_tokens, kl_micro) — one row per source present in the
    * corpus, KL(source ‖ corpus) in integer micro-nats over `buckets`
    * hashed unigram buckets. */
  def sourceDrift(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      clsCol: String,
      buckets: Int = Classifier.DefaultBuckets): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = docs.sparkSession
    // the one corpus-scale pass; ≤ S·B rows after partial aggregation,
    // materialized once for its three metadata-side consumers
    val counts = graft.util.Blocks.lazyCheckpoint(
      Classifier.tokenBuckets(docs, idCol, textCol, clsCol, buckets)
        .groupBy(col("cls"), col("b")).agg(count(lit(1)).as("c")))
    driftFromCounts(spark, counts, buckets)
  }

  /** The metadata-side derivation: dense spine, smoothed per-cell KL
    * term rounded once, BIGINT rollup. Deterministic in the counts, so
    * a streaming tier folding the same counts derives the identical
    * table. */
  def driftFromCounts(
      spark: SparkSession,
      counts: DataFrame,
      buckets: Int): DataFrame = {
    val corpus = counts.groupBy(col("b")).agg(sum(col("c")).as("c_all"))
    val tot = counts.groupBy(col("cls")).agg(sum(col("c")).as("tot_s"))
    val n = counts.agg(sum(col("c")).as("tot"))
    val spine = tot
      .crossJoin(broadcast(spark.range(buckets).select(col("id").as("b"))))
    val pS = (coalesce(col("c"), lit(0L)) + 1.0) / (col("tot_s") + buckets)
    val pC = (coalesce(col("c_all"), lit(0L)) + 1.0) / (col("tot") + buckets)
    spine
      .join(counts, Seq("cls", "b"), "left")
      .join(broadcast(corpus), Seq("b"), "left")
      .crossJoin(broadcast(n))
      .select(col("cls"), col("tot_s"),
        round(lit(1e6) * pS * log(pS / pC), 0).cast("long").as("term_micro"))
      .groupBy(col("cls").as("source"))
      .agg(
        first(col("tot_s")).as("n_tokens"),
        sum(col("term_micro")).as("kl_micro"))
  }
}
