package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Information-theoretic repetitiveness filter: per-document Shannon
  * entropy of the document's OWN token distribution, in integer
  * micro-nats. A doc that repeats one phrase scores near 0; a doc whose
  * tokens are all distinct scores `ln(n_tokens)` — the ceiling. Low
  * token entropy is the classic SEO-spam / template-page signal
  * (complements [[TextAnalysis]] ratio heuristics, q47's n-gram
  * repetition shares and [[GopherRules]]' absolute thresholds with a
  * distribution-shape measure), and `ttr_ppm` (type/token ratio) rides
  * along as the standard lexical-diversity companion.
  *
  * Determinism contract (hash-exact oracle): entropy is computed as
  * `H = ln n − (1/n)·Σ c·ln c` entirely in integers — `ln c` and
  * `ln n` are each rounded ONCE to micro-nats straight off the small
  * integer count (libm's ≤ 1 ulp `ln` divergence is absorbed by the
  * rounding, the q34/q35 micro-nat convention), the weighted sum is a
  * BIGINT (order-independent), and the `div` divides two non-negatives
  * (truncate == floor on every engine). `kept = entropy_micro >=
  * keepFloorMicroNats`.
  *
  * Scale shape: one corpus-scale shuffle — the (doc, token) count,
  * map-side combinable — then a per-doc rollup of ids-only rows that
  * can reuse the same hash partitioning's doc-id prefix. No vocabulary
  * table, no join, nothing driver-side; the plan is two aggregates and
  * a projection at any corpus size. Documents with no tokens emit
  * nothing (blank text carries no distribution to score).
  */
object TokenEntropy {

  def entropyProfile(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      keepFloorMicroNats: Long): DataFrame = {
    require(keepFloorMicroNats >= 0,
      s"keepFloorMicroNats must be >= 0, got $keepFloorMicroNats")
    val counts = docs
      .select(col(idCol), explode(WordGrams.tokens(col(textCol))).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("c"))
    counts
      // round BEFORE summing — the float never enters an aggregate, so
      // the per-doc sum is an exact BIGINT on any engine
      .select(col(idCol), col("c"),
        round(lit(1e6) * log(col("c")), 0).cast("long").as("_lnc"))
      .groupBy(col(idCol))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("c") * col("_lnc")).as("_s"))
      .select(col(idCol), col("n_tokens"), col("n_types"),
        (round(lit(1e6) * log(col("n_tokens")), 0).cast("long") -
          expr("_s div n_tokens")).as("entropy_micro"),
        expr("(1000000 * n_types) div n_tokens").as("ttr_ppm"))
      .withColumn("kept", col("entropy_micro") >= keepFloorMicroNats)
  }
}
