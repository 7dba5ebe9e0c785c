package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** EXACT distributed heavy hitters over a token stream — every token
  * whose corpus frequency is at least `total/k`, with its exact count,
  * WITHOUT ever shuffling the full vocabulary.
  *
  * The plain formulation (`q71`-style groupBy token) shuffles one
  * record per distinct token; at 100 TB the long tail of a web-scale
  * vocabulary (URLs, hashes, typos — billions of near-singletons)
  * dominates that shuffle even though none of it can possibly be a
  * heavy hitter. This operator removes the tail from the wire with the
  * parallel Misra–Gries argument:
  *
  *  1. '''Candidate pass''' — each partition runs a Misra–Gries summary
  *     with `k−1` counters over its local token stream and emits only
  *     its surviving candidate tokens plus its local token count. The
  *     union is a PROVABLE superset of the true heavy hitters: if a
  *     token's global count is ≥ total/k while EVERY partition dropped
  *     it (local count < local_n/k), summing those strict bounds gives
  *     global count < total/k — contradiction, so some partition kept
  *     it. The driver collects ≤ (k−1)·numPartitions candidate strings
  *     — bounded metadata, independent of corpus size.
  *  2. '''Exact pass''' — the token stream joins (broadcast) against the
  *     candidate set and only the survivors aggregate; everything else
  *     dies at the scan projection. The final `count·k ≥ total` filter
  *     makes the result EXACT — Misra–Gries approximation error never
  *     reaches the output, and the result is independent of the
  *     partitioning that shaped the candidates.
  *
  * `mapPartitions` is deliberate here (the documented last-resort tier):
  * a decrement-all counter summary is genuinely per-partition imperative
  * state that no built-in aggregate expresses without shuffling the full
  * token universe first — which is the very cost this operator exists to
  * avoid. Per-partition memory is bounded by `k` counters.
  */
object HeavyHitters {

  /** Tokens with exact corpus frequency ≥ total/k over
    * [[WordGrams.tokens]] tokenization.
    *
    * @return (`token`, `n_occurrences`, `share_bp`) — share in integer
    *         basis points (`10000·cnt div total`, exact), ordered by
    *         descending count then token
    */
  def heavyTokens(
      docs: DataFrame,
      textCol: String,
      k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(k >= 2, s"heavyTokens: k must be >= 2, got $k")

    val tokenStream: Dataset[String] = docs
      .select(explode(WordGrams.tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .as[String]

    // Candidate pass ([[Mg.summarize]] per partition): (candidate, -1)
    // rows plus one (null, localCount) sentinel per partition.
    val summaries = tokenStream.mapPartitions { iter =>
      val s = Mg.summarize(iter, k - 1)
      s.counts.keysIterator.map(t => (t, -1L)) ++ Iterator((null: String, s.n))
    }.collect()

    val total = summaries.collect { case (null, n) => n }.sum
    val candidates = summaries.collect { case (t, -1L) if t != null => t }
      .distinct.toSeq.toDF("token")

    tokenStream.toDF("token")
      .join(broadcast(candidates), "token")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"))
      .where(col("n_occurrences") * k >= total)
      .withColumn("share_bp",
        expr(s"(10000 * n_occurrences) div ${total}L"))
      .orderBy(desc("n_occurrences"), col("token"))
  }
}
