package graft.retrieval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (RRF, Cormack & Clarke SIGIR'09) — merge the
  * per-query rank lists of independent retrievers (e.g. BM25 lexical +
  * dense ANN) without score calibration: each list contributes
  * `1 / (c + rank)` per candidate; candidates missing from a list
  * contribute nothing.
  *
  * Engine-exact: the contribution is `1000000 div (c + rank)` — pure
  * BIGINT (the rational 1/(c+r) scaled to micro-units and floored), so
  * the fused score is an order-independent integer sum and the final
  * ranking is deterministic across engines (ties → candidate id asc).
  *
  * Scale shape: inputs are already top-k lists — (queries × k) rows per
  * ranker, slim by construction. The union + groupBy shuffles only
  * those slim lists on (query_id, cand_id); the final rank window
  * partitions by `query_id` (per-query cardinality, never a funnel).
  */
object Fusion {

  /** Fuse rank lists. Each input must have columns
    * (query_id, cand_id, rnk); `c` is the RRF damping constant
    * (canonically 60), `k` the fused depth.
    *
    * Output: (query_id, rnk, cand_id, rrf_micro, n_rankers) — fused
    * rank 1..k per query; `n_rankers` = how many input lists proposed
    * the candidate (2-ranker agreement is itself a useful signal). */
  def rrf(rankings: Seq[DataFrame], c: Int = 60, k: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    require(c >= 0, s"c must be >= 0, got $c")
    require(k >= 1, s"k must be >= 1, got $k")
    val cols = Seq("query_id", "cand_id", "rnk").map(col)
    val u = rankings.map(_.select(cols: _*)).reduce(_ unionByName _)
    val fused = u
      .withColumn("contrib", expr(s"1000000 div ($c + rnk)"))
      .groupBy(col("query_id"), col("cand_id"))
      .agg(sum(col("contrib")).as("rrf_micro"),
        count(lit(1)).as("n_rankers"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_micro").desc, col("cand_id").asc)
    fused.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("cand_id"),
        col("rrf_micro"), col("n_rankers"))
  }
}
