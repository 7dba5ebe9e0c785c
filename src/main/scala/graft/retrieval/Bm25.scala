package graft.retrieval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a document corpus — the sparse/lexical
  * tier of a retrieval stack (the dense tier is [[graft.sim.Ann]]).
  * Okapi BM25 with the Lucene-style non-negative idf,
  * `idf = ln(1 + (N - df + 0.5)/(df + 0.5))`, k1 = 1.2, b = 0.75.
  *
  * Engine-exact arithmetic: every floating-point quantity is rounded
  * ONCE on a metadata-sized table and all per-document work is BIGINT —
  * the q34/q35 micro-nat discipline:
  *
  *   - `idf_micro`  = round(1e6 · idf) on the VOCABULARY-sized df table
  *   - `ac`         = (100 · total_tokens) div N  (avg doc length in
  *                    centi-tokens, one row), clamped at 4e6
  *   - `tfnorm_micro` = (1e6 · 22·tf·ac) div (10·tf·ac + 3·ac + 900·dl)
  *     with tf clamped at 1e5 — both clamps sit deep in BM25's
  *     saturation region and exist so the BIGINT intermediates can
  *     never wrap on pathological inputs (multi-million-token
  *     repeated-word docs); both engines apply the identical clamp
  *     — exactly 1e6 · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) with
  *     k1 = 12/10, b = 3/4 cleared to integers (all terms positive, so
  *     Spark's truncating `div` and DuckDB's flooring `//` agree)
  *   - per-(query, doc) score = Σ (idf_micro · tfnorm_micro) div 1e6,
  *     an order-independent BIGINT sum
  *
  * Scale shape (100 TB corpus, 1000 executors):
  *   - tf and df are map-side-combinable aggregates over the exploded
  *     token table; dl is a NARROW per-row projection (no shuffle).
  *   - The query-term table is (probes × terms) rows — broadcast. The
  *     candidate set is the posting lists of those terms only (an
  *     inverted-index probe, never a corpus scan): tf joins the
  *     broadcast term table, so no corpus-side shuffle materializes
  *     candidates.
  *   - Candidate scoring joins the candidate set back to the per-doc
  *     length table with NO forced broadcast: rare-term posting lists
  *     usually measure broadcast-small (AQE then streams the
  *     corpus-sized dl side), but "rarest per probe" does not bound
  *     df, so a forced hint could pin a corpus-scale build side in
  *     memory — AQE downgrades that case to a shuffle join instead.
  *   - Top-k ranking windows partition by `query_id` — per-query
  *     cardinality, never a dim-cardinality funnel.
  *
  * Reference behavior: the reference's BI layer has no text retrieval;
  * this is part of the mandated LLM-pipeline surface (SURVEY.md §2).
  */
object Bm25 {

  /** Canonical (doc, token, tf) term-frequency table. */
  private[graft] def termFreq(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(graft.text.WordGrams.tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** Per-doc token count — narrow, no shuffle (`size(filter(...))`
    * over the split array, not an explode + groupBy round trip). */
  private[graft] def docLen(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      size(filter(graft.text.WordGrams.tokens(col(textCol)),
        t => length(t) > 0)).cast("long").as("dl"))

  /** "More like this": for each probe document (rows matching
    * `probeFilter`), take its `nTerms` RAREST distinct tokens (df asc,
    * token asc — rare terms carry the signal and keep posting lists
    * short) and retrieve the top-`k` other documents by BM25.
    *
    * Output: (query_id, rnk, doc_id, bm25_micro), rnk 1..k per query,
    * ties broken by doc_id asc. Probe docs never retrieve themselves.
    */
  def moreLikeThis(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      probeFilter: Column => Column,
      nTerms: Int,
      k: Int): DataFrame = {
    require(nTerms >= 1, s"nTerms must be >= 1, got $nTerms")
    require(k >= 1, s"k must be >= 1, got $k")

    val tf = termFreq(docs, idCol, textCol)
    val dl = docLen(docs, idCol, textCol)

    // vocabulary-sized: df + the ONE rounding of idf to integer micro-nats
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    // ac saturates at 4e6 (avgdl 40k tokens) so the tfnorm numerator
    // 22e6·tf·ac stays inside BIGINT with the tf clamp below — BM25's
    // length normalization is insensitive this deep into the tail.
    val stats = broadcast(dl.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_tokens"))
      .select(col("n_docs"),
        expr("least((100 * total_tokens) div n_docs, 4000000)").as("ac")))
    val idf = dfreq.crossJoin(stats)
      .select(col("token"), col("df"), col("ac"),
        round(lit(1e6) * log(lit(1.0)
          + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
          .cast("long").as("idf_micro"))

    // probe query terms: the nTerms rarest distinct tokens per probe doc
    // — probes × nTerms rows, broadcast everywhere below
    val wTerm = Window.partitionBy(col("query_id"))
      .orderBy(col("df").asc, col("token").asc)
    val qterms = broadcast(
      tf.where(probeFilter(col("doc_id")))
        .select(col("doc_id").as("query_id"), col("token"))
        .join(idf, "token")
        .withColumn("_tr", row_number().over(wTerm))
        .where(col("_tr") <= nTerms)
        .select(col("query_id"), col("token"), col("idf_micro"), col("ac")))

    // inverted-index probe: posting lists of the query terms only
    val cands = tf.join(qterms, "token")
      .where(col("doc_id") =!= col("query_id"))

    // candidate scoring: the candidate set is posting lists of the
    // probes' rarest terms — usually slim, but "rarest per probe" does
    // not BOUND df (a probe of only high-df tokens yields corpus-scale
    // lists), so no broadcast hint here: AQE broadcasts when the built
    // side measures small and falls back to a shuffle join when not.
    // tf clamps at 1e5 (tfnorm is saturated ~22e5 long before that) so
    // 22e6·tf·ac ≤ 8.8e18 never wraps BIGINT on pathological docs.
    val scored = dl.join(cands, "doc_id")
      .withColumn("tfnorm_micro",
        expr("(1000000 * 22 * least(tf, 100000) * ac) " +
          "div (10 * least(tf, 100000) * ac + 3 * ac + 900 * dl)"))
      .withColumn("w_micro", expr("(idf_micro * tfnorm_micro) div 1000000"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w_micro")).as("bm25_micro"))

    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25_micro").desc, col("doc_id").asc)
    scored.withColumn("rnk", row_number().over(wRank))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("doc_id"), col("bm25_micro"))
  }

  /** DPR-style hard-negative mining from the BM25 ranking: per probe,
    * the top-1 retrieval plays the positive and ranks
    * [`negFrom`, `negTo`] play the hard negatives — lexically close
    * enough to fool a weak model, ranked far enough to be (near-)
    * certainly non-duplicates. The lexical counterpart of the
    * embedding-space [[graft.sim.Ann.contrastiveTriples]]; BM25's
    * integer micro-nat scores make THIS one fully deterministic, so it
    * is hash-gateable end to end.
    *
    * The ranking is materialized ONCE (lazy checkpoint) and read by
    * both the positive and negative selections — the
    * single-materialization lesson; everything here is probe-sized
    * (|probes| · negTo rows) after the moreLikeThis scoring. */
  def hardNegatives(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      probeFilter: Column => Column,
      nTerms: Int,
      negFrom: Int,
      negTo: Int): DataFrame = {
    require(negFrom >= 2, s"negFrom must be >= 2 (rank 1 is the positive), got $negFrom")
    require(negTo >= negFrom, s"need negFrom <= negTo, got [$negFrom, $negTo]")
    val ranked = graft.util.Blocks.lazyCheckpoint(
      moreLikeThis(docs, idCol, textCol, probeFilter, nTerms, k = negTo))
    val pos = ranked.where(col("rnk") === 1)
      .select(col("query_id"), col("doc_id").as("pos_id"),
        col("bm25_micro").as("pos_bm25_micro"))
    val neg = ranked.where(col("rnk").between(negFrom, negTo))
      .select(col("query_id"), col("rnk").as("neg_rank"),
        col("doc_id").as("neg_id"), col("bm25_micro").as("neg_bm25_micro"))
    pos.join(neg, Seq("query_id"))
  }
}
