package graft.curate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hashed multinomial Naive-Bayes document classifier — the
  * "fasttext-style linear classifier" stage standard LLM data pipelines
  * use for quality / domain filtering (CCNet, GPT-3's WebText
  * classifier, DoReMi's domain weights all sit on this shape; public
  * technique). Trains per-class token-bucket likelihoods in one
  * map-side-combinable pass, broadcasts the dense class x bucket score
  * table back, and classifies every document; the registered query
  * reports the source-confusion matrix — the corpus diagnostic that
  * says which sources are separable (and therefore which domain labels
  * carry signal for mixture design).
  *
  * Reference scope note: the reference warehouse has no classifier
  * stage; this is LLM-pipeline extension surface, sibling to
  * [[Importance]] (q34) whose hashed-bucket machinery it shares.
  *
  * Numeric contract — the q34/q35 lesson applied: the only floating
  * computation is the per-(class, bucket) smoothed log-likelihood
  * `ln((c + 1) / (tot_cls + B))` and the per-class log-prior
  * `ln(n_cls / n)`, each rounded ONCE to integer micro-nats on the
  * dense S·B-row model table (metadata: 20 sources x 1024 buckets =
  * 20,480 rows). Every per-document score is then a BIGINT dot product
  * of bucket counts with those integers — independent of partitioning
  * and aggregation order — and the argmax tie-breaks to the
  * lexicographically lowest class via struct ordering, so the result
  * hash-matches an ANSI-SQL oracle on any engine.
  *
  * Scale shape: one corpus pass builds the (class, bucket) count table
  * (map-side combinable, ≤ S·B rows post-combine); the dense model is
  * derived from it driver-free. Classification aggregates each doc's
  * bucket histogram FIRST (one doc-keyed shuffle, rows ≤
  * min(tokens, B) per doc), probes a B-row broadcast table of
  * per-bucket score VECTORS (S-length arrays), and scores all classes
  * as S parallel sum columns in ONE doc-keyed aggregate — no class-way
  * row fan-out anywhere, so the post-probe shuffle carries |docs| · S
  * longs, not |docs| · buckets · S rows (measured 8.8× median on the
  * 100× corpus, where the fan-out shape GC-thrashed). The only driver
  * materialization is the S-row class/prior list — metadata-bounded
  * like the Misra–Gries candidate set.
  */
object Classifier {

  val DefaultBuckets = 1024

  /** Docs that carry evidence: at least one canonical token. Docs
    * without one emit nothing from training OR classification (they
    * have no features either way — the q34 contract). */
  private def hasToken(textCol: Column): Column =
    exists(graft.text.WordGrams.tokens(textCol), t => length(t) > 0)

  /** (id, cls, b) token-bucket rows — the corpus-scale stream both
    * training and classification key off. */
  private[graft] def tokenBuckets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      clsCol: String,
      buckets: Int): DataFrame =
    docs
      .select(col(idCol), col(clsCol).cast("string").as("cls"),
        explode(graft.text.WordGrams.tokens(col(textCol))).as("tok"))
      .where(length(col("tok")) > 0)
      .select(col(idCol), col("cls"),
        Importance.tokenBucket(col("tok"), buckets).as("b"))

  /** The ≤ S·B-row (cls, b, c) count table plus the S-row (cls,
    * n_docs) prior table, from one corpus pass each — the mergeable
    * units an incremental tier would fold (plain sums). */
  def classCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      clsCol: String,
      buckets: Int = DefaultBuckets): (DataFrame, DataFrame) = {
    val counts = tokenBuckets(docs, idCol, textCol, clsCol, buckets)
      .groupBy(col("cls"), col("b")).agg(count(lit(1)).as("c"))
    val docCounts = docs
      .where(hasToken(col(textCol)))
      .groupBy(col(clsCol).cast("string").as("cls"))
      .agg(count(lit(1)).as("n_docs"))
    (counts, docCounts)
  }

  /** Dense S·B-row integer micro-nat model from the count tables:
    * every (class, bucket) cell gets `lp_micro = round(1e6 *
    * ln((c + 1) / (tot_cls + B)))` (add-1 smoothing — unseen cells
    * included, which is why the table must be dense), and every class
    * gets `prior_micro = round(1e6 * ln(n_cls / n))`. Deterministic in
    * the counts; metadata-sized, so the crossJoin spine is broadcast
    * work, never a corpus shuffle. */
  def modelFromCounts(
      spark: SparkSession,
      counts: DataFrame,
      docCounts: DataFrame,
      buckets: Int = DefaultBuckets): DataFrame = {
    val spine = docCounts.select(col("cls"))
      .crossJoin(broadcast(spark.range(buckets).select(col("id").as("b"))))
    val tot = counts.groupBy(col("cls")).agg(sum(col("c")).as("tot"))
    val n = docCounts.agg(sum(col("n_docs")).as("n"))
    spine
      .join(counts, Seq("cls", "b"), "left")
      .join(broadcast(tot), Seq("cls"), "left")
      .join(broadcast(docCounts), Seq("cls"))
      .crossJoin(broadcast(n))
      .select(col("cls"), col("b"),
        round(lit(1e6) * log((coalesce(col("c"), lit(0L)) + 1.0)
          / (coalesce(col("tot"), lit(0L)) + buckets)), 0)
          .cast("long").as("lp_micro"),
        round(lit(1e6) * log(col("n_docs") / col("n").cast("double")), 0)
          .cast("long").as("prior_micro"))
  }

  /** Classify a doc frame against a dense model table. One row per
    * evidence-bearing doc: (id, actual cls, predicted cls, score_micro
    * of the winner, n_tokens).
    *
    * Scale shape — NO class-way row fan-out: the dense model pivots to
    * a B-row broadcast table of per-bucket score VECTORS (an S-length
    * BIGINT array per bucket, classes in sorted order), the per-doc
    * bucket histogram (aggregated FIRST, so rows ≤ min(tokens, B) per
    * doc) probes it once, and the per-doc aggregate is one codegen'd
    * `sum(lps[i] * n)` column per class — partial-aggregated on doc
    * alone, so the shuffle carries |docs| · S longs instead of
    * |docs| · buckets · S rows. The class list and priors are S-row
    * metadata (bounded like the MG candidate set), folded in as plan
    * literals. Argmax = array_min over (-score, cls) structs — largest
    * score, ties to the lexicographically lowest class name. */
  def classify(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      clsCol: String,
      model: DataFrame,
      buckets: Int = DefaultBuckets): DataFrame =
    scoredCandidates(docs, idCol, textCol, clsCol, model, buckets)
      .select(col(idCol), col("actual"),
        array_min(col("cands")).as("best"), col("n_tokens"))
      .select(col(idCol), col("actual"),
        col("best.cls").as("predicted"),
        (-col("best.ns")).as("score_micro"),
        col("n_tokens"))

  /** Per-doc candidate frame shared by [[classify]] and
    * [[calibration]]: (id, actual, n_tokens, cands) with `cands` the
    * S-length array of (ns = −score, cls) structs — array_min/array_
    * sort over it IS the argmax with ties to the lowest class name. */
  private def scoredCandidates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      clsCol: String,
      model: DataFrame,
      buckets: Int): DataFrame = {
    // S-row metadata: sorted class names + integer micro-nat priors
    val priorRows = model.select(col("cls"), col("prior_micro"))
      .distinct().orderBy(col("cls")).collect()
    val classes = priorRows.map(_.getString(0))
    val priors = priorRows.map(_.getLong(1))
    // B-row broadcast side: per-bucket score vector, classes in sorted
    // order (sort_array on (cls, lp) structs — cls is the leading key)
    val bVectors = model
      .groupBy(col("b"))
      .agg(sort_array(collect_list(struct(col("cls"), col("lp_micro"))))
        .as("cl"))
      .select(col("b"), transform(col("cl"), c => c("lp_micro")).as("lps"))
    val hist = tokenBuckets(docs, idCol, textCol, clsCol, buckets)
      .groupBy(col(idCol), col("cls").as("actual"), col("b"))
      .agg(count(lit(1)).as("n"))
    val scoreAggs = classes.indices.map { i =>
      sum(element_at(col("lps"), i + 1) * col("n")).as(s"s_$i")
    }
    val scored = hist
      .join(broadcast(bVectors), Seq("b"))
      .groupBy(col(idCol), col("actual"))
      .agg(sum(col("n")).as("n_tokens"), scoreAggs: _*)
    val candidates = array(classes.indices.map { i =>
      struct((-(col(s"s_$i") + lit(priors(i)))).as("ns"),
        lit(classes(i)).as("cls"))
    }: _*)
    scored.select(col(idCol), col("actual"), col("n_tokens"),
      candidates.as("cands"))
  }

  /** Classifier CALIBRATION curve: how separable the winner is from
    * the runner-up, and whether that margin predicts accuracy — the
    * audit run before any classifier threshold goes into a filter
    * (a well-calibrated filter's accuracy must rise with margin).
    *
    * Per doc: margin = winner score − runner-up score (integer
    * micro-nats ≥ 0), banded at `bandMicro` with everything past
    * `maxBand` clamped into the top band. Output per band: doc count,
    * correct count (argmax = actual class), integer-ppm accuracy and
    * mean margin — a ≤ (maxBand+1)-row table, all BIGINT arithmetic
    * downstream of the model's round-once cells. */
  def calibration(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      clsCol: String,
      model: DataFrame,
      buckets: Int = DefaultBuckets,
      bandMicro: Long = 200000L,
      maxBand: Int = 9): DataFrame = {
    require(bandMicro > 0, s"bandMicro must be positive, got $bandMicro")
    require(maxBand >= 0, s"maxBand must be >= 0, got $maxBand")
    scoredCandidates(docs, idCol, textCol, clsCol, model, buckets)
      .select(col("actual"), array_sort(col("cands")).as("sorted"))
      .where(size(col("sorted")) >= 2)
      .select(col("actual"),
        element_at(col("sorted"), 1).as("best"),
        element_at(col("sorted"), 2).as("second"))
      .select((col("best.cls") === col("actual")).as("correct"),
        (col("second.ns") - col("best.ns")).as("margin_micro"))
      .withColumn("band",
        least(expr(s"margin_micro div $bandMicro"), lit(maxBand.toLong)))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("correct"), 1L).otherwise(0L)).as("n_correct"),
        sum(col("margin_micro")).as("_sm"))
      .select(col("band"), col("n_docs"), col("n_correct"),
        expr("(1000000 * n_correct) div n_docs").as("accuracy_ppm"),
        expr("_sm div n_docs").as("mean_margin_micro"))
  }

  /** Train-and-classify on one corpus, rolled up to the S²-bounded
    * confusion matrix: (actual, predicted, n_docs) for every observed
    * pair, the source-separability diagnostic. The count/model tables
    * are materialized once (they feed the spine, totals, and the
    * probe — without it the corpus-scale counting pass re-executes per
    * consumer: the q34/q56 lesson). */
  /** Train the dense micro-nat model on one corpus, materialized ONCE
    * (count/model tables feed the spine, totals and the probe —
    * without the checkpoints the corpus-scale counting pass
    * re-executes per consumer: the q34/q56 lesson). */
  def trainModel(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      clsCol: String,
      buckets: Int = DefaultBuckets): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val (counts, docCounts) = classCounts(docs, idCol, textCol, clsCol, buckets)
    val countsM = graft.util.Blocks.lazyCheckpoint(counts)
    val docCountsM = graft.util.Blocks.lazyCheckpoint(docCounts)
    graft.util.Blocks.lazyCheckpoint(
      modelFromCounts(docs.sparkSession, countsM, docCountsM, buckets))
  }

  def confusionMatrix(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      clsCol: String,
      buckets: Int = DefaultBuckets): DataFrame = {
    val model = trainModel(docs, idCol, textCol, clsCol, buckets)
    classify(docs, idCol, textCol, clsCol, model, buckets)
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Distributed full-batch LOGISTIC regression over hashed binary
    * unigram features — the discriminative sibling of the NB model
    * (the shape a trained quality/langid filter actually ships as):
    * B+1 integer micro-nat weights, gradient-descent trained for a
    * fixed round count with a DRIVER-HELD model (the q108-BPE /
    * q36-k-means iterative pattern: per round, one broadcast of B
    * weights out, one B-row integer gradient back — never a
    * corpus-sized driver transfer).
    *
    * Engine-exact iterative training — the part plain MLlib cannot
    * give: double gradient SUMS are aggregation-order-dependent, so
    * the same data can train different models run to run. Here the
    * per-document residual `y − σ(s)` is computed in double and
    * rounded ONCE to integer micro (σ's ≤ 1 ulp libm variance absorbed
    * by the rounding, the one float op per doc per round), and the
    * gradient is then a BIGINT sum of those integers — identical under
    * every partitioning, so round-r weights (and the whole trained
    * model) hash-match a DuckDB re-derivation of the same rounds. The
    * weight update floors (`Math.floorDiv`, = SQL `//` on the negative
    * quotients gradients produce).
    *
    * Scale shape: the presence table (doc, bucket) is the corpus-scale
    * stream, aggregated per doc before anything joins it; per round the
    * score join probes a BROADCAST B-row weight table and the gradient
    * partial-aggregates on bucket id. Binary features bound |s| by
    * B · max|w| (no count blow-up). Docs without tokens are excluded
    * from training (no features, the q34 contract).
    *
    * @return the trained dense weight table: (b, w_micro) with
    *         b = −1 the bias row, `rounds` gradient steps applied,
    *         deterministic and oracle-checkable. */
  def logisticRegression(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: Column,
      buckets: Int = 256,
      rounds: Int = 2,
      lrPpm: Long = 1000000L): DataFrame = {
    require(buckets >= 2 && rounds >= 1 && lrPpm > 0,
      s"bad hyperparameters: buckets=$buckets rounds=$rounds lrPpm=$lrPpm")
    val spark = docs.sparkSession
    import spark.implicits._
    val lab = graft.util.Blocks.lazyCheckpoint(
      docs.where(hasToken(col(textCol)))
        .select(col(idCol).as("id"), labelCol.cast("int").as("y")))
    val feat = graft.util.Blocks.lazyCheckpoint(
      docs.select(col(idCol).as("id"),
          explode(graft.text.WordGrams.tokens(col(textCol))).as("tok"))
        .where(length(col("tok")) > 0)
        .select(col("id"), Importance.tokenBucket(col("tok"), buckets).as("b"))
        .distinct())
    val n = lab.count()
    require(n > 0, "no evidence-bearing documents to train on")
    // bias as pseudo-bucket −1 on every labeled doc: the gradient pass
    // then yields ALL bucket gradients AND the bias gradient from ONE
    // aggregation — the former separate `resid.agg(sum(r))` job
    // re-evaluated the whole residual pipeline (score join + sigmoid
    // pass over the corpus) a second time per round.
    val featPlus = graft.util.Blocks.lazyCheckpoint(
      feat.unionByName(lab.select(col("id"), lit(-1L).as("b"))))
    val w = Array.fill(buckets)(0L)
    var w0 = 0L
    for (_ <- 1 to rounds) {
      val wDf = broadcast(
        w.toSeq.zipWithIndex.map { case (wv, b) => (b.toLong, wv) }
          .toDF("b", "w_micro"))
      val sw = feat.join(wDf, "b")
        .groupBy(col("id")).agg(sum(col("w_micro")).as("sw"))
      val resid = lab.join(sw, Seq("id"), "left")
        .select(col("id"),
          round(lit(1e6) * (col("y") - lit(1.0) / (lit(1.0)
            + exp(-(lit(w0) + coalesce(col("sw"), lit(0L))).cast("double")
              / lit(1e6))))).cast("long").as("r"))
      val g = resid.join(featPlus, "id")
        .groupBy(col("b")).agg(sum(col("r")).as("g"))
        .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
      val g0 = g.getOrElse(-1L, 0L)
      // |g| reaches 1e6·n, so lrPpm·g overflows Long once n exceeds
      // ~1e7 docs at the default lrPpm. The update is B+1 driver-side
      // values per round — do it in BigInt (flooring like floorDiv /
      // SQL //), cost-free and exact at any corpus size.
      for (b <- 0 until buckets)
        w(b) += floorDivBig(BigInt(lrPpm) * BigInt(g.getOrElse(b.toLong, 0L)),
          BigInt(1000000L) * n)
      w0 += floorDivBig(BigInt(lrPpm) * g0, BigInt(1000000L) * n)
    }
    ((-1L, w0) +: w.toSeq.zipWithIndex.map { case (wv, b) => (b.toLong, wv) })
      .toDF("b", "w_micro")
  }

  /** Floored division on BigInt (the `Math.floorDiv` / SQL `//`
    * contract; BigInt `/` truncates toward zero). Result must fit a
    * Long — true by construction for the weight update, whose quotient
    * is bounded by lrPpm. */
  private def floorDivBig(a: BigInt, b: BigInt): Long = {
    val q = a / b
    val r = a % b
    (if (r.signum != 0 && (r.signum != b.signum)) q - 1 else q).toLong
  }

  /** Apply a [[logisticRegression]]-trained weight table to a corpus —
    * the serving path of the quality/langid filter: per document the
    * integer score `s = bias + Σ w[b present]`, the probability
    * `p_ppm = round(1e6·σ(s))` (ONE rounding, the same contract as
    * training), and the keep verdict at p ≥ 0.5 ⇔ s ≥ 0 (decided on
    * the INTEGER score, so the verdict never hinges on a float).
    * Documents without tokens score on the bias alone — a filter must
    * pass verdict on every row it is shown (unlike training, where a
    * featureless doc carries no gradient).
    *
    * Scale shape: the weight table is B+1 rows broadcast; the presence
    * stream aggregates per doc before the verdict projection. */
  def logisticScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      buckets: Int = 256): DataFrame = {
    // The model table is B+1 rows by contract — read the bias row
    // eagerly and FAIL LOUDLY on a malformed model: a silently empty
    // bias frame would otherwise drop every document via the join.
    val biasRows = weights.where(col("b") === -1L)
      .select(col("w_micro")).collect()
    require(biasRows.length == 1,
      s"weight table must contain exactly one bias row (b = -1); found ${biasRows.length}")
    val biasMicro = biasRows(0).getLong(0)
    val feat = docs
      .select(col(idCol),
        explode(graft.text.WordGrams.tokens(col(textCol))).as("tok"))
      .where(length(col("tok")) > 0)
      .select(col(idCol), Importance.tokenBucket(col("tok"), buckets).as("b"))
      .distinct()
    val sw = feat.join(broadcast(weights.where(col("b") >= 0L)), "b")
      .groupBy(col(idCol)).agg(sum(col("w_micro")).as("sw"))
    docs.select(col(idCol))
      .join(sw, Seq(idCol), "left")
      .select(col(idCol),
        (lit(biasMicro) + coalesce(col("sw"), lit(0L))).as("s_micro"))
      .withColumn("p_ppm",
        round(lit(1e6) * (lit(1.0) / (lit(1.0)
          + exp(-col("s_micro").cast("double") / lit(1e6))))).cast("long"))
      .withColumn("keep", col("s_micro") >= 0L)
  }
}
