package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Word n-gram operators over a document corpus: benchmark
  * decontamination (flag training docs sharing any n-gram with an eval
  * set — the overlap check every LLM training pipeline runs before
  * release) and corpus-frequency gram mining (boilerplate n-grams that
  * recur across many documents).
  *
  * Tokenization is the shared canonical form: lowercase, non-alnum runs
  * collapsed to single spaces, whitespace-split — cheap, deterministic
  * and expressible in ANSI SQL so both operators stay oracle-checkable.
  *
  * Plan shape: grams are built SHUFFLE-FREE by the native
  * [[graft.expressions.WordNGrams]] kernel — one codegen'd byte pass
  * per document emitting the gram array in place, then a plain explode.
  * (The original posexplode + per-document window `lead` pipeline paid
  * a full-corpus token-level exchange before a single gram existed —
  * the dominant shuffle at 100 TB; the higher-order
  * `transform(sequence(...), slice)` alternative is interpreted per
  * element, the q44 mistake. The native expression is the
  * preference-order fix: shuffle-free AND inside whole-stage codegen;
  * WordNGramsParitySpec proves gram-for-gram equality with the window
  * pipeline.) All downstream joins/aggregates key on the gram string,
  * so corpus size scales horizontally and no token list ever needs to
  * fit anywhere but its own document's task.
  */
object WordGrams {

  /** Canonical token array of `text` (may contain one empty token for
    * blank text — gram builders drop it). */
  def tokens(text: Column): Column =
    split(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")), " ")

  /** One row per complete word n-gram: (`idCol`, `gram`) with the gram
    * as a space-joined string, in document order with multiplicity.
    * Documents with fewer than `n` tokens emit nothing. */
  def grams(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    docs.select(col(idCol),
      explode(graft.expressions.WordNGrams.wordNGrams(col(textCol), n))
        .as("gram"))
  }

  /** Per-training-doc contamination report against `eval`: how many
    * DISTINCT n-grams the doc shares with ANY eval document, plus the
    * boolean verdict. Every training doc appears (n_shared = 0 when
    * clean).
    *
    * Both gram sets are distinct-reduced (map-side combinable) before
    * the equi-join on the gram string; the eval side of a real
    * decontamination run is benchmark-sized — orders smaller than the
    * corpus — so AQE broadcast-plans it. */
  def decontaminate(
      train: DataFrame,
      eval_ : DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val trainGrams = grams(train, idCol, textCol, n).distinct()
    val evalGrams = grams(eval_, idCol, textCol, n)
      .select(col("gram")).distinct()
    val hits = trainGrams.join(evalGrams, "gram")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_shared"))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
  }

  /** Cross-source contamination matrix: for every unordered source
    * pair, how many DISTINCT word n-grams the two sources share, with
    * integer-ppm containment both ways (`|A∩B|/|A|`, `/|B|`) and
    * Jaccard — the "how much does source A duplicate source B" audit
    * run before mixing corpora. Pairs sharing nothing still appear
    * (a complete matrix is the point of the audit).
    *
    * All ratios are ppm via integer division of positives (truncate ==
    * floor on every engine). Scale: per-source gram sets distinct-reduce
    * map-side; the only corpus-scale shuffles key on the gram string
    * (set build + pair meet); a gram present in s sources meets s²
    * times — bounded by the SOURCE count squared, not the corpus. The
    * pair skeleton and size lookups are source-cardinality metadata
    * (broadcast). */
  def sourceOverlap(
      docs: DataFrame,
      idCol: String,
      srcCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val sg = grams(docs, idCol, textCol, n)
      .join(docs.select(col(idCol), col(srcCol).as("_src")), Seq(idCol))
      .select(col("_src"), col("gram")).distinct()
    val sizes = sg.groupBy(col("_src")).agg(count(lit(1)).as("n"))
    val common = sg.select(col("_src").as("src_a"), col("gram"))
      .join(sg.select(col("_src").as("src_b"), col("gram")), Seq("gram"))
      .where(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("c"))
    val skeleton = broadcast(sizes.select(col("_src").as("src_a"), col("n").as("grams_a")))
      .crossJoin(broadcast(sizes.select(col("_src").as("src_b"), col("n").as("grams_b"))))
      .where(col("src_a") < col("src_b"))
    skeleton
      .join(broadcast(common), Seq("src_a", "src_b"), "left") // ≤ sources² rows
      .select(col("src_a"), col("src_b"), col("grams_a"), col("grams_b"),
        coalesce(col("c"), lit(0L)).as("n_common"))
      .withColumn("cont_a_ppm", expr("(1000000 * n_common) div grams_a"))
      .withColumn("cont_b_ppm", expr("(1000000 * n_common) div grams_b"))
      .withColumn("jaccard_ppm",
        expr("(1000000 * n_common) div (grams_a + grams_b - n_common)"))
  }

  /** Vocabulary induction: corpus-wide token occurrence counts with a
    * minimum-frequency floor — the first step of any tokenizer/vocab
    * build. One explode + one aggregation keyed on the token
    * (map-side combinable); `n_docs` is an exact single-distinct count
    * folded into the same cascade. */
  def vocabulary(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long): DataFrame =
    docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col(idCol)).as("n_docs"))
      .where(col("n_occurrences") >= minCount)

  /** PMI collocation mining: adjacent word pairs whose pointwise
    * mutual information `ln(p(w1,w2) / (p(w1)·p(w2)))` marks them as a
    * unit ("new york", "machine learning") — the classic phrase /
    * multi-word-expression signal a tokenizer-vocab or phrase-table
    * build consumes (Church & Hanks 1990).
    *
    * Determinism contract (the hash-exact oracle): PMI is computed in
    * DOUBLE with every count cast to double FIRST (the six-way integer
    * product would overflow BIGINT at real corpus scale) and the same
    * left-to-right operation order the oracle SQL spells, then rounded
    * ONCE to integer micro-nats — the q113-idf convention; IEEE
    * mult/div are exact-rounded on every engine and the ≤ 1 ulp libm
    * `ln` divergence is absorbed by the rounding.
    *
    * Scale shape: unigram and bigram counts are map-side-combinable
    * aggregates keyed on token text; after them everything is
    * VOCAB-bounded — the two scalar totals broadcast via crossJoin,
    * and the n1/n2 lookups join the (already `minPairCount`-floored)
    * pair table against the unigram table, never the corpus. The only
    * corpus-scale shuffles are the doc-keyed window that forms
    * adjacent pairs and the two count aggregates. */
  def collocations(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minPairCount: Long): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    // both tables come straight off the native gram kernel — no
    // token-level window shuffle; tokens never contain spaces, so the
    // bigram splits exactly at its single joining space
    val toks = docs.select(
      explode(graft.expressions.WordNGrams.wordNGrams(col(textCol), 1))
        .as("tok"))
    val pairs = docs
      .select(explode(
        graft.expressions.WordNGrams.wordNGrams(col(textCol), 2)).as("g"))
      .select(substring_index(col("g"), " ", 1).as("w1"),
        substring_index(col("g"), " ", -1).as("w2"))
    val pairCounts = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minPairCount)
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val totTok = toks.agg(count(lit(1)).as("t_tok"))
    val totPair = pairs.agg(count(lit(1)).as("t_pair"))
    val ratio =
      col("n_pair").cast("double") * col("t_tok").cast("double") *
        col("t_tok").cast("double") /
        (col("t_pair").cast("double") * col("n_w1").cast("double") *
          col("n_w2").cast("double"))
    pairCounts
      .join(uni.select(col("tok").as("w1"), col("n").as("n_w1")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("n").as("n_w2")), Seq("w2"))
      .crossJoin(broadcast(totTok))
      .crossJoin(broadcast(totPair))
      .select(col("w1"), col("w2"), col("n_pair"), col("n_w1"), col("n_w2"),
        round(lit(1e6) * log(ratio)).cast("long").as("pmi_micro"))
  }

  /** Corpus-frequency gram mining: n-grams occurring in at least
    * `minDocs` DISTINCT documents, with their document frequency —
    * the input to boilerplate stripping / common-gram filters. */
  def commonGrams(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDocs: Long): DataFrame =
    grams(docs, idCol, textCol, n).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("doc_freq"))
      .where(col("doc_freq") >= minDocs)

  /** Onion-style first-occurrence novelty: per document, the share of
    * its DISTINCT word n-grams whose corpus-wide FIRST occurrence (the
    * minimum `idCol` over every document containing the gram — ids are
    * the corpus's arrival order) is this document. A crawl-snapshot /
    * dump-ordered corpus scores late boilerplate re-crawls near 0 and
    * genuinely new text near 1 — the incremental-dedup signal expressed
    * as a per-document SCORE instead of a drop verdict (the onion-dedup
    * family; complements q47's within-doc repetition and the q20/q64
    * whole-doc dedup tiers with a sub-document cross-doc measure).
    *
    * `novelty_ppm = 1e6·n_novel div n_grams` (integer division of
    * positives — floor on every engine); `kept = novelty_ppm >=
    * keepFloorPpm`. Documents with fewer than `n` tokens have no grams
    * and emit nothing (callers wanting them keep a left join on ids).
    *
    * Scale shape: the distinct (doc, gram) table is built once and
    * consumed twice — first-occurrence attribution is ONE map-side-
    * combinable `min` keyed on the gram string, and the join back to
    * (doc, gram) is gram-keyed too, so the aggregate's exchange is
    * reusable for the probe side; the per-doc rollup shuffles ids-only
    * rows. Nothing buffers a vocabulary anywhere: every shuffle keys on
    * gram or doc id and partial-aggregates, the q71-vocabulary
    * economics. */
  def noveltyProfile(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      keepFloorPpm: Long): DataFrame = {
    require(keepFloorPpm >= 0 && keepFloorPpm <= 1000000,
      s"keepFloorPpm must be in [0, 1e6], got $keepFloorPpm")
    val g = grams(docs, idCol, textCol, n).distinct()
    val firsts = g.groupBy(col("gram")).agg(min(col(idCol)).as("_first"))
    g.join(firsts, Seq("gram"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("_first") === col(idCol), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col(idCol), col("n_grams"), col("n_novel"),
        expr("(1000000 * n_novel) div n_grams").as("novelty_ppm"))
      .withColumn("kept", col("novelty_ppm") >= keepFloorPpm)
  }
}
