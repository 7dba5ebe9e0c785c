package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BPE merge-round statistics: the adjacent-symbol pair counting kernel
  * at the heart of byte-pair-encoding tokenizer training (Sennrich et
  * al. 2016, public technique; the counting stage GPT-2/LLaMA-style
  * tokenizer builds distribute over the corpus). One round = count
  * every adjacent character pair inside every canonical-token
  * occurrence, rank by frequency; the top pair is the next merge.
  *
  * Reference scope note: the reference warehouse has no tokenizer
  * stage; this is LLM-pipeline extension surface, sibling to the q34/
  * q35/q100 hashed selection tier whose tokenization it shares.
  *
  * Scale shape — why this needs no vocabulary anywhere: pairs are
  * extracted per token occurrence with a codegen'd `substr` projection
  * over a bounded index fan-out — no per-character window, no
  * higher-order `transform` (the q44 lesson: those run interpreted per
  * element) — then aggregated by pair string. The alphabet is the
  * canonical [a-z0-9], so the pair key space is ≤ 36² — partial
  * aggregation collapses every partition's occurrence counts to at
  * most ~1.3k rows before the shuffle; the occurrence count's exchange
  * carries metadata no matter the corpus size. The document-frequency
  * column is the one |docs|-proportional stage: its partial-distinct
  * shuffle is keyed (pair, doc) and bounded by 36² rows PER DOCUMENT
  * (not per token), orders below the token stream. The rank window
  * runs over the ≤ 36²-row final table only. No word-frequency table,
  * no vocabulary shuffle, no driver state: the same plan runs at
  * 100 TB with the pair-count shuffle unchanged.
  *
  * Determinism: counts are exact BIGINTs; rank ties break on the pair
  * string, so the output hash-matches an ANSI-SQL oracle.
  */
object BpeStats {

  /** Adjacent-pair counts over every canonical token occurrence of
    * `textCol`, ranked by (count desc, pair asc). Output: one row per
    * distinct pair — `pair` (2-char string), `n` (BIGINT occurrence
    * count), `n_docs` (BIGINT distinct docs containing the pair),
    * `rank` (1 = the round's merge winner). Tokens shorter than 2
    * chars contribute nothing. */
  def pairCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // One row per (doc, token position, char position): explode tokens
    // with their position so the character window can key on a
    // document-unique token instance. The char pair is substring-based
    // (no per-char explode): for a token of length L, positions
    // 1..L-1 each yield substring(tok, i, 2) — built with a posexplode
    // over the token and a codegen'd substring, no window needed at
    // all: the pair is a pure projection of (token, index).
    val toks = docs
      .select(col(idCol).as("_id"),
        posexplode(WordGrams.tokens(col(textCol))).as(Seq("_tp", "tok")))
      .where(length(col("tok")) >= 2)
    // sequence(1, L-1) fans each token occurrence to its pair indexes;
    // the downstream substring is a plain projection. The fan-out is
    // bounded by the doc's own character count and collapses at the
    // very next partial aggregate.
    val pairs = toks
      .select(col("_id"),
        explode(sequence(lit(1), length(col("tok")) - 1)).as("_i"),
        col("tok"))
      .select(col("_id"), substring3(col("tok"), col("_i")).as("pair"))
    val counts = pairs
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"),
        count_distinct(col("_id")).as("n_docs"))
    // ≤ alphabet² rows from here on: a single global rank window over
    // the metadata-sized pair table is the intended plan.
    counts
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("pair"))))
      .select(col("pair"), col("n").cast("long").as("n"),
        col("n_docs").cast("long").as("n_docs"), col("rank"))
  }

  /** `substring(tok, i, 2)` with a Column start — the 3-arg substring
    * builder Spark exposes only via `expr`/Column ops. */
  private def substring3(tok: Column, start: Column): Column =
    tok.substr(start, lit(2))

  /** Iterative BPE merge training (Sennrich et al. 2016): `rounds`
    * merge decisions over the corpus, each round counting adjacent
    * SYMBOL pairs weighted by word frequency, merging the most frequent
    * pair (ties → lexicographically smallest), and re-segmenting before
    * the next count. Output: one row per round — `round`, `pair`
    * ("a b"), `merged` ("ab"), `n` (weighted occurrence count at
    * decision time).
    *
    * Scale shape — the classic trainer optimization, distributed: ONE
    * corpus pass collapses to the (word, count) frequency table (the
    * only corpus-scale shuffle, vocabulary-sized output); every round
    * then runs over that vocab table alone — pair counts partial-
    * aggregate to ≤ |symbols|²-row metadata, and the winning pair (a
    * single row, the same driver-metadata bound as q36's centroids) is
    * folded back as a literal. The vocab table is lazily checkpointed
    * per round so round k+1 never re-executes rounds 1..k.
    *
    * Merge-application contract (cross-engine determinism over
    * canonical-BPE fidelity): symbols live in a space-delimited string
    * with sentinel padding, and a merge applies as `passes` (default 4)
    * leftmost-non-overlapping `replace` passes of `" a b "` → `" ab "`.
    * Plain replace consumes the trailing delimiter of a match, so ONE
    * pass skips every second occurrence in an alternating chain
    * ("a b a b"); each extra pass halves the residue, and 4 passes are
    * a fixpoint for any chain of ≤ 16 consecutive pair repeats. Spark's
    * `replace`, Java's `String.replace` and DuckDB's `replace` share
    * these exact semantics, so the decision sequence hash-matches an
    * unrolled ANSI-SQL oracle — unlike a lookaround-regex application,
    * whose engine-specific regex dialects could silently diverge. */
  /** Apply trained merges to the corpus and report per-document
    * tokenizer load — the encode side of [[merges]]: every canonical
    * token is re-segmented by the `rounds` learned merges (same
    * engine-exact `passes`-pass replace application), and each doc gets
    * its whitespace-token count, character-symbol count (the no-merge
    * baseline), post-BPE symbol count and the integer-ppm saving. The
    * number a budget planner actually wants: context-window cost under
    * the REAL tokenizer, not a regex proxy ([[TextAnalysis
    * .bpeishTokenCount]]).
    *
    * Scale shape: [[merges]]'s vocab-table training plus ONE encode
    * pass over the corpus — the merge decisions arrive as literals
    * (`rounds` rows of driver metadata), so the encode is a narrow
    * codegen'd replace chain + one doc-keyed aggregate. */
  def encodeStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rounds: Int,
      passes: Int = 4): DataFrame = {
    val learned = merges(docs, idCol, textCol, rounds, passes)
      .orderBy(col("round")).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val toks = docs
      .select(col(idCol),
        explode(WordGrams.tokens(col(textCol))).as("tok"))
      .where(length(col("tok")) >= 1)
    val sym0 = concat(lit(" "),
      trim(regexp_replace(col("tok"), "(.)", "$1 ")), lit(" "))
    val symN = learned.foldLeft(sym0) { case (acc, (pair, merged)) =>
      (1 to passes).foldLeft(acc)((c, _) =>
        replace(c, lit(s" $pair "), lit(s" $merged ")))
    }
    toks
      .select(col(idCol), length(col("tok")).cast("long").as("n_char"),
        size(split(trim(symN), " ")).cast("long").as("n_bpe"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(col("n_char")).as("n_char_symbols"),
        sum(col("n_bpe")).as("n_bpe_symbols"))
      .withColumn("saved_ppm",
        expr("(1000000L * (n_char_symbols - n_bpe_symbols)) div n_char_symbols"))
  }

  def merges(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rounds: Int,
      passes: Int = 4): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(passes >= 1, s"passes must be >= 1, got $passes")
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab0 = docs
      .select(explode(WordGrams.tokens(col(textCol))).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).cast("long").as("wc"))
      // "hello" -> " h e l l o " (sentinel spaces so every symbol is
      // space-flanked and a multi-char symbol can never prefix-match
      // inside another)
      .select(
        concat(lit(" "), trim(regexp_replace(col("w"), "(.)", "$1 ")), lit(" "))
          .as("sym"),
        col("wc"))
    var cur = graft.util.Blocks.lazyCheckpoint(vocab0)
    var prev: Option[DataFrame] = None
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val syms = split(trim(col("sym")), " ")
      val top = cur
        .select(col("wc"), explode(arrays_zip(
          slice(syms, lit(1), size(syms) - 1).as("a"),
          slice(syms, lit(2), size(syms) - 1).as("b"))).as("p"))
        .select(concat(col("p.a"), lit(" "), col("p.b")).as("pair"), col("wc"))
        .groupBy(col("pair")).agg(sum(col("wc")).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top.head.getString(0)
        val n = top.head.getLong(1)
        val merged = pair.replace(" ", "")
        out += ((r, pair, merged, n))
        var symCol: Column = col("sym")
        for (_ <- 1 to passes)
          symCol = replace(symCol, lit(s" $pair "), lit(s" $merged "))
        val next = graft.util.Blocks.lazyCheckpoint(
          cur.select(symCol.as("sym"), col("wc")))
        // round r's top-1 materialized `cur`; its predecessor is now
        // consumed on both paths and can release
        prev.foreach(graft.util.Blocks.release)
        prev = Some(cur)
        cur = next
        r += 1
      }
    }
    prev.foreach(graft.util.Blocks.release)
    graft.util.Blocks.release(cur)
    out.toSeq.toDF("round", "pair", "merged", "n")
      .select(col("round").cast("int").as("round"), col("pair"),
        col("merged"), col("n"))
  }
}
