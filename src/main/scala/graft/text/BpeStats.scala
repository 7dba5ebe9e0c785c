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
}
