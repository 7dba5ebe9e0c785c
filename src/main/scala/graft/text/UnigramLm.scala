package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer vocabulary trainer —
  * the EM sibling of [[BpeStats.merges]]: instead of greedy merge
  * decisions, fit a unigram language model over subword pieces by
  * expectation-maximization (Kudo 2018, public technique) and keep the
  * highest-expected-count pieces as the vocabulary.
  *
  * Reference scope note: the reference warehouse has no tokenizer
  * stage; this is LLM-pipeline extension surface, sibling to q108's
  * BPE trainer and sharing its canonical-token word space.
  *
  * Semantics (all integer micro-nats, engine-exact):
  *   - words = canonical tokens of length 1..`maxWordLen` with corpus
  *     frequencies (longer words are EXCLUDED from training — declared
  *     clamp, the SentencePiece max-piece/max-sentence discipline);
  *   - seed pieces = every substring of length 1..`maxPieceLen` of
  *     every word, occurrence-weighted by word frequency;
  *   - piece cost = `round(-1e6 · ln((cnt+1)/(T+P)))` (Laplace
  *     smoothing over the current piece table: T = Σ cnt, P = |pieces|
  *     — the q35 once-rounded micro-nat idiom, so costs reproduce
  *     bit-for-bit cross-engine);
  *   - each EM round: E-step Viterbi-segments every word under the
  *     current costs (dp over positions, ties broken to the LONGER
  *     piece — deterministic), attributing word frequency to the
  *     pieces on the best path; pieces with zero expected count are
  *     pruned (single-character pieces are always kept, so every word
  *     stays segmentable); M-step re-scores the survivors;
  *   - after `emRounds` rounds the vocabulary is the top `vocabSize`
  *     pieces by (expected count desc, piece asc) plus all single
  *     characters.
  *
  * Scale shape — the q108 contract: ONE corpus pass collapses to the
  * (word, frequency) table (the only corpus-scale shuffle; output is
  * vocabulary-sized), and everything after — seeding, the
  * `maxWordLen`-step dp, backtracking, counting, re-scoring — runs
  * over that vocab table alone. The dp runs as ONE candidate join plus
  * one aggregate() higher-order walk per word (see [[viterbiSegments]]
  * — this round-16 shape replaced the former maxWordLen-step
  * join+aggregate loop, whose ~36 vocab-sized stages per EM round were
  * almost pure scheduling cost); backtracking is one aggregate()
  * higher-order expression per word. No
  * step's cost depends on corpus size, so the same plan trains on
  * 100 TB with only the word-frequency shuffle growing.
  *
  * Determinism: counts are exact BIGINTs; dp costs are once-rounded
  * micro-nat BIGINTs; every tie-break is total (cost asc, piece length
  * desc / count desc, piece asc) — the output hash-matches an unrolled
  * ANSI-SQL oracle (the q108 gating precedent).
  */
object UnigramLm {

  /** Train the vocabulary. Output: one row per kept piece —
    * `piece`, `n_exp` (expected count from the final E-step, BIGINT),
    * `nll_micro` (final re-scored cost), `rank` (1-based by
    * (n_exp desc, piece asc); single-char pieces kept past
    * `vocabSize` retain their global rank). */
  def train(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxPieceLen: Int = 3,
      maxWordLen: Int = 12,
      emRounds: Int = 2,
      vocabSize: Int = 64): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(maxWordLen >= maxPieceLen,
      s"maxWordLen ($maxWordLen) must be >= maxPieceLen ($maxPieceLen)")
    require(emRounds >= 1, s"emRounds must be >= 1, got $emRounds")
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    // ONE corpus pass: the word-frequency table. Everything below is
    // vocabulary-sized.
    val words = graft.util.Blocks.lazyCheckpoint(
      wordTable(docs, textCol, maxWordLen))
    // Laplace-smoothed once-rounded micro-nat cost over a (p, cnt)
    // table — T and P are metadata-sized aggregates, broadcast.
    def rescore(cnts: DataFrame): DataFrame =
      cnts
        .crossJoin(broadcast(
          cnts.agg(sum(col("cnt")).as("_t"), count(lit(1)).as("_np"))))
        .select(col("p"), col("cnt"),
          round(lit(-1e6) *
            log((col("cnt") + lit(1.0)) / (col("_t") + col("_np"))))
            .cast("long").as("nll"))
    val seed = words
      .select(col("w"), col("wc"),
        explode(sequence(lit(1), col("len"))).as("i"), col("len"))
      .select(col("w"), col("wc"), col("i"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), col("len") - col("i") + 1))).as("l"))
      .select(col("w").substr(col("i"), col("l")).as("p"), col("wc"))
      .groupBy(col("p")).agg(sum(col("wc")).as("cnt"))
    var pieces = graft.util.Blocks.lazyCheckpoint(rescore(seed))
    for (_ <- 1 to emRounds) {
      val bt = viterbiSegments(words, pieces, maxPieceLen, maxWordLen)
      val used = bt
        .select(explode(col("acc")).as("p"), col("wc"))
        .groupBy(col("p")).agg(sum(col("wc")).as("cnt"))
      // prune (zero expected count, unless single-char) + M-step
      val cnts = pieces.select(col("p"))
        .join(used, Seq("p"), "left")
        .select(col("p"), coalesce(col("cnt"), lit(0L)).as("cnt"))
        .where(col("cnt") > 0 || length(col("p")) === 1)
      pieces = graft.util.Blocks.lazyCheckpoint(rescore(cnts))
    }
    // vocabulary cut — one global window over the metadata-sized
    // final piece table (the BpeStats.pairCounts precedent)
    pieces
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("p").asc)))
      .where(col("rank") <= vocabSize || length(col("p")) === 1)
      .select(col("p").as("piece"), col("cnt").as("n_exp"),
        col("nll").as("nll_micro"), col("rank"))
  }

  /** Canonical word-frequency table: (`w`, `wc`, `len`) for tokens of
    * length 1..`maxWordLen` (the one corpus-scale pass; "" tokens of
    * empty text excluded — the lower bound also guards the seed
    * explode, where Spark's sequence(1, 0) would run DESCENDING). */
  private def wordTable(
      docs: DataFrame,
      textCol: String,
      maxWordLen: Int): DataFrame =
    docs
      .select(explode(WordGrams.tokens(col(textCol))).as("w"))
      .where(length(col("w")).between(1, maxWordLen))
      .groupBy(col("w")).agg(count(lit(1)).cast("long").as("wc"))
      .withColumn("len", length(col("w")))

  /** Viterbi segmentation of every word under a (p, nll) piece-cost
    * table: one candidate join builds a per-word (position, length) →
    * cost map, one aggregate() higher-order walk computes the dp
    * (state per word: array of (cost, chosen piece length) structs,
    * element k+1 = position k, position-0 a dummy (0, 0); ties to the
    * LONGER piece), then ONE aggregate() higher-order backtrack per
    * word. Both walks are HOFs rather than chained per-step
    * projections because CollapseProject inlines a projection chain
    * into one projection whose expressions duplicate 2^maxWordLen-fold
    * (measured: a CPU blow-up that starved the executor heartbeat);
    * the HOFs keep the expression tree fixed-size and run maxWordLen
    * interpreted iterations per word over a vocab-sized frame.
    *
    * Requires every single character of `words` to be present in
    * `pieces` (the trainer maintains this invariant), so the dp is
    * always feasible. Returns (`w`, `wc`, `acc` — the piece sequence
    * in reverse word order). */
  private def viterbiSegments(
      words: DataFrame,
      pieces: DataFrame,
      maxPieceLen: Int,
      maxWordLen: Int): DataFrame = {
    require(maxPieceLen <= 15,
      s"maxPieceLen must be <= 15 (candidate-key stride), got $maxPieceLen")
    // Every candidate (end position x, piece length l) of every word is
    // enumerated and joined against the cost table ONCE, collected into
    // a per-word (x·16 + l) -> nll lookup map; the dp then runs as ONE
    // aggregate() higher-order walk per word over that map. This
    // replaces the former maxWordLen-step loop of join + min-aggregate
    // + state-join stages (measured at sf0.1: ~36 vocab-sized stages
    // per EM round of almost pure scheduling cost) with two shuffles —
    // the candidate join and the per-word collect — while computing the
    // IDENTICAL dp: min over l of dp[x−l] + nll(x,l), ties to the
    // LONGER piece (ascending-l walk replaces on <=), positions beyond
    // the word length untouched. Missing (x,l) candidates (pruned
    // pieces) are skipped by the NULL map probe; l = 1 always resolves
    // (single characters never prune — the trainer invariant), so the
    // dp stays feasible. No per-step checkpoints needed: the plan is
    // one fixed-size projection.
    val cand = words
      .select(col("w"), col("wc"), col("len"),
        explode(sequence(lit(1), col("len"))).as("x"))
      .select(col("w"), col("wc"), col("len"),
        col("x"), explode(sequence(lit(1),
          least(lit(maxPieceLen), col("x")))).as("l"))
      .select(col("w"), col("wc"), col("len"),
        (col("x") * 16 + col("l")).as("k"),
        col("w").substr(col("x") - col("l") + 1, col("l")).as("p"))
    val costed = cand.join(pieces.select(col("p"), col("nll")), "p")
      .groupBy(col("w"), col("wc"), col("len"))
      .agg(map_from_entries(collect_list(struct(col("k"), col("nll"))))
        .as("m"))
    val state = costed
      .select(col("w"), col("wc"), col("len"),
        expr(s"""aggregate(
          sequence(1, $maxWordLen),
          array(named_struct('c', cast(0 as bigint), 'l', 0)),
          (st, x) -> if(x > len, st,
            concat(st, array(aggregate(
              sequence(1, least($maxPieceLen, x)),
              named_struct('c', cast(null as bigint), 'l', 0),
              (b, ll) -> if(element_at(m, x * 16 + ll) is null, b,
                if(b.c is null or element_at(st, x - ll + 1).c
                     + element_at(m, x * 16 + ll) <= b.c,
                  named_struct('c', element_at(st, x - ll + 1).c
                     + element_at(m, x * 16 + ll), 'l', ll),
                  b)))))),
          st -> st)""").as("_arr"))
      .select(col("w"), col("wc"), col("len"),
        expr("transform(_arr, e -> e.l)").as("bl"))
    state.select(col("w"), col("wc"),
      expr(s"""aggregate(
        sequence(1, $maxWordLen),
        named_struct('pos', len, 'acc', cast(array() as array<string>)),
        (st, x) -> if(st.pos > 0,
          named_struct(
            'pos', st.pos - element_at(bl, st.pos + 1),
            'acc', concat(st.acc, array(substring(w,
              st.pos - element_at(bl, st.pos + 1) + 1,
              element_at(bl, st.pos + 1))))),
          st),
        st -> st.acc)""").as("acc"))
  }

  /** Apply the trained vocabulary to the corpus and report per-doc
    * tokenizer load — the encode side of [[train]] (the q111-to-q108
    * relationship): every canonical token is Viterbi-segmented under
    * the FINAL trained piece costs, and each doc gets its token count,
    * character-symbol count (the no-merge baseline), piece count and
    * the integer-ppm saving. Words longer than `maxWordLen` (excluded
    * from training) fall back to character segmentation — declared,
    * matching the trainer's clamp.
    *
    * Scale shape: [[train]]'s vocab-bounded EM plus ONE more
    * vocab-bounded segmentation pass, then one broadcast-joinable
    * (word → piece count) map applied to the token stream and a
    * per-doc rollup — the corpus-scale work is the token explode and
    * the doc-keyed aggregate, same as q111. */
  def encodeStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxPieceLen: Int = 3,
      maxWordLen: Int = 12,
      emRounds: Int = 2,
      vocabSize: Int = 64): DataFrame = {
    val vocab = train(docs, idCol, textCol, maxPieceLen, maxWordLen,
      emRounds, vocabSize)
      .select(col("piece").as("p"), col("nll_micro").as("nll"))
    val words = graft.util.Blocks.lazyCheckpoint(
      wordTable(docs, textCol, maxWordLen))
    val perWord = viterbiSegments(words, vocab, maxPieceLen, maxWordLen)
      .select(col("w").as("tok"), size(col("acc")).as("n_pieces"))
    val toks = docs
      .select(col(idCol),
        explode(WordGrams.tokens(col(textCol))).as("tok"))
      .where(length(col("tok")) >= 1)
    toks
      .join(broadcast(perWord), Seq("tok"), "left")
      .select(col(idCol),
        length(col("tok")).cast("long").as("n_char"),
        coalesce(col("n_pieces").cast("long"),
          length(col("tok")).cast("long")).as("np"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(col("n_char")).as("n_char_symbols"),
        sum(col("np")).as("n_pieces"))
      .withColumn("saved_ppm",
        expr("(1000000L * (n_char_symbols - n_pieces)) div n_char_symbols"))
  }
}
