package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("train reproduces the hand-computed EM on a two-word corpus") {
    // words: "aaaa" (wc 1), "bb" (wc 1).
    // seed counts: a:4 aa:3 aaa:2 b:2 bb:1 → T=12, P=5, costs
    //   a = round(1e6·ln(17/5))  = 1223775
    //   aa = round(1e6·ln(17/4)) = 1446919
    //   aaa/b = round(1e6·ln(17/3)) = 1734601, bb = ln(17/2) → 2140066
    // round-1 Viterbi: "aaaa" → [aa, aa] (cost 2·1446919 beats
    // aaa+a = 2958376), "bb" → [bb]; counts aa:2 bb:1; prune keeps
    // aa, bb + single chars a, b (zero-count); T=3, P=4:
    //   aa = round(1e6·ln(7/3)) = 847298, bb = ln(7/2) → 1252763,
    //   a = b = ln(7/1) → 1945910
    // round-2 Viterbi: identical segmentations (position-3 tie between
    // paths of cost 2793208 resolves to the longer piece), so counts
    // and costs are a fixpoint.
    val docs = Seq((1L, "aaaa bb")).toDF("doc_id", "text")
    val got = UnigramLm.train(docs, "doc_id", "text")
      .orderBy(col("rank"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got === Array(
      ("aa", 2L, 847298L, 1),
      ("bb", 1L, 1252763L, 2),
      ("a", 0L, 1945910L, 3),
      ("b", 0L, 1945910L, 4)))
  }

  test("encodeStats applies the trained vocab; long words fall back") {
    // same trained vocab as the EM-trace test: "aaaa" → [aa, aa],
    // "bb" → [bb]; the 20-char word exceeds maxWordLen (12), is
    // excluded from training, and encodes at character fallback
    val docs = Seq(
      (1L, "aaaa bb"),
      (2L, "supercalifragilistic")).toDF("doc_id", "text")
    val got = UnigramLm.encodeStats(docs, "doc_id", "text")
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got === Array(
      (1L, 2L, 6L, 3L, 500000L),
      (2L, 1L, 20L, 20L, 0L)))
  }

  test("train on mixed prose: single chars always kept, ranks total") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog again"),
      (3L, "Pack my box with five dozen liquor jugs; pack it twice."),
      (4L, "supercalifragilisticexpialidocious is far too long a word"),
      (5L, "")).toDF("doc_id", "text")
    val out = UnigramLm.train(docs, "doc_id", "text",
      vocabSize = 16).collect()
    val pieces = out.map(_.getString(0))
    // every piece 1..3 chars from the canonical alphabet
    assert(pieces.forall(p => p.nonEmpty && p.length <= 3 &&
      p.forall(c => c.isLower || c.isDigit)))
    // all single chars of the (length-clamped) corpus survive the cut
    val chars = Seq(1L, 2L, 3L).flatMap(_ => Seq.empty[Char]) ++
      "thequickbrownfoxjumpsoverlazydogainpackmywithfvezenliqrjgstwc"
        .distinct
    chars.foreach(c =>
      assert(pieces.contains(c.toString), s"missing single char '$c'"))
    // the 25-char word exceeds maxWordLen and must contribute nothing
    // unique: no piece containing e.g. "xp" from its unique trigrams
    // unless another word has it — spot-check one unique trigram
    assert(!pieces.contains("xpi"))
    // ranks are unique and positive; pieces ranked ≤ 16 come first
    val ranks = out.map(_.getInt(3))
    assert(ranks.distinct.length === ranks.length && ranks.forall(_ >= 1))
    // deterministic: a second run is bit-identical
    val again = UnigramLm.train(docs, "doc_id", "text",
      vocabSize = 16).collect()
    assert(out.map(_.toString).sorted.toSeq ===
      again.map(_.toString).sorted.toSeq)
  }
}
