package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeStatsSpec extends SparkSpec {
  import spark.implicits._

  test("pairCounts counts every adjacent pair of every token occurrence") {
    // "abab ab" -> token "abab": ab, ba, ab ; token "ab": ab
    // "ab" -> ab ; "x" -> nothing (length-1 token)
    val docs = Seq(
      (1L, "abab ab"),
      (2L, "AB!x")
    ).toDF("doc_id", "text")
    val out = BpeStats.pairCounts(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out === Map(
      "ab" -> ((4L, 2L, 1)),   // 3 in doc 1 + 1 in doc 2, 2 docs, top rank
      "ba" -> ((1L, 1L, 2))))
  }

  test("canonicalization folds case and punctuation before pairing") {
    val docs = Seq((1L, "He-Llo"), (2L, "he llo")).toDF("doc_id", "text")
    val out = BpeStats.pairCounts(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // doc 1 splits on '-' exactly like doc 2's space: he / llo both times
    assert(out === Map("he" -> 2L, "ll" -> 2L, "lo" -> 2L))
  }

  test("rank is dense over count desc with pair-string ties and the result is partitioning-independent") {
    val docs = (0L until 40L)
      .map(i => (i, s"pair${i % 5} merge token rank"))
      .toDF("doc_id", "text")
    val one = BpeStats.pairCounts(docs.coalesce(1), "doc_id", "text")
      .orderBy("pair").collect().toSeq
    val many = BpeStats.pairCounts(docs.repartition(7), "doc_id", "text")
      .orderBy("pair").collect().toSeq
    assert(one === many)
    val ranks = one.map(_.getInt(3)).sorted
    assert(ranks === (1 to one.size).toList)
    // counts non-increasing in rank order; ties broken by pair asc
    val byRank = one.sortBy(_.getInt(3))
    byRank.sliding(2).foreach { case Seq(a, b) =>
      val (na, nb) = (a.getLong(1), b.getLong(1))
      assert(na > nb || (na == nb && a.getString(0) < b.getString(0)))
    }
  }

  test("empty and sub-2-char corpora yield an empty pair table") {
    val docs = Seq((1L, ""), (2L, "a b c !"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(BpeStats.pairCounts(docs, "doc_id", "text").count() === 0L)
  }

  test("merges walks the hand-computed decision sequence and re-segments") {
    // corpus: "low lower lowest low low" x1 -> word freqs:
    //   low:3 lower:1 lowest:1
    // round 1 pairs (weighted): "l o":5, "o w":5, "w e":2, "e r":1,
    //   "e s":1, "s t":1 -> tie "l o" vs "o w" at 5 -> lexic: "l o"
    // round 2: symbols lo w [e r / e s t]: "lo w":5, "w e":2, ... -> "lo w"
    // round 3: low / low e r / low e s t: "low e":2, "e r":1, "e s":1,
    //   "s t":1 -> "low e"
    val docs = Seq((1L, "low lower lowest low low")).toDF("doc_id", "text")
    val got = BpeStats.merges(docs, "doc_id", "text", rounds = 3)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1, "l o", "lo", 5L),
      (2, "lo w", "low", 5L),
      (3, "low e", "lowe", 2L)))
  }

  test("merges handles alternating chains within the declared 4-pass fixpoint") {
    // "ababab...": pair (a,b) wins; 4 replace passes must merge EVERY
    // non-overlapping occurrence (the single-pass trailing-space skip
    // halves the residue each pass)
    val docs = Seq((1L, ("ab" * 8) + " xy")).toDF("doc_id", "text")
    val m = BpeStats.merges(docs, "doc_id", "text", rounds = 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) === ((1, "a b", "ab", 8L)))
    // after round 1 the word is 8 "ab" symbols -> round 2's top pair is
    // "ab ab" with weighted count 7 (adjacent occurrences of the merged
    // symbol), proving ALL 8 merges applied in round 1
    assert(m(1) === ((2, "ab ab", "abab", 7L)))
  }

  test("encodeStats applies the learned merges back to every token") {
    // merges on this corpus: l o -> lo, lo w -> low, low e -> lowe
    // tokens: low lower lowest low low -> chars 3+5+6+3+3 = 20
    // post-merge symbols: [low] [lowe r] [lowe s t] [low] [low] = 8
    val docs = Seq((1L, "low lower lowest low low")).toDF("doc_id", "text")
    val r = BpeStats.encodeStats(docs, "doc_id", "text", rounds = 3).head()
    assert(r.getAs[Long]("n_tokens") === 5L)
    assert(r.getAs[Long]("n_char_symbols") === 20L)
    assert(r.getAs[Long]("n_bpe_symbols") === 8L)
    assert(r.getAs[Long]("saved_ppm") === 600000L)
  }

  test("encodeStats: single-char tokens pass through untouched") {
    val docs = Seq((1L, "a bb bb")).toDF("doc_id", "text")
    // merge 1: "b b" -> "bb"; token "a" stays 1 symbol
    val r = BpeStats.encodeStats(docs, "doc_id", "text", rounds = 1).head()
    assert(r.getAs[Long]("n_tokens") === 3L)
    assert(r.getAs[Long]("n_char_symbols") === 5L)
    assert(r.getAs[Long]("n_bpe_symbols") === 3L) // a, bb, bb
  }

  test("merges is partitioning-independent and stops early when no pairs remain") {
    val docs = (0L until 30L).map(i => (i, s"tok${i % 3} tok${i % 5}"))
      .toDF("doc_id", "text")
    val a = BpeStats.merges(docs.coalesce(1), "doc_id", "text", 2).collect()
    val b = BpeStats.merges(docs.repartition(7), "doc_id", "text", 2).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    // single-letter-only corpus: zero rounds emitted, empty frame
    val empty = Seq((1L, "a b c d")).toDF("doc_id", "text")
    assert(BpeStats.merges(empty, "doc_id", "text", 3).count() === 0L)
  }
}
