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
}
