package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NoveltySpec extends SparkSpec {
  import spark.implicits._

  test("first occurrence wins by min id; a later duplicate is 0-novel") {
    val docs = Seq(
      (1L, "a b c d"),        // grams "a b c","b c d" — both first here
      (2L, "a b c d"),        // exact duplicate, later id -> 0 novel
      (3L, "b c d e f")       // "b c d" seen (doc 1), "c d e","d e f" new
    ).toDF("doc_id", "text")
    val out = WordGrams.noveltyProfile(docs, "doc_id", "text",
        n = 3, keepFloorPpm = 500000L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out(1L) === ((2L, 2L, 1000000L, true)))
    assert(out(2L) === ((2L, 0L, 0L, false)))
    // 2 of 3 grams novel: floor(2e6/3) = 666666 >= 500000
    assert(out(3L) === ((3L, 2L, 666666L, true)))
  }

  test("documents with fewer than n tokens emit nothing") {
    val docs = Seq((1L, "a b"), (2L, ""), (3L, "x y z")).toDF("doc_id", "text")
    val ids = WordGrams.noveltyProfile(docs, "doc_id", "text", 3, 0L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(3L))
  }

  test("deterministic under repartitioning") {
    val docs = (1L to 200L)
      .map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} w${i % 11} w${i % 2}"))
      .toDF("doc_id", "text")
    val a = WordGrams.noveltyProfile(docs, "doc_id", "text", 3, 500000L)
      .orderBy("doc_id").collect().toSeq
    val b = WordGrams.noveltyProfile(docs.repartition(13), "doc_id", "text",
        3, 500000L)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("keepFloorPpm bounds are validated") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      WordGrams.noveltyProfile(docs, "doc_id", "text", 3, -1L)
    }
    intercept[IllegalArgumentException] {
      WordGrams.noveltyProfile(docs, "doc_id", "text", 3, 1000001L)
    }
  }
}
