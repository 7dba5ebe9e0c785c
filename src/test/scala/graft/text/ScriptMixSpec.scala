package graft.text

import graft.SparkSpec

class ScriptMixSpec extends SparkSpec {
  import spark.implicits._

  test("codepoint classes count exactly and dominant follows priority") {
    val docs = Seq(
      (0L, "abc 123"),            // latin 3, digit 3, other 1 (space)
      (1L, "привет мир"),         // cyrillic 9, other 1
      (2L, "αβγ"),                // greek 3
      (3L, "模型訓練"),            // cjk 4
      (4L, "")                    // none
    ).toDF("doc_id", "text")
    val p = ScriptMix.profile(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(p(0L).getAs[Long]("latin_cp") == 3
      && p(0L).getAs[Long]("digit_cp") == 3
      && p(0L).getAs[Long]("other_cp") == 1
      && p(0L).getAs[String]("dominant") == "latin")
    assert(p(1L).getAs[Long]("cyr_cp") == 9
      && p(1L).getAs[String]("dominant") == "cyrillic")
    assert(p(2L).getAs[String]("dominant") == "greek")
    assert(p(3L).getAs[Long]("cjk_cp") == 4
      && p(3L).getAs[String]("dominant") == "cjk")
    assert(p(4L).getAs[String]("dominant") == "none")
  }

  test("non-BMP codepoints count once into other_cp (not twice as UTF-16 units)") {
    // U+1F600 GRINNING FACE is 2 UTF-16 units; a codepoint-native
    // engine counts 1 — other_cp must agree with the codepoint count.
    val docs = Seq(
      (0L, "ab😀"),                 // 2 latin + 1 emoji
      (1L, "😀😁")        // 2 emoji, nothing else
    ).toDF("doc_id", "text")
    val p = ScriptMix.profile(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(p(0L).getAs[Long]("latin_cp") == 2)
    assert(p(0L).getAs[Long]("other_cp") == 1, "one emoji = one codepoint")
    assert(p(1L).getAs[Long]("other_cp") == 2)
    assert(p(1L).getAs[String]("dominant") == "none")
  }

  test("latin wins ties by priority; mixed flags only adjacency") {
    val docs = Seq(
      (0L, "ab яж"),     // 2 latin, 2 cyrillic, separated -> not mixed
      (1L, "aя"),        // adjacent -> mixed
      (2L, "я b я b")    // adjacency across classes but space-separated
    ).toDF("doc_id", "text")
    val p = ScriptMix.profile(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(p(0L).getAs[String]("dominant") == "latin", "tie goes to latin")
    assert(!p(0L).getAs[Boolean]("mixed"))
    assert(p(1L).getAs[Boolean]("mixed"))
    assert(!p(2L).getAs[Boolean]("mixed"))
  }

  test("rollup sums per (source, script) and counts mixed docs") {
    val docs = Seq(
      (0L, "s1", "abcя"),   // latin-dominant, mixed
      (1L, "s1", "xyz"),
      (2L, "s1", "мир"),
      (3L, "s2", "hello")
    ).toDF("doc_id", "source", "text")
    val out = ScriptMix.rollup(docs, "doc_id", "source", "text").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("script")) -> r)
      .toMap
    val s1latin = out(("s1", "latin"))
    assert(s1latin.getAs[Long]("n_docs") == 2)
    assert(s1latin.getAs[Long]("n_mixed") == 1)
    assert(s1latin.getAs[Long]("latin_cp") == 6)
    assert(s1latin.getAs[Long]("cyr_cp") == 1)
    assert(out(("s1", "cyrillic")).getAs[Long]("n_docs") == 1)
    assert(out(("s2", "latin")).getAs[Long]("n_docs") == 1)
  }
}
