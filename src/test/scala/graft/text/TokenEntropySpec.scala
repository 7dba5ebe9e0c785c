package graft.text

import graft.SparkSpec

class TokenEntropySpec extends SparkSpec {
  import spark.implicits._

  private val Ln2 = 693147L   // round(1e6 * ln 2)
  private val Ln4 = 1386294L  // round(1e6 * ln 4)

  test("entropy is 0 for a single repeated token and ln n for all-distinct") {
    val docs = Seq(
      (1L, "x x x x"),   // one type, c=4: H = ln4 - (4*ln4)/4 = 0
      (2L, "a b c d"),   // four types, c=1 each: H = ln4
      (3L, "a a b b")    // two types, c=2: H = ln4 - (2*2*ln2)/4 = ln2
    ).toDF("doc_id", "text")
    val out = TokenEntropy.entropyProfile(docs, "doc_id", "text",
        keepFloorMicroNats = Ln2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5))).toMap
    assert(out(1L) === ((4L, 1L, 0L, 250000L, false)))
    assert(out(2L) === ((4L, 4L, Ln4, 1000000L, true)))
    assert(out(3L) === ((4L, 2L, Ln2, 500000L, true)))
  }

  test("blank documents emit nothing") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "ok then")).toDF("doc_id", "text")
    val ids = TokenEntropy.entropyProfile(docs, "doc_id", "text", 0L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(3L))
  }

  test("deterministic under repartitioning") {
    val docs = (1L to 300L)
      .map(i => (i, (0 until (3 + (i % 9)).toInt)
        .map(j => s"t${(i + j) % 6}").mkString(" ")))
      .toDF("doc_id", "text")
    val a = TokenEntropy.entropyProfile(docs, "doc_id", "text", Ln2)
      .orderBy("doc_id").collect().toSeq
    val b = TokenEntropy.entropyProfile(docs.repartition(11), "doc_id", "text",
        Ln2)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("floor is validated") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TokenEntropy.entropyProfile(docs, "doc_id", "text", -1L)
    }
  }
}
