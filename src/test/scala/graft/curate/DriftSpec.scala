package graft.curate

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (
    (1L to 50L).map(i => (i, "the quick brown fox jumps over the lazy dog", "web")) ++
    (51L to 100L).map(i => (i, "the quick brown fox jumps over the lazy dog", "news")) ++
    (101L to 110L).map(i => (i, "qqqq zzzz xxxx qqqq zzzz xxxx qqqq zzzz", "weird"))
  ).toDF("doc_id", "text", "source")

  private def drift(buckets: Int = 64) =
    Drift.sourceDrift(docs, "doc_id", "text", "source", buckets)

  test("an off-distribution source scores far higher KL than typical ones") {
    val m = drift().collect()
      .map(r => r.getString(0) -> r.getAs[Long]("kl_micro")).toMap
    assert(m("weird") > 10 * math.max(m("web"), 1L))
    assert(m("web") === m("news")) // identical token streams, same size
  }

  test("single-source corpus has exactly zero drift") {
    val one = (1L to 20L).map(i => (i, "alpha beta gamma delta", "only"))
      .toDF("doc_id", "text", "source")
    val row = Drift.sourceDrift(one, "doc_id", "text", "source", 64).head
    assert(row.getAs[Long]("kl_micro") === 0L)
    assert(row.getAs[Long]("n_tokens") === 80L)
  }

  test("drift is partition-independent (terms round on the metadata table)") {
    val a = drift().collect().map(r => (r.getString(0), r.getLong(2))).toMap
    val b = Drift.sourceDrift(docs.repartition(7), "doc_id", "text",
        "source", 64)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(a === b)
  }

  test("one row per source; n_tokens is the source token count") {
    val rows = drift().collect()
    assert(rows.map(_.getString(0)).sorted === Array("news", "web", "weird"))
    val n = rows.map(r => r.getString(0) -> r.getAs[Long]("n_tokens")).toMap
    assert(n("web") === 50L * 9)
    assert(n("weird") === 10L * 8)
  }
}
