package graft.retrieval

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // tiny corpus with controlled term statistics:
  //  - "zebra" appears only in docs 0 and 3 (rare — the retrieval signal)
  //  - "common" appears everywhere (high df — near-zero idf)
  private def corpus = Seq(
    (0L, "zebra quartz common word word"),
    (1L, "common word filler filler filler"),
    (2L, "common word other text here"),
    (3L, "zebra common word word word"),
    (4L, "quartz common filler filler filler")
  ).toDF("doc_id", "text")

  test("rare shared term dominates retrieval; probe never retrieves itself") {
    val out = Bm25.moreLikeThis(corpus, "doc_id", "text",
      probeFilter = _ === 0L, nTerms = 2, k = 3).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("query_id") == 0L))
    assert(out.forall(_.getAs[Long]("doc_id") != 0L), "self-retrieval")
    // probe 0's two rarest tokens are zebra (df 2) and quartz (df 2);
    // docs 3 and 4 each share one of them and must outrank doc 1/2
    val ranked = out.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Long]("doc_id"))
    assert(ranked.take(2).toSet == Set(3L, 4L),
      s"expected zebra/quartz carriers first, got ${ranked.mkString(",")}")
  }

  test("scores are positive BIGINTs and ranks are dense from 1") {
    val out = Bm25.moreLikeThis(corpus, "doc_id", "text",
      probeFilter = _ < 2, nTerms = 3, k = 5).collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    byQ.foreach { case (_, rows) =>
      val rnks = rows.map(_.getAs[Int]("rnk")).sorted
      assert(rnks.toSeq == (1 to rnks.length).toSeq, "ranks not dense")
    }
    assert(out.forall(_.getAs[Long]("bm25_micro") >= 0L))
  }

  test("longer document with the same tf scores lower (length normalization)") {
    val docs = Seq(
      (0L, "needle"),
      (1L, "needle beta gamma"), // short carrier
      (2L, "needle beta gamma delta epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val out = Bm25.moreLikeThis(docs, "doc_id", "text",
      probeFilter = _ === 0L, nTerms = 1, k = 2).collect()
      .sortBy(_.getAs[Int]("rnk"))
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L),
      "short doc must outrank long doc at equal tf")
    assert(out(0).getAs[Long]("bm25_micro") > out(1).getAs[Long]("bm25_micro"))
  }

  test("pathological repeated-word doc cannot wrap BIGINT (saturation clamps)") {
    // a ~200k-term spam doc: unclamped, 1e6·22·tf·ac wraps Long once
    // tf·ac ≳ 4e11 and the score silently flips sign. The tf clamp at
    // 1e5 sits deep inside BM25's saturation region, so scores stay
    // positive, finite and properly ordered.
    val spamTf = 200000
    // quartz df 2 (probe + spam), zebra df 2 (probe + doc 2) — the
    // probe's two rarest tokens, so the spam doc IS a candidate
    val spam = (3L, ("quartz " * 64) + ("spamword " * spamTf))
    val docs = Seq(
      (0L, "zebra quartz common word word"),
      (1L, "common word filler filler filler"),
      (2L, "zebra common word here")
    ).toDF("doc_id", "text").unionByName(Seq(spam).toDF("doc_id", "text"))
    val out = Bm25.moreLikeThis(docs, "doc_id", "text",
      probeFilter = _ === 0L, nTerms = 2, k = 3).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("bm25_micro") > 0L),
      "a wrapped intermediate would surface as a negative score")
    // the spam doc still retrieves (it carries the rare quartz term)
    // — bounded, not dropped
    assert(out.exists(_.getAs[Long]("doc_id") == 3L))
  }

  test("deterministic across repartitionings") {
    val a = Bm25.moreLikeThis(corpus.repartition(7), "doc_id", "text",
      probeFilter = _ < 3, nTerms = 2, k = 4).collect().toSet
    val b = Bm25.moreLikeThis(corpus.coalesce(1), "doc_id", "text",
      probeFilter = _ < 3, nTerms = 2, k = 4).collect().toSet
    assert(a == b)
  }

  test("hardNegatives pairs the rank-1 positive with the declared rank band") {
    val ranked = Bm25.moreLikeThis(corpus, "doc_id", "text",
        probeFilter = _ < 3, nTerms = 2, k = 4)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rnk")) ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("bm25_micro"))).toMap
    val out = Bm25.hardNegatives(corpus, "doc_id", "text",
      probeFilter = _ < 3, nTerms = 2, negFrom = 2, negTo = 4).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val q = r.getAs[Long]("query_id")
      assert((r.getAs[Long]("pos_id"), r.getAs[Long]("pos_bm25_micro"))
        === ranked((q, 1)), "positive must be the rank-1 retrieval")
      val nr = r.getAs[Int]("neg_rank")
      assert(nr >= 2 && nr <= 4)
      assert((r.getAs[Long]("neg_id"), r.getAs[Long]("neg_bm25_micro"))
        === ranked((q, nr)))
      assert(r.getAs[Long]("pos_bm25_micro") >= r.getAs[Long]("neg_bm25_micro"))
    }
    // a query with NO candidate at the negative band yields no triples
    val none = Bm25.hardNegatives(corpus, "doc_id", "text",
      probeFilter = _ < 3, nTerms = 2, negFrom = 1000, negTo = 1001)
    assert(none.count() === 0L)
  }
}
