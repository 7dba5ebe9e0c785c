package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  // path graph 1–2–3 plus isolated node 4
  private def nodes = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
  private def edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")

  test("two hand-computed rounds on a path graph, damping 0.85") {
    // r0 = 1e6 each. Round 1 contribs: 1->2: 1e6, 2->{1,3}: 5e5, 3->2: 1e6
    //   r1 = (575000, 1850000, 575000, 150000)
    // Round 2 contribs: 1->2: 575000, 2->{1,3}: 925000, 3->2: 575000
    //   r2 = (936250, 1127500, 936250, 150000)
    val out = PageRank.pageRank(nodes, "doc_id", edges,
        iters = 2, dampPpm = 850000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((1L, 936250L)))
    assert(out(2L) === ((2L, 1127500L)))
    assert(out(3L) === ((1L, 936250L)))
    assert(out(4L) === ((0L, 150000L)))
  }

  test("one round from the uniform start") {
    val out = PageRank.pageRank(nodes, "doc_id", edges,
        iters = 1, dampPpm = 850000L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 575000L, 2L -> 1850000L, 3L -> 575000L,
      4L -> 150000L))
  }

  test("deterministic under repartitioning and edge order") {
    val n = (1L to 120L).toDF("doc_id")
    // ring + a few chords
    val e = ((1L to 119L).map(i => (i, i + 1)) ++
        Seq((120L, 1L), (5L, 60L), (10L, 90L), (30L, 100L)))
      .toDF("id_a", "id_b")
    val a = PageRank.pageRank(n, "doc_id", e, 2, 850000L)
      .orderBy("doc_id").collect().toSeq
    val b = PageRank.pageRank(n.repartition(7), "doc_id",
        e.repartition(5).orderBy(desc("id_b")), 2, 850000L)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
    // total mass stays near n*1e6 (flooring only loses mass)
    val total = a.map(_.getLong(2)).sum
    assert(total <= 120L * 1000000L && total > 120L * 900000L, total)
  }

  test("parameters are validated") {
    intercept[IllegalArgumentException] {
      PageRank.pageRank(nodes, "doc_id", edges, 0, 850000L)
    }
    intercept[IllegalArgumentException] {
      PageRank.pageRank(nodes, "doc_id", edges, 1, 1000001L)
    }
  }
}
