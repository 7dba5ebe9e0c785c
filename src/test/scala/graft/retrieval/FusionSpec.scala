package graft.retrieval

import graft.SparkSpec

class FusionSpec extends SparkSpec {
  import spark.implicits._

  private def list(rows: (Long, Long, Int)*) =
    rows.toDF("query_id", "cand_id", "rnk")

  test("candidate in both lists outranks a better single-list candidate") {
    // cand 10: rank 3 in A and rank 3 in B -> 2 * (1e6 div 63) = 31746
    // cand 20: rank 1 in A only           -> 1e6 div 61        = 16393
    val a = list((1L, 10L, 3), (1L, 20L, 1))
    val b = list((1L, 10L, 3), (1L, 30L, 1))
    val out = Fusion.rrf(Seq(a, b), c = 60, k = 10).collect()
      .sortBy(_.getAs[Int]("rnk"))
    assert(out.head.getAs[Long]("cand_id") == 10L)
    assert(out.head.getAs[Long]("rrf_micro") == 2 * (1000000 / 63))
    assert(out.head.getAs[Long]("n_rankers") == 2L)
    val single = out.find(_.getAs[Long]("cand_id") == 20L).get
    assert(single.getAs[Long]("rrf_micro") == 1000000 / 61)
    assert(single.getAs[Long]("n_rankers") == 1L)
  }

  test("score ties break to the lower candidate id") {
    val a = list((1L, 50L, 2), (1L, 40L, 2))
    // both get 1e6 div 62 from ONE list each at the same rank -> tie
    val b = list((1L, 40L, 2), (1L, 50L, 2))
    // after union both candidates have identical contributions
    val out = Fusion.rrf(Seq(a, b), c = 60, k = 2).collect()
      .sortBy(_.getAs[Int]("rnk"))
    assert(out.map(_.getAs[Long]("cand_id")).toSeq == Seq(40L, 50L))
  }

  test("k truncates and queries stay independent") {
    val a = list((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3), (2L, 9L, 1))
    val out = Fusion.rrf(Seq(a), c = 60, k = 2).collect()
    assert(out.count(_.getAs[Long]("query_id") == 1L) == 2)
    assert(out.count(_.getAs[Long]("query_id") == 2L) == 1)
  }
}
