package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binned interval⋈point join: exact half-open semantics, each pair
  * emitted once, no nested-loop join in the plan. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val intervals = Seq(
    (1L, 10L, 30L),   // spans buckets 1..2 at width 10
    (2L, 25L, 26L),   // single-tick interval
    (3L, 40L, 40L),   // empty interval -> matches nothing
    (4L, 0L, 100L)    // covers everything
  ).toDF("iv_id", "s", "e")

  private val points = Seq(
    (100L, 10L), (101L, 29L), (102L, 30L), (103L, 25L), (104L, 99L)
  ).toDF("pt_id", "p")

  test("half-open [start, end): boundary semantics are exact") {
    val got = RangeJoin.intervalPointJoin(intervals, points, "s", "e", "p", 10L)
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 100L), (1L, 101L), (1L, 103L),  // 10<=p<30; p=30 excluded
      (2L, 103L),                          // 25<=25<26
      (4L, 100L), (4L, 101L), (4L, 102L), (4L, 103L), (4L, 104L)))
  }

  test("each qualifying pair appears exactly once (no bucket dedup needed)") {
    val out = RangeJoin.intervalPointJoin(intervals, points, "s", "e", "p", 7L)
      .select("iv_id", "pt_id").as[(Long, Long)].collect()
    assert(out.length === out.distinct.length)
    // bucket width must not change the answer
    val w10 = RangeJoin.intervalPointJoin(intervals, points, "s", "e", "p", 10L)
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    assert(out.toSet === w10)
  }

  test("bucket ids are exact long floors beyond double precision (2^53)") {
    // 1.7e18 ns-epoch scale: double ulp is 256, so a Double floor(a/w)
    // drifts off the true floor — the long path must not
    val base = 1700000000000000000L
    val iv = Seq((1L, base - 500L, base)).toDF("iv_id", "s", "e")
    val pts = Seq((10L, base - 1L), (11L, base)).toDF("pt_id", "p")
    val got = RangeJoin.intervalPointJoin(iv, pts, "s", "e", "p", 1000L)
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L)))  // base-1 in [base-500, base); base is not
  }

  test("plans a shuffled equi-join on the bucket, not a nested loop") {
    val out = RangeJoin.intervalPointJoin(intervals, points, "s", "e", "p", 10L)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"keyless range join fell back to a nested loop:\n$plan")
    assert(plan.contains("_rj_bkt"), plan)
  }
}
