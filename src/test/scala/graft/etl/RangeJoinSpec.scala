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

  test("plans a shuffled equi-join on the bucket, not a nested loop") {
    val out = RangeJoin.intervalPointJoin(intervals, points, "s", "e", "p", 10L)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"keyless range join fell back to a nested loop:\n$plan")
    assert(plan.contains("_rj_bkt"), plan)
  }
}
