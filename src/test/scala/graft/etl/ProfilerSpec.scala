package graft.etl

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("numericProfile computes per-column stats in one pass") {
    val df = Seq(
      (Some(1.0), Some(10.0)),
      (Some(2.5), None),
      (Some(1.0), Some(30.0)),
      (None, Some(10.0))
    ).toDF("a", "b")
    val got = Profiler.numericProfile(df, Seq("a", "b"))
      .orderBy("col_name").collect()
    assert(got.length === 2)
    val a = got(0)
    assert(a.getString(0) === "a")
    assert(a.getLong(1) === 4L)        // n_rows
    assert(a.getLong(2) === 1L)        // n_nulls
    assert(a.getLong(3) === 2L)        // n_distinct (1.0, 2.5)
    assert(a.getDouble(4) === 1.0)     // min
    assert(a.getDouble(5) === 2.5)     // max
    assert(a.getDecimal(6).doubleValue() === 4.5) // exact sum
    val b = got(1)
    assert(b.getString(0) === "b")
    assert((b.getLong(2), b.getLong(3)) === ((1L, 2L)))
    assert(b.getDecimal(6).doubleValue() === 50.0)
  }

  test("profile is a single aggregation over a single scan") {
    val df = Seq((1.0, 2.0)).toDF("a", "b")
    val plan = Profiler.numericProfile(df, Seq("a", "b"))
      .queryExecution.optimizedPlan.toString
    // one scan of the input: the local relation appears exactly once
    assert(plan.split("LocalRelation").length - 1 === 1, plan)
  }
}
