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

  test("cardinalityProfile: sketch stays inside its 3*rsd envelope") {
    // 3 groups with known cardinalities 1000 / 500 / 1 (dup-heavy)
    val rows = (1 to 2000).map(i => ("g1", s"v$i".take(64) + (i % 1000))) ++
      (1 to 1000).map(i => ("g2", "w" + (i % 500))) ++
      (1 to 100).map(_ => ("g3", "const"))
    val df = rows.toDF("grp", "value")
    val got = Profiler.cardinalityProfile(df, "grp", "value", rsd = 0.05)
      .orderBy("grp").collect()
    assert(got.length === 3)
    for (r <- got) {
      assert(r.getAs[Boolean]("approx_ok"),
        s"sketch out of bounds: $r")
    }
    val exact = got.map(r => r.getAs[String]("grp") ->
      r.getAs[Long]("exact_distinct")).toMap
    assert(exact("g2") === 500L)
    assert(exact("g3") === 1L)
    assert(got.map(r => r.getAs[String]("grp") ->
      r.getAs[Long]("n_rows")).toMap === Map("g1" -> 2000L, "g2" -> 1000L, "g3" -> 100L))
  }

  test("cardinalityProfile: an all-NULL group agrees at zero (no NaN flag)") {
    val df = Seq(("g1", Some("v")), ("g2", None), ("g2", None))
      .toDF("grp", "value")
    val got = Profiler.cardinalityProfile(df, "grp", "value")
      .orderBy("grp").collect()
    val g2 = got(1)
    assert(g2.getAs[Long]("exact_distinct") === 0L)
    assert(g2.getAs[Double]("rel_err") === 0.0)
    assert(g2.getAs[Boolean]("approx_ok"))
  }

  test("cardinalityProfile: exact=0 with approx>0 fails the audit, not NULL") {
    // unreachable through the public aggregate path (both sides ignore
    // NULLs) — the shared audit expression is exercised directly to pin
    // the fail-don't-abstain contract of the audit columns
    import org.apache.spark.sql.functions._
    val shaped = Seq(("g", 3L, 0L))
      .toDF("grp", "approx_distinct", "exact_distinct")
      .withColumn("rel_err",
        Profiler.relErr(col("exact_distinct"), col("approx_distinct")))
      .withColumn("approx_ok", col("rel_err") <= 3 * 0.05)
      .head()
    assert(shaped.getAs[Double]("rel_err").isPosInfinity)
    assert(!shaped.getAs[Boolean]("approx_ok"))
  }

  test("cardinalityProfile withExact=false plans no exact-distinct aggregate") {
    val df = Seq(("g", "v")).toDF("grp", "value")
    val sketchOnly = Profiler.cardinalityProfile(df, "grp", "value",
      withExact = false)
    assert(sketchOnly.columns.toSeq ===
      Seq("grp", "n_rows", "approx_distinct", "exact_distinct", "rel_err", "approx_ok"))
    // sketch-only tier is ONE aggregate: no exact-distinct branch joined in
    val plan = sketchOnly.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), plan)
    // exact tier: one extra aggregate, same schema
    val audit = Profiler.cardinalityProfile(df, "grp", "value")
    assert(audit.columns.toSeq === sketchOnly.columns.toSeq)
  }
}
