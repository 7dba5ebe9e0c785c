package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics: greatest right ts ≤ (or < when strict) left
  * ts per key, payload fields atomic from one matched row, one
  * key-shuffle plan. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, "u", 10L), (2L, "u", 20L), (3L, "u", 25L), (4L, "u", 5L),
    (5L, "v", 100L), (6L, "w", 7L)
  ).toDF("event_id", "k", "t")

  private val right = Seq(
    ("u", 10L, 1.0, "a"), ("u", 21L, 2.0, "b"),
    ("v", 90L, 3.0, "c"), ("x", 1L, 9.0, "z")
  ).toDF("k", "qt", "qv", "qs")

  test("non-strict: equal timestamp matches; earlier rows get NULL") {
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "t", "qt",
        Seq("qv", "qs"))
      .orderBy("event_id")
      .select("event_id", "asof_ts", "qv", "qs")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))
    assert(out.toSeq === Seq(
      (1L, Some(10L), Some(1.0), Some("a")), // ties match (>= semantics)
      (2L, Some(10L), Some(1.0), Some("a")),
      (3L, Some(21L), Some(2.0), Some("b")),
      (4L, None, None, None),                // nothing precedes t=5
      (5L, Some(90L), Some(3.0), Some("c")),
      (6L, None, None, None)))               // key w has no right rows
  }

  test("strict: equal timestamp does NOT match") {
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "t", "qt",
        Seq("qv"), strict = true)
      .where($"event_id" === 1).select("asof_ts").collect()
    assert(out.head.isNullAt(0))
  }

  test("a NULL right timestamp never matches (no payload leak)") {
    val r2 = Seq((java.lang.Long.valueOf(1L), "u", null.asInstanceOf[java.lang.Long], 9.0))
      .toDF("rid", "k", "qt", "qv").drop("rid")
    val out = AsofJoin.asofJoin(left, r2, Seq("k"), "t", "qt", Seq("qv"))
      .where($"event_id" === 1).select("asof_ts", "qv").collect().head
    assert(out.isNullAt(0) && out.isNullAt(1),
      "null-ts right row leaked its payload onto an unmatched left row")
  }

  test("payload name colliding with a left column is rejected") {
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(left, right.withColumnRenamed("qv", "t"),
        Seq("k"), "t", "qt", Seq("t"))
    }
  }

  test("left row count and columns are preserved exactly") {
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "t", "qt", Seq("qv"))
    assert(out.count() === left.count())
    assert(out.columns.toSeq === Seq("event_id", "k", "t", "asof_ts", "qv"))
  }

  test("payload fields stay atomic when a payload value is NULL") {
    // right row at t=21 has qs = NULL; a per-column carry would pull qs
    // from t=10 while qv comes from t=21 — the struct carry must not
    val r2 = Seq(("u", 10L, 1.0, "a"), ("u", 21L, 2.0, null.asInstanceOf[String]))
      .toDF("k", "qt", "qv", "qs")
    val row = AsofJoin.asofJoin(left, r2, Seq("k"), "t", "qt", Seq("qv", "qs"))
      .where($"event_id" === 3).select("qv", "qs").collect().head
    assert(row.getDouble(0) === 2.0)
    assert(row.isNullAt(1), "qs must be NULL (from the t=21 row), not 'a'")
  }

  test("plans one shuffle on the key, no join node") {
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "t", "qt", Seq("qv"))
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected exactly one key shuffle:\n$plan")
  }
}
