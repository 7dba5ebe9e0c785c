package graft.curate

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FilterAblationSpec extends SparkSpec {
  import spark.implicits._

  // rows: (a_fails, b_fails, c_fails)
  private val rows = Seq(
    (true, false, false),  // a only
    (true, false, false),  // a only
    (true, true, false),   // a + b
    (false, true, true),   // b + c
    (false, false, true),  // c only
    (false, false, false), // clean
    (true, true, true)     // all
  ).toDF("a", "b", "c")

  private val rules = Seq(
    "a" -> col("a"), "b" -> col("b"), "c" -> col("c"))

  test("flagged / attributed / solo counts are exact") {
    val out = FilterAblation.ablate(rows, rules)
      .orderBy("rule").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      // a: flagged 4, first-fail 4 (a is first), solo 2
      ("a", 4L, 4L, 2L),
      // b: flagged 3, first-fail 1 (row b+c), solo 0
      ("b", 3L, 1L, 0L),
      // c: flagged 3, first-fail 1 (row c only), solo 1
      ("c", 3L, 1L, 1L)))
  }

  test("attribution totals reconcile with a first-fail decision column") {
    val decided = rows.withColumn("decision",
      when(col("a"), "a").when(col("b"), "b").when(col("c"), "c")
        .otherwise("keep"))
    val byDecision = decided.groupBy("decision").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val attr = FilterAblation.ablate(rows, rules).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    rules.foreach { case (n, _) =>
      assert(attr(n) === byDecision.getOrElse(n, 0L), s"rule $n")
    }
    // every drop is attributed exactly once
    assert(attr.values.sum ===
      rows.where(col("a") || col("b") || col("c")).count())
  }

  test("result is partitioning-independent and single-rule degenerates sanely") {
    val one = FilterAblation.ablate(rows.repartition(5), rules)
      .orderBy("rule").collect().toSeq
    val two = FilterAblation.ablate(rows.coalesce(1), rules)
      .orderBy("rule").collect().toSeq
    assert(one === two)
    val solo = FilterAblation.ablate(rows, Seq("a" -> col("a")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(solo.toSeq === Seq(("a", 4L, 4L, 4L)))
  }

  test("duplicate rule names are rejected") {
    intercept[IllegalArgumentException] {
      FilterAblation.ablate(rows, Seq("a" -> col("a"), "a" -> col("b")))
    }
  }
}
