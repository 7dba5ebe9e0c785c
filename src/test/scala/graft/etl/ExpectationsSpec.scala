package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(5.0), "A"),
    (Some(-1.0), "A"),
    (None, "B"),          // NULL amount: violates positive AND not_null
    (Some(2.0), "X")      // bad flag
  ).toDF("amount", "flag")

  private val constraints = Seq(
    "amount_positive" -> (col("amount") > 0),
    "amount_not_null" -> col("amount").isNotNull,
    "flag_domain"     -> col("flag").isin("A", "B"))

  test("check counts violations per constraint; NULL predicate violates") {
    val got = Expectations.check(df, constraints)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got === Map(
      "amount_positive" -> ((2L, 4L, false)),  // -1 and NULL
      "amount_not_null" -> ((1L, 4L, false)),
      "flag_domain"     -> ((1L, 4L, false))))
  }

  test("check is one scan: the input relation appears once in the plan") {
    val plan = Expectations.check(df, constraints)
      .queryExecution.optimizedPlan.toString
    assert(plan.split("LocalRelation").length - 1 === 1, plan)
  }

  test("empty input reports zero violations and pass=true, not NULLs") {
    val got = Expectations.check(df.where(lit(false)), constraints)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq === Seq.fill(3)((0L, 0L, true)))
  }

  test("colliding and duplicate constraint names are rejected") {
    intercept[IllegalArgumentException] {
      Expectations.check(df, Seq("_n" -> col("amount").isNotNull))
    }
    intercept[IllegalArgumentException] {
      Expectations.check(df, Seq(
        "a" -> col("amount").isNotNull, "a" -> (col("amount") > 0)))
    }
  }

  test("enforce passes clean data through and throws on violations") {
    val clean = Seq((1.0, "A")).toDF("amount", "flag")
    assert(Expectations.enforce(clean, constraints).count() === 1L)
    val e = intercept[IllegalStateException] {
      Expectations.enforce(df, constraints)
    }
    assert(e.getMessage.contains("amount_positive: 2 violations"))
  }
}
