package graft.curate

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProportionalSampleSpec extends SparkSpec {
  import spark.implicits._

  // groups of size 60 / 30 / 10
  private def rows = ((1L to 60L).map((_, "a")) ++
      (61L to 90L).map((_, "b")) ++ (91L to 100L).map((_, "c")))
    .toDF("id", "grp")

  test("quotas split the budget in proportion to group size") {
    val out = Curation.proportionalSample(rows, "id", "grp", totalK = 10)
    val perGroup = out.groupBy("grp").agg(count(lit(1)).as("n"),
        max("n_quota").as("q"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(perGroup("a") === ((6L, 6L)))
    assert(perGroup("b") === ((3L, 3L)))
    assert(perGroup("c") === ((1L, 1L)))
  }

  test("every non-empty group keeps at least one row (floor quota)") {
    val skewed = ((1L to 99L).map((_, "big")) ++ Seq((100L, "tiny")))
      .toDF("id", "grp")
    val out = Curation.proportionalSample(skewed, "id", "grp", totalK = 10)
      .groupBy("grp").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("big") === 9L)   // (10*99) div 100
    assert(out("tiny") === 1L)  // floor would be 0 -> min 1
  }

  test("selection is the md5-bottom-quota of each group, repartition-stable") {
    val a = Curation.proportionalSample(rows, "id", "grp", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Curation.proportionalSample(rows.repartition(9), "id", "grp", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    // group "a"'s 6 picks are exactly sampleFixedK(k=6) of that group
    val fixedA = Curation.sampleFixedK(rows.where(col("grp") === "a"),
        "id", "grp", k = 6)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(fixedA.subsetOf(a))
    assert((a -- fixedA).forall(_ > 60L))
  }

  test("sample_rank never exceeds the group quota; totalK validated") {
    val out = Curation.proportionalSample(rows, "id", "grp", 10)
      .where(col("sample_rank") > col("n_quota")).count()
    assert(out === 0L)
    intercept[IllegalArgumentException] {
      Curation.proportionalSample(rows, "id", "grp", 0)
    }
  }
}
