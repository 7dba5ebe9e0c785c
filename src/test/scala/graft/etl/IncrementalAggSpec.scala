package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val measures = Seq("amt" -> col("v").cast("decimal(12,2)"))

  test("merge(rollup(hist), delta) == rollup(all) on random splits") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(500)(
      (s"k${rnd.nextInt(7)}", rnd.nextInt(3), rnd.nextInt(1000) / 10.0))
    val all = rows.toDF("k1", "k2", "v")
    val full = IncrementalAgg.rollup(all, Seq("k1", "k2"), measures)
      .orderBy("k1", "k2").collect().map(_.toSeq)
    for (cut <- Seq(0.0, 0.3, 0.95, 1.0)) {
      val n = (rows.size * cut).toInt
      val hist = rows.take(n).toDF("k1", "k2", "v")
      val delta = rows.drop(n).toDF("k1", "k2", "v")
      val snap = IncrementalAgg.rollup(hist, Seq("k1", "k2"), measures)
      val merged = IncrementalAgg.mergeRollup(snap, delta, Seq("k1", "k2"), measures)
        .orderBy("k1", "k2").collect().map(_.toSeq)
      assert(merged === full, s"cut=$cut")
    }
  }

  test("delta-only keys appear; untouched keys keep snapshot values") {
    val hist = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("k", "v")
    val delta = Seq(("b", 1.0), ("c", 9.0)).toDF("k", "v")
    val m = Seq("amt" -> col("v").cast("decimal(12,2)"))
    val out = IncrementalAgg.mergeRollup(
        IncrementalAgg.rollup(hist, Seq("k"), m), delta, Seq("k"), m)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2).doubleValue()))).toMap
    assert(out === Map(
      "a" -> ((2L, 3.0)),   // untouched by delta
      "b" -> ((2L, 6.0)),   // merged
      "c" -> ((1L, 9.0))))  // delta-only
  }

  test("mergeRollup never rescans the history fact") {
    val hist = Seq(("a", 1.0)).toDF("k", "v")
    val snap = IncrementalAgg.rollup(hist, Seq("k"), measures.map {
      case (n, _) => n -> col("v").cast("decimal(12,2)") })
      .localCheckpoint(true) // stand-in for a persisted snapshot table
    val delta = Seq(("a", 2.0)).toDF("k", "v")
    val plan = IncrementalAgg.mergeRollup(snap, delta,
        Seq("k"), measures).queryExecution.optimizedPlan.toString
    // the merged plan reads the SNAPSHOT scan (an RDD after the
    // checkpoint) + the delta relation; the raw history must appear
    // nowhere — exactly one LocalRelation (the delta) in the plan
    assert(plan.split("LocalRelation").length - 1 === 1, plan)
  }
}
