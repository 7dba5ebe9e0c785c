package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollingActivesSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic activity: users with overlapping active spans so
    * windows genuinely merge distinct sets (not just sum counts). */
  private def activity(nUsers: Int, nDays: Int, seed: Int): Seq[(Long, Long)] = {
    val rng = new scala.util.Random(seed)
    (1 to nUsers).flatMap { u =>
      val start = rng.nextInt(nDays)
      val len = 1 + rng.nextInt(40)
      (start until math.min(start + len, nDays)).flatMap { d =>
        // duplicate events on ~30% of active days — dedup must absorb
        if (rng.nextDouble() < 0.3) Seq((u.toLong, d.toLong), (u.toLong, d.toLong))
        else Seq((u.toLong, d.toLong))
      }
    }
  }

  private def truth(pairs: Seq[(Long, Long)], window: Int): Map[Long, Long] = {
    val byDay = pairs.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    byDay.keySet.map { rd =>
      rd -> (rd - window + 1 to rd).flatMap(d => byDay.getOrElse(d, Set.empty))
        .toSet.size.toLong
    }.toMap
  }

  test("exact tier matches brute-force truth across window lengths") {
    val pairs = activity(nUsers = 300, nDays = 60, seed = 19)
    val df = pairs.toDF("user_id", "day")
    for (w <- Seq(1, 7, 30)) {
      val got = RollingActives.exact(df, "user_id", "day", w)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === truth(pairs, w), s"window=$w")
    }
  }

  test("auto tier: short windows exact, long windows sketch, same schema") {
    val pairs = activity(nUsers = 120, nDays = 40, seed = 23)
    val df = pairs.toDF("user_id", "day")
    val short = RollingActives.rolling(df, "user_id", "day", window = 7)
    val long = RollingActives.rolling(df, "user_id", "day", window = 30,
      maxExactWindow = 14)
    assert(short.columns.toSeq === Seq("report_day", "active"))
    assert(long.columns.toSeq === Seq("report_day", "active"))
    // the short path is exact
    val got = short.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === truth(pairs, 7))
    // the long path fans out per-DAY sketches, not per-pair rows: the
    // plan's explode rides an input with one row per day
    val plan = long.queryExecution.optimizedPlan.toString
    assert(plan.toLowerCase.contains("explode"), plan)
  }

  test("q58's in-query audit flag holds on real event data") {
    val df = graft.SparkEntry.queries("q58_rolling_actives_90d")(
      spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq ===
      Seq("report_day", "active_90d", "exact_90d", "within_3rsd"))
    val bad = rows.filterNot(_.getAs[Boolean]("within_3rsd"))
    assert(bad.isEmpty, bad.take(3).mkString(","))
  }

  test("sketch tier tracks exact within 3·rsd at a 90-day window") {
    val pairs = activity(nUsers = 4000, nDays = 120, seed = 29)
    val df = pairs.toDF("user_id", "day").repartition(7)
    val lgK = 12
    val rsd = 1.04 / math.sqrt(math.pow(2, lgK))
    val exact = RollingActives.exact(df, "user_id", "day", 90)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = RollingActives.sketch(df, "user_id", "day", 90, lgK)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (rd, ex) =>
      val e = est(rd)
      assert(math.abs(e - ex) <= math.max(3 * rsd * ex, 3.0),
        s"day $rd: sketch $e vs exact $ex exceeds 3·rsd ($rsd)")
    }
  }
}
