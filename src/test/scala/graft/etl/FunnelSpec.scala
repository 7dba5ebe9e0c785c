package graft.etl

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // u1 completes the funnel; u2 clicks BEFORE viewing (click must not
  // count) then never clicks again; u3 views only; u4 has no view at all
  private def events = Seq(
    (1L, "view", ts("2024-01-01 10:00:00")),
    (1L, "click", ts("2024-01-01 10:05:00")),
    (1L, "purchase", ts("2024-01-01 10:10:00")),
    (2L, "click", ts("2024-01-01 09:00:00")),
    (2L, "view", ts("2024-01-01 09:30:00")),
    (2L, "purchase", ts("2024-01-01 09:45:00")),
    (3L, "view", ts("2024-01-01 08:00:00")),
    (4L, "purchase", ts("2024-01-01 08:00:00"))
  ).toDF("user_id", "event_type", "ts")

  private val steps = Seq("view", "click", "purchase")

  test("steps require strict succession; out-of-order events don't count") {
    val t = Funnel.funnelTimes(events, "user_id", "ts", "event_type", steps)
      .orderBy("user_id").collect()
    assert(t.length === 3) // u4 never entered the funnel
    val u1 = t(0)
    assert(!u1.isNullAt(1) && !u1.isNullAt(2) && !u1.isNullAt(3))
    val u2 = t(1)
    // u2's click precedes the first view -> step 2 unreached, step 3 too
    assert(!u2.isNullAt(1) && u2.isNullAt(2) && u2.isNullAt(3))
    val u3 = t(2)
    assert(!u3.isNullAt(1) && u3.isNullAt(2))
  }

  test("funnelCounts is monotone down the funnel") {
    val c = Funnel.funnelCounts(events, "user_id", "ts", "event_type", steps)
      .orderBy("step").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(c.toSeq === Seq(
      "step1_view" -> 3L, "step2_click" -> 1L, "step3_purchase" -> 1L))
  }
}
