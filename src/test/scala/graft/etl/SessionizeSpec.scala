package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  // user 1: two sessions split by a 45-min gap; user 2: one session
  private def events = Seq(
    (1L, 1L, ts("2024-01-01 10:00:00"), 1.0),
    (2L, 1L, ts("2024-01-01 10:10:00"), 2.0),
    (3L, 1L, ts("2024-01-01 10:55:00"), 4.0),
    (4L, 1L, ts("2024-01-01 11:05:00"), 8.0),
    (5L, 2L, ts("2024-01-01 09:00:00"), 1.5)
  ).toDF("event_id", "user_id", "ts", "value")

  private val gap30m = 30L * 60 * 1000000

  test("session boundaries open on gaps strictly over the threshold") {
    val seq = Sessionize.withSessionSeq(events, "user_id", "ts", gap30m,
        "event_id")
      .select("event_id", "session_seq")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seq === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("a gap of exactly the threshold does NOT split") {
    val e = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, 1L, ts("2024-01-01 10:30:00"), 1.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val seq = Sessionize.withSessionSeq(e, "user_id", "ts", gap30m, "event_id")
      .select("session_seq").collect().map(_.getLong(0))
    assert(seq.toSet === Set(1L))
  }

  test("sessionStats aggregates count/duration/value per session") {
    val stats = Sessionize.sessionStats(events, "user_id", "ts", gap30m,
        "event_id", "value")
      .orderBy("user_id", "session_seq")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(stats.toSeq === Seq(
      (1L, 1L, 2L, 600L, 3.0),
      (1L, 2L, 2L, 600L, 12.0),
      (2L, 1L, 1L, 0L, 1.5)))
  }

  test("sessionStats matches a naive per-user reference on random streams") {
    for (seed <- Seq(5, 23)) {
      val rng = new scala.util.Random(seed)
      val evs = (1L to 200L).map { id =>
        val user = rng.nextInt(6).toLong
        val at = new java.sql.Timestamp(
          ts("2024-01-01 00:00:00").getTime + rng.nextInt(6 * 3600) * 1000L)
        (id, user, at, (rng.nextInt(100) + 1).toDouble)
      }
      val gap = 20L * 60 * 1000000 // 20 min
      // driver-side reference: sort per user by (ts, id), split on gap
      val want = evs.groupBy(_._2).toSeq.flatMap { case (user, rows) =>
        val sorted = rows.sortBy(r => (r._3.getTime, r._1))
        val sessions = sorted.foldLeft(Vector.empty[Vector[(Long, java.sql.Timestamp, Double)]]) {
          case (acc, (id, _, at, v)) =>
            if (acc.nonEmpty &&
                (at.getTime - acc.last.last._2.getTime) * 1000 <= gap)
              acc.init :+ (acc.last :+ ((id, at, v)))
            else acc :+ Vector((id, at, v))
        }
        sessions.zipWithIndex.map { case (s, i) =>
          (user, (i + 1).toLong, s.length.toLong,
            (s.map(_._2.getTime).max - s.map(_._2.getTime).min) / 1000,
            s.map(_._3).sum)
        }
      }.toSet
      val got = Sessionize.sessionStats(
          evs.toDF("event_id", "user_id", "ts", "value"),
          "user_id", "ts", gap, "event_id", "value")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))
        .toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("timestamp ties break deterministically on the tie-break column") {
    val e = Seq(
      (9L, 1L, ts("2024-01-01 10:00:00"), 1.0),
      (3L, 1L, ts("2024-01-01 10:00:00"), 2.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val seq = Sessionize.withSessionSeq(e, "user_id", "ts", gap30m, "event_id")
      .select("event_id", "session_seq")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seq === Map(3L -> 1L, 9L -> 1L))
  }
}
