package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def log(rows: Seq[(Long, String, Long, Long, String)]) =
    rows.toDF("k", "v", "ts", "seq", "op")

  private val empty = log(Seq.empty)

  private def serve(df: org.apache.spark.sql.DataFrame) =
    Cdc.current(df, "op").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("latest op wins; deletes remove from the serving view; ties break on seq") {
    val snap = Cdc.applyLog(empty, log(Seq(
      (1L, "a", 10L, 0L, "U"), (2L, "b", 10L, 1L, "U"), (3L, "c", 10L, 2L, "U"))),
      "k", "ts", "seq", "op")
    val l = log(Seq(
      (1L, "a2", 20L, 3L, "U"),       // update
      (2L, "zz", 20L, 4L, "D"),       // delete
      (4L, "d", 20L, 5L, "U"),        // brand-new key
      (4L, "d2", 20L, 6L, "U")))      // same ts -> seq breaks the tie
    val out = serve(Cdc.applyLog(snap, l, "k", "ts", "seq", "op"))
    assert(out === Set((1L, "a2", 20L), (3L, "c", 10L), (4L, "d2", 20L)))
  }

  test("a stale delete does not beat a newer state row") {
    val snap = Cdc.applyLog(empty,
      log(Seq((1L, "fresh", 30L, 9L, "U"))), "k", "ts", "seq", "op")
    val out = serve(Cdc.applyLog(snap,
      log(Seq((1L, "x", 20L, 1L, "D"))), "k", "ts", "seq", "op"))
    assert(out === Set((1L, "fresh", 30L)))
  }

  test("a retained tombstone blocks resurrection by an older late update") {
    val snap = Cdc.applyLog(empty,
      log(Seq((1L, "x", 50L, 1L, "D"))), "k", "ts", "seq", "op")
    val out = serve(Cdc.applyLog(snap,
      log(Seq((1L, "late", 40L, 2L, "U"))), "k", "ts", "seq", "op"))
    assert(out === Set.empty)
  }

  test("application composes: apply(apply(s,a),b) == apply(s, a++b) on random logs") {
    val rnd = new scala.util.Random(13)
    val ops = Seq.tabulate(300)(i => (
      rnd.nextInt(12).toLong,
      "v" + rnd.nextInt(100),
      rnd.nextInt(50).toLong,
      i.toLong, // unique tiebreaker: the log sequence id
      if (rnd.nextInt(5) == 0) "D" else "U"))
    for (cut <- Seq(0, 100, 299, 300)) {
      val (a, b) = ops.splitAt(cut)
      val staged = Cdc.applyLog(
        Cdc.applyLog(empty, log(a), "k", "ts", "seq", "op"),
        log(b), "k", "ts", "seq", "op")
      val direct = Cdc.applyLog(empty, log(ops), "k", "ts", "seq", "op")
      assert(serve(staged) === serve(direct), s"cut=$cut")
    }
  }

  test("compact drops only tombstones older than the horizon") {
    val state = Cdc.applyLog(empty, log(Seq(
      (1L, "live", 10L, 0L, "U"),
      (2L, "gone", 10L, 1L, "D"),
      (3L, "gone", 90L, 2L, "D"))), "k", "ts", "seq", "op")
    val kept = Cdc.compact(state, "ts", "op", lit(50L))
      .select("k").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L)) // old live row stays, old tombstone goes
  }

  test("payload column names containing dots survive the merge") {
    val l = log(Seq((1L, "a", 10L, 0L, "U")))
      .withColumnRenamed("v", "payload.amount")
    val out = Cdc.applyLog(l.where(lit(false)), l, "k", "ts", "seq", "op")
    assert(out.columns.contains("payload.amount"))
    assert(out.select(col("`payload.amount`")).head().getString(0) === "a")
  }

  test("apply is one map-side-combinable aggregation, not a window") {
    val snap = Cdc.applyLog(empty,
      log(Seq((1L, "a", 10L, 0L, "U"))), "k", "ts", "seq", "op")
    val plan = Cdc.applyLog(snap,
        log(Seq((1L, "b", 20L, 1L, "U"))), "k", "ts", "seq", "op")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("max_by"), plan)
  }
}
