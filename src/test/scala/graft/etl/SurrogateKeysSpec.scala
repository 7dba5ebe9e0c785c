package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The IDENTITY contract ported to a cluster: dense deterministic ids
  * at build, preserved verbatim across extension loads, FK resolution
  * with a −1 unknown member. */
class SurrogateKeysSpec extends SparkSpec {

  import spark.implicits._

  test("assign is a dense 1..n sequence in canonical order") {
    val dim = Seq(("c", 30), ("a", 10), ("b", 20)).toDF("k", "v")
    val keyed = SurrogateKeys.assign(dim, "sk", Seq("k"))
      .orderBy("sk").select("sk", "k").as[(Long, String)].collect()
    assert(keyed.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("assign is deterministic across input partitionings and reruns") {
    val rows = (0 until 500).map(i => (s"key_${i % 250}_$i", i))
    val a = SurrogateKeys.assign(rows.toDF("k", "v").repartition(7), "sk", Seq("k"))
      .select("k", "sk").as[(String, Long)].collect().toMap
    val b = SurrogateKeys.assign(rows.toDF("k", "v").coalesce(1), "sk", Seq("k"))
      .select("k", "sk").as[(String, Long)].collect().toMap
    assert(a === b)
    val expected = rows.map(_._1).sorted.zipWithIndex
      .map { case (k, i) => k -> (i + 1L) }.toMap
    assert(a === expected)
  }

  test("extend preserves existing ids and continues densely from max") {
    val first = SurrogateKeys.assign(
      Seq(("a", 1), ("c", 3)).toDF("k", "v"), "sk", Seq("k"))
    val extended = SurrogateKeys.extend(
      first,
      // 'c' is a replay of an existing natural key -> dropped
      Seq(("b", 2), ("d", 4), ("c", 99)).toDF("k", "v"),
      "sk", Seq("k"), Seq("k"))
    val byKey = extended.select("k", "sk", "v").as[(String, Long, Int)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byKey("a") === ((1L, 1)))  // untouched
    assert(byKey("c") === ((2L, 3)))  // untouched, replay dropped
    assert(byKey("b") === ((3L, 2)))  // new, dense from max+1 in order
    assert(byKey("d") === ((4L, 4)))
    assert(extended.count() === 4)
  }

  test("extend collapses in-batch replays of one natural key to one id") {
    val first = SurrogateKeys.assign(Seq(("a", 1)).toDF("k", "v"), "sk", Seq("k"))
    // "b" arrives twice in ONE batch (replayed micro-batch): must yield
    // ONE dim row with ONE surrogate id, deterministically the min rep
    val out = SurrogateKeys.extend(
      first, Seq(("b", 7), ("b", 2)).toDF("k", "v"), "sk", Seq("k"), Seq("k"))
    assert(out.count() === 2)
    val b = out.where(col("k") === "b").select("sk", "v")
      .as[(Long, Int)].collect()
    assert(b.toSeq === Seq((2L, 2)))
  }

  test("extend from an empty existing dim starts at 1") {
    val empty = SurrogateKeys.assign(
      Seq.empty[(String, Int)].toDF("k", "v"), "sk", Seq("k"))
    val out = SurrogateKeys.extend(
      empty, Seq(("b", 2), ("a", 1)).toDF("k", "v"), "sk", Seq("k"), Seq("k"))
    assert(out.orderBy("sk").select("sk", "k").as[(Long, String)].collect()
      .toSeq === Seq((1L, "a"), (2L, "b")))
  }

  test("resolveFk maps natural keys and sends misses to the unknown member") {
    val dim = SurrogateKeys.assign(
      Seq(("a", "A"), ("b", "B")).toDF("k", "attr"), "sk", Seq("k"))
    val fact = Seq(("a", 10), ("zzz", 20), ("b", 30)).toDF("k", "m")
    val out = SurrogateKeys.resolveFk(fact, dim, Seq("k"), "sk", "sk")
      .select("k", "sk", "m").as[(String, Long, Int)].collect()
      .map(t => t._1 -> t._2).toMap
    assert(out === Map("a" -> 1L, "b" -> 2L, "zzz" -> -1L))
  }

  test("resolveFk keeps distinct fk name when asked") {
    val dim = SurrogateKeys.assign(Seq(("a", 1)).toDF("k", "v"), "sk", Seq("k"))
    val out = SurrogateKeys.resolveFk(
      Seq(("a", 5)).toDF("k", "m"), dim, Seq("k"), "sk", "dim_fk")
    assert(out.columns.toSeq === Seq("k", "m", "dim_fk"))
    assert(out.select("dim_fk").as[Long].head() === 1L)
  }

  test("assign never loses or duplicates rows on a many-partition dim") {
    // regression: the offsets aggregate and the numbering join consume
    // the same subplan; before the single-materialization fix, AQE
    // could coalesce the two evaluations into different pid layouts and
    // the inner join silently dropped rows (seen at sf0.1)
    val n = 50000
    val dim = (0 until n).map(i => (f"k$i%06d", i)).toDF("k", "v")
      .repartition(32)
    val keyed = SurrogateKeys.assign(dim, "sk", Seq("k"))
    val stats = keyed.agg(
      count(lit(1)), countDistinct(col("sk")), min(col("sk")), max(col("sk")))
      .as[(Long, Long, Long, Long)].head()
    assert(stats === ((n.toLong, n.toLong, 1L, n.toLong)),
      s"ids must be a dense permutation of 1..$n, got $stats")
  }

  test("assign plans one range exchange, no single-partition global window") {
    val dim = (0 until 1000).map(i => (f"k$i%04d", i)).toDF("k", "v")
      .repartition(8)
    // the numbering segment (pre-checkpoint) must be range-partitioned
    // with narrow numbering — never a Window with an empty partition
    // spec (single task at scale)
    val inner = SurrogateKeys.numberedLocal(dim, Seq(col("k")))
      .queryExecution.executedPlan.toString
    assert(inner.contains("rangepartitioning"), inner)
    assert(!inner.contains("Window"), s"window crept into numbering:\n$inner")
    // and the assembled query must not re-introduce a global row_number
    val outer = SurrogateKeys.assign(dim, "sk", Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!outer.contains("Window [row_number()"),
      s"global row_number window found in plan:\n$outer")
  }

  test("DateDim.withUnknownMember appends the reference's -1 row") {
    val orders = Seq(("2024-01-01"), ("2024-01-03")).toDF("d")
    val dim = SurrogateKeys.assign(
      DateDim.fromObservedRange(orders, "d"), "date_id", Seq("full_date"))
    val withUnknown = DateDim.withUnknownMember(dim)
    assert(withUnknown.count() === 4)
    val u = withUnknown.where(col("date_id") === -1).collect()
    assert(u.length === 1)
    val row = u.head
    val idx = withUnknown.columns.zipWithIndex.toMap
    assert(row.getDate(idx("full_date")).toString === "1900-01-01")
    assert(row.getInt(idx("year")) === -1)
    assert(row.getString(idx("season_name")) === "unknown")
    assert(row.getString(idx("month_long_name")) === "unknown")
    assert(row.getBoolean(idx("is_weekend")) === false)
    assert(row.getInt(idx("month_number")) === -1)
  }
}
