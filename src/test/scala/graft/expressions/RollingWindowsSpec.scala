package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollingWindowsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: hash each window independently with RollingHash. */
  private def ref(s: String, k: Int): Seq[Long] =
    if (s.codePointCount(0, s.length) < k) Seq.empty
    else {
      val cps = s.codePoints().toArray
      (0 to cps.length - k).map { i =>
        cps.slice(i, i + k).foldLeft(0L)((h, cp) =>
          (h * RollingHash.Base + cp) % RollingHash.Mod)
      }
    }

  test("slide matches independent per-window hashing") {
    val texts = Seq(
      "abcdefg", "aaaaaaaaaa", "the quick brown fox jumps",
      "xy", "exactlyk", "")
    for (k <- Seq(1, 2, 3, 8)) {
      val got = texts.toDF("t")
        .select(RollingWindows.rollingWindows(col("t"), k))
        .collect().map(_.getSeq[Long](0))
      texts.zip(got).foreach { case (t, g) =>
        assert(g === ref(t, k), s"text '$t' k=$k")
      }
    }
  }

  test("window hashes equal RollingHash of the substring (composability)") {
    val t = "hello rolling windows"
    val k = 5
    val subs = (0 to t.length - k).map(i => t.substring(i, i + k))
    val whs = Seq(t).toDF("t")
      .select(RollingWindows.rollingWindows(col("t"), k))
      .head().getSeq[Long](0)
    val rhs = subs.toDF("s")
      .select(RollingHash.rollingHash(col("s")))
      .collect().map(_.getLong(0))
    assert(whs === rhs.toSeq)
  }

  test("multibyte codepoints hash by codepoint, not byte") {
    // "héllo" : 5 codepoints, 6 UTF-8 bytes -> windows count by codepoint
    val whs = Seq("héllo").toDF("t")
      .select(RollingWindows.rollingWindows(col("t"), 3))
      .head().getSeq[Long](0)
    assert(whs.length === 3)
    assert(whs === ref("héllo", 3))
  }

  test("k < 1 is an analysis error; SQL registration works") {
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq("x").toDF("t")
        .select(RollingWindows.rollingWindows(col("t"), 0)).collect()
    }
    org.apache.spark.sql.GraftColumnBridge.registerFunctions(spark)
    val r = spark.sql(
      "SELECT rolling_windows('abcd', 2) AS w, rolling_hash('ab') AS h")
      .head()
    assert(r.getSeq[Long](0).head === r.getLong(1))
  }

  test("malformed UTF-8 steps like Spark length()/substring()") {
    // invalid lead bytes (0xf8, lone continuation 0x80) and a truncated
    // 3-byte lead (0xe0 swallowing ascii) smuggled in via binary cast:
    // window count and per-window values must agree with Spark's own
    // character semantics, since scrub cuts use these positions
    val bytes = Array[Byte]('a', 'b', 0xf8.toByte, 'c', 0x80.toByte,
      'd', 0xe0.toByte, 'x', 'y', 'z', 'w')
    val df = Seq(Tuple1(bytes)).toDF("b")
      .select(col("b").cast("string").as("t"))
    val k = 3
    val row = df.select(length(col("t")).as("n"),
      RollingWindows.rollingWindows(col("t"), k).as("ws")).head()
    val n = row.getInt(0)
    val ws = row.getSeq[Long](1)
    assert(ws.length === n - k + 1, "window count vs Spark length()")
    val rhs = df.select((1 to n - k + 1).map(i =>
      RollingHash.rollingHash(substring(col("t"), i, k)).as(s"h$i")): _*)
      .head()
    (0 until n - k + 1).foreach { i =>
      assert(ws(i) === rhs.getLong(i), s"window $i vs substring hash")
    }
  }
}
