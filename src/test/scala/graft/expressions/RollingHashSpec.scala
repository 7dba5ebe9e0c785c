package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  /** Reference fold over Unicode codepoints — the DuckDB oracle's
    * `list_reduce` over `ascii(substr(ct, i, 1))` semantics. */
  private def ref(s: String): Long =
    s.codePoints().toArray.foldLeft(0L)((acc, cp) =>
      (acc * RollingHash.Base + cp) % RollingHash.Mod)

  test("matches the codepoint reference fold (ASCII and non-ASCII)") {
    val cases = Seq("hello world", "a", "The Quick Brown Fox 42!",
      "naïve café", "日本語テキスト", "mixed ascii ünd 中文", " ", "0" * 500)
    val got = cases.toDF("t")
      .select(RollingHash.rollingHash(col("t"))).collect().map(_.getLong(0))
    assert(got.toSeq === cases.map(ref))
  }

  test("empty string hashes to 0; null propagates null") {
    val r = Seq(("", null: String)).toDF("a", "b")
      .select(RollingHash.rollingHash(col("a")),
        RollingHash.rollingHash(col("b"))).head()
    assert(r.getLong(0) === 0L)
    assert(r.isNullAt(1))
  }

  test("composable over concatenation: h(a++b) = (h(a)*B^chars(b) + h(b)) mod p") {
    val (a, b) = ("der Hund ist", " nicht müde ü")
    val hA = ref(a); val hB = ref(b)
    val pow = (1 to b.codePointCount(0, b.length)).foldLeft(1L)((acc, _) =>
      (acc * RollingHash.Base) % RollingHash.Mod)
    val expected = (hA * pow % RollingHash.Mod + hB) % RollingHash.Mod
    val got = Seq(a + b).toDF("t")
      .select(RollingHash.rollingHash(col("t"))).head().getLong(0)
    assert(got === expected)
  }

  test("direct kernel agrees with codegen path") {
    val s = "canonical text 123 ü"
    assert(RollingHash.compute(UTF8String.fromString(s)) === ref(s))
  }

  test("registers as a SQL function") {
    org.apache.spark.sql.GraftColumnBridge.registerFunctions(spark)
    val r = spark.sql("SELECT rolling_hash('hello') AS h").head()
    assert(r.getLong(0) === ref("hello"))
  }
}
