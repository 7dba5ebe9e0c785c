package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  // explicit escapes so composed vs decomposed forms are unambiguous in
  // source: á = precomposed a-acute, "á" = a + COMBINING ACUTE
  private val Decomposed = "á"
  private val Composed = "á"

  private def nfcOf(s: String): String =
    NfcNormalize.compute(UTF8String.fromString(s)).toString

  test("composes canonical-equivalent sequences to NFC") {
    assert(nfcOf(Decomposed) === Composed)
    assert(nfcOf("école") === "école")
    assert(nfcOf("Å") === "Å")
    // already-composed input is untouched
    assert(nfcOf(Composed) === Composed)
  }

  test("pure-ASCII fast path returns the input buffer itself") {
    val in = UTF8String.fromString("plain ascii text 123")
    assert(NfcNormalize.compute(in) eq in)
    val empty = UTF8String.fromString("")
    assert(NfcNormalize.compute(empty) eq empty)
  }

  test("already-normalized non-ASCII returns the input buffer (quick-check path)") {
    val in = UTF8String.fromString("café 中文")
    assert(NfcNormalize.compute(in) eq in)
  }

  test("idempotent: nfc(nfc(x)) == nfc(x)") {
    val samples = Seq(Decomposed, Composed, "Å", "ascii", "")
    samples.foreach { s =>
      assert(nfcOf(nfcOf(s)) === nfcOf(s))
    }
  }

  test("column form runs in codegen and propagates null") {
    val local = Seq(Some(Decomposed + "b"), Some("plain"), None).toDF("t")
      .select(NfcNormalize.nfc(col("t")).as("n"))
    val got = local.collect().map(r => Option(r.getString(0)))
    assert(got.toSeq === Seq(Some(Composed + "b"), Some("plain"), None))
    // whole-stage codegen must cover the projection (no interpreted
    // fallback) — a non-foldable source, or constant folding eats it
    val df = spark.range(3).select(
      NfcNormalize.nfc(concat(lit(Decomposed), col("id").cast("string")))
        .as("n"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
    assert(df.collect().map(_.getString(0)).toSeq ===
      Seq(Composed + "0", Composed + "1", Composed + "2"))
  }

  test("SQL registration: nfc_normalize is callable after registerFunctions") {
    org.apache.spark.sql.GraftColumnBridge.registerFunctions(spark)
    val got = spark.sql(s"SELECT nfc_normalize('$Decomposed') AS n")
      .head.getString(0)
    assert(got === Composed)
  }
}
