package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native char-shingle kernel must reproduce the interpreted
  * `array_distinct(transform(sequence(1, greatest(len-(n-1), 1)),
  * i -> substr(i, n)))` form EXACTLY — value and first-occurrence
  * order, including the short-text (whole-string shingle) and
  * empty-text ([""]) clamping quirks the jaccard-family oracles
  * spell. */
class CharNGramsParitySpec extends SparkSpec {
  import spark.implicits._

  private def legacy(ct: org.apache.spark.sql.Column, n: Int) =
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(ct) - (n - 1), lit(1))),
        i => ct.substr(i, lit(n))))

  private def assertParity(docs: DataFrame, n: Int): Unit = {
    val native = docs
      .select(col("doc_id"), CharNGrams.charNGrams(col("text"), n).as("sh"))
      .orderBy("doc_id").collect().map(_.getSeq[String](1)).toSeq
    val leg = docs
      .select(col("doc_id"), legacy(col("text"), n).as("sh"))
      .orderBy("doc_id").collect().map(_.getSeq[String](1)).toSeq
    assert(native === leg, s"n=$n")
  }

  test("adversarial inputs match at n=1,2,3,5") {
    val docs = Seq(
      (1L, "plain ascii text"),
      (2L, ""),
      (3L, "ab"),                       // shorter than n=3 -> one whole-string shingle
      (4L, "aaaaaaa"),                  // heavy dedup
      (5L, "abcabcabc"),                // periodic
      (6L, "café naïve 模型 😀 mixé"),   // multibyte boundaries
      (7L, "x"),
      (8L, "ab cd ef gh"),
      (9L, "😀😁😀😁"),                  // 4-byte codepoints only
      (10L, "tab\tand\nnewline chars")
    ).toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3, 5)) assertParity(docs, n)
  }

  test("randomized corpus matches at n=3") {
    val rng = new scala.util.Random(11)
    val alphabet = "ab 09é中😀\t"
    val docs = (1L to 300L).map { i =>
      val len = rng.nextInt(50)
      (i, (0 until len).map(_ => alphabet(rng.nextInt(alphabet.length)))
        .mkString)
    }.toDF("doc_id", "text")
    assertParity(docs, 3)
  }

  test("registered SQL function form works") {
    org.apache.spark.sql.GraftColumnBridge.registerFunctions(spark)
    val viaSql = spark.sql("SELECT char_ngrams('abcd', 3) AS g")
      .head().getSeq[String](0)
    assert(viaSql === Seq("abc", "bcd"))
  }
}
