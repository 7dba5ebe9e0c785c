package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The native gram kernel must reproduce the legacy posexplode +
  * per-document window `lead` pipeline GRAM-FOR-GRAM (order and
  * multiplicity), because every gram consumer's DuckDB oracle was
  * written against that pipeline's semantics. */
class WordNGramsParitySpec extends SparkSpec {
  import spark.implicits._

  /** The replaced pipeline, verbatim (modulo names). */
  private def legacyGrams(docs: DataFrame, n: Int): DataFrame = {
    val toks = docs
      .select(col("doc_id"),
        posexplode(graft.text.WordGrams.tokens(col("text")))
          .as(Seq("pos", "tok")))
      .where(length(col("tok")) > 0)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val leadCols = (1 until n).map(k => lead(col("tok"), k).over(w).as(s"_t$k"))
    val withLeads = toks.select(
      (col("doc_id") +: col("tok").as("_t0") +: leadCols): _*)
    val complete =
      if (n == 1) withLeads else withLeads.where(col(s"_t${n - 1}").isNotNull)
    complete.select(col("doc_id"),
      concat_ws(" ", (0 until n).map(k => col(s"_t$k")): _*).as("gram"))
  }

  private def assertParity(docs: DataFrame, n: Int): Unit = {
    val native = graft.text.WordGrams.grams(docs, "doc_id", "text", n)
      .groupBy("doc_id", "gram").count()
      .orderBy("doc_id", "gram").collect().toSeq
    val legacy = legacyGrams(docs, n)
      .groupBy("doc_id", "gram").count()
      .orderBy("doc_id", "gram").collect().toSeq
    assert(native === legacy, s"n=$n")
  }

  test("adversarial inputs match the legacy window pipeline at n=1,2,3,8") {
    val docs = Seq(
      (1L, "plain lower case words"),
      (2L, "MiXeD CaSe And APOSTROPHE's plus-hyphens"),
      (3L, "  leading, trailing;; and    runs!!of?separators  "),
      (4L, ""),
      (5L, "   \t\n  "),
      (6L, "one"),
      (7L, "exactly two"),
      (8L, "dup dup dup dup"),                 // multiplicity
      (9L, "digits 007 mix3d t0kens 42"),
      (10L, "unicode café naïve İstanbul Kelvin"),
      (11L, "emoji 😀 split😁tokens"),
      (12L, "cjk 模型訓練 interleaved ascii"),
      (13L, "ALL UPPER CASE INPUT"),
      (14L, "a b c d e f g h i j")
    ).toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3, 8)) assertParity(docs, n)
  }

  test("randomized corpus matches at n=3") {
    val rng = new scala.util.Random(42)
    val alphabet = "abXY 09.,;é中😀'-_/"
    val docs = (1L to 300L).map { i =>
      val len = rng.nextInt(60)
      (i, (0 until len).map(_ => alphabet(rng.nextInt(alphabet.length)))
        .mkString)
    }.toDF("doc_id", "text")
    assertParity(docs, 3)
  }

  test("kernel semantics directly: lowering, separators, short docs") {
    val out = spark.range(1)
      .select(WordNGrams.wordNGrams(lit("The KELVIN sign; 42!"), 2)
        .as("g"))
      .head().getSeq[String](0)
    // lower("K") = "k" -> token "kelvin", exactly as lower()+regexp did
    assert(out === Seq("the kelvin", "kelvin sign", "sign 42"))
    val empty = spark.range(1)
      .select(WordNGrams.wordNGrams(lit("one two"), 3).as("g"))
      .head().getSeq[String](0)
    assert(empty.isEmpty)
  }

  /** ws-mode must reproduce the dedup family's
    * `shinglesFromTokens(tokensOf(text), k)` EXACTLY — including the
    * split("", " ") = [""] empty-token quirk on blank text. */
  private def assertWsParity(docs: DataFrame, k: Int): Unit = {
    val native = docs.select(col("doc_id"),
        array_distinct(WordNGrams.wsNGrams(col("text"), k)).as("sh"))
      .orderBy("doc_id").collect().map(_.getSeq[String](1)).toSeq
    val legacy = docs.select(col("doc_id"),
        graft.dedup.Dedup.tokensOf(col("text")).as("toks"))
      .select(col("doc_id"),
        graft.dedup.Dedup.shinglesFromTokens(col("toks"), k).as("sh"))
      .orderBy("doc_id").collect().map(_.getSeq[String](1)).toSeq
    assert(native === legacy, s"k=$k")
  }

  test("ws-mode matches shinglesFromTokens(tokensOf) at k=1,2,3,5") {
    val docs = Seq(
      (1L, "plain lower case words here"),
      (2L, "Punctuation, STAYS; in'the (token)!"),
      (3L, "  leading and trailing   runs\t\tof\nwhitespace  "),
      (4L, ""),
      (5L, "   \t\n  "),
      (6L, "one"),
      (7L, "dup dup dup dup dup"),
      (8L, "unicode café naïve 模型 😀 mixé"),
      (9L, "a-b c_d e.f g/h"),
      (10L, "ALL UPPER behaves like lower")
    ).toDF("doc_id", "text")
    for (k <- Seq(1, 2, 3, 5)) assertWsParity(docs, k)
  }

  test("ws-mode randomized corpus matches at k=3") {
    val rng = new scala.util.Random(7)
    val alphabet = "abXY 09.,;é中😀'-_/\t"
    val docs = (1L to 300L).map { i =>
      val len = rng.nextInt(60)
      (i, (0 until len).map(_ => alphabet(rng.nextInt(alphabet.length)))
        .mkString)
    }.toDF("doc_id", "text")
    assertWsParity(docs, 3)
  }

  test("registered SQL function form works and matches the Column form") {
    org.apache.spark.sql.GraftColumnBridge.registerFunctions(spark)
    val viaSql = spark.sql(
      "SELECT word_ngrams('alpha beta gamma', 2) AS g")
      .head().getSeq[String](0)
    assert(viaSql === Seq("alpha beta", "beta gamma"))
  }
}
