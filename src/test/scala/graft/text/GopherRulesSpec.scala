package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private val t = GopherRules.Thresholds(minWords = 5, minStopWords = 1)

  private def annotateOne(text: String) =
    GopherRules.annotate(Seq((1L, text)).toDF("id", "text"), "text", t)
      .head()

  test("clean prose passes every rule") {
    val r = annotateOne(
      "the quick brown fox jumps over that lazy dog and naps with joy")
    assert(r.getAs[Boolean]("gopher_ok"))
    assert(r.getAs[Long]("n_words") === 13L)
    assert(r.getAs[Int]("n_stop_words") >= 3) // the, that, and, with
  }

  test("each degenerate shape trips its own rule") {
    val bullets = annotateOne("- item one\n- item two\n- item three")
    assert(!bullets.getAs[Boolean]("r_bullets"))
    assert(bullets.getAs[Double]("bullet_frac") === 1.0)

    val ellipsis = annotateOne(
      "read more...\nsee details...\nthe end of that line")
    assert(!ellipsis.getAs[Boolean]("r_ellipsis"))
    assert(math.abs(ellipsis.getAs[Double]("ellipsis_frac") - 2.0 / 3) < 1e-5)

    val symbols = annotateOne("### tags ### of ### the ### feed")
    assert(!symbols.getAs[Boolean]("r_symbols"))

    val short = annotateOne("too short")
    assert(!short.getAs[Boolean]("r_words"))

    val longWords = annotateOne(
      Seq.fill(6)("pneumonoultramicroscopicsilicovolcanoconiosis").mkString(" "))
    assert(!longWords.getAs[Boolean]("r_mean_len"))
    assert(longWords.getAs[Boolean]("r_words"), "6 words clear the floor")

    val digits = annotateOne("111 222 333 444 555 the 666")
    assert(!digits.getAs[Boolean]("r_alpha"))

    val noStop = annotateOne("lorem ipsum dolor sit amet consectetur")
    assert(!noStop.getAs[Boolean]("r_stop"))
  }

  test("stop-word matching is token-bounded, not substring") {
    // "too" must not count as "to"; "other" must not count as "the"
    val r = annotateOne("too other bandwidth soften gallery placard")
    assert(r.getAs[Int]("n_stop_words") === 0)
    // punctuation-delimited stop word still counts
    val p = annotateOne("alpha,the beta gamma delta epsilon")
    assert(p.getAs[Int]("n_stop_words") === 1)
  }

  test("empty and whitespace-only docs fail word count with zeroed ratios") {
    for (txt <- Seq("", "   \n  ")) {
      val r = annotateOne(txt)
      assert(!r.getAs[Boolean]("r_words"))
      assert(r.getAs[Double]("mean_word_len") === 0.0)
      assert(r.getAs[Double]("alpha_word_frac") === 0.0)
      assert(!r.getAs[Boolean]("gopher_ok"))
    }
  }
}
