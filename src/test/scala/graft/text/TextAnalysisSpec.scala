package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId identifies obvious languages; 'und' when no stopwords hit") {
    val df = Seq(
      ("the cat and the dog is in the house", "en"),
      ("der Hund ist nicht mit der Katze und", "de"),
      ("el perro y la casa es de un amigo", "es"),
      ("le chien est dans la maison pour une", "fr"),
      ("xyzzy qwerty asdf", "und")
    ).toDF("text", "expected")
    val out = df.withColumn("got", TextAnalysis.langId(col("text")))
      .where(col("got") =!= col("expected")).collect()
    assert(out.isEmpty, out.mkString(", "))
  }

  test("fingerprint is stable under case and whitespace noise") {
    val df = Seq(
      ("Hello   World", "hello world"),
      ("  HELLO\tWORLD ", "hello world")
    ).toDF("a", "b")
    val bad = df.where(
      TextAnalysis.fingerprint(col("a")) =!= TextAnalysis.fingerprint(col("b")))
    assert(bad.count() === 0)
  }

  test("token counts: whitespace vs BPE-ish") {
    val r = Seq("hello world, it's 42 degrees!").toDF("t")
      .select(
        TextAnalysis.tokenCount(col("t")),
        TextAnalysis.bpeishTokenCount(col("t"))).head()
    assert(r.getInt(0) === 5)
    // hello | world | , | it | ' | s | 42 | degrees | !
    assert(r.getInt(1) === 9)
  }

  test("quality metrics flag short junk and pass clean prose") {
    val out = TextAnalysis.qualityMetrics(
        Seq((1L, "This is a perfectly normal sentence with enough words."),
            (2L, "!!! ??? ..."))
          .toDF("id", "text"), "text")
      .orderBy("id").select("quality_ok").collect().map(_.getBoolean(0))
    assert(out.toSeq === Seq(true, false))
  }

  test("stopword ratio reflects function-word density") {
    val out = TextAnalysis.qualityMetrics(
        Seq((1L, "the cat and the dog is in the house"),
            (2L, "quantum chromodynamics lattice simulation"))
          .toDF("id", "text"), "text")
      .orderBy("id").select("stopword_ratio").collect().map(_.getDouble(0))
    assert(out(0) > 0.2)
    assert(out(1) === 0.0)
  }
}
