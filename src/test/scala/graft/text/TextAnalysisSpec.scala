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

  test("rolling hash: deterministic, composable over concatenation") {
    val df = Seq(("hello", " world", "hello world")).toDF("a", "b", "full")
    val r = df.select(
      TextAnalysis.rollingHashFrom(col("full")).as("hFull"),
      TextAnalysis.rollingHashFrom(col("a")).as("hA"),
      // h(a ++ b) == (h(a) * B^len(b) + h_raw(b)) mod p; verify via
      // direct recomputation on the concatenated string instead
      TextAnalysis.rollingHashFrom(concat(col("a"), col("b"))).as("hCat")
    ).head()
    assert(r.getAs[Long]("hFull") === r.getAs[Long]("hCat"))
    assert(r.getAs[Long]("hA") !== r.getAs[Long]("hFull"))
    // distinct strings -> distinct hashes (these particular ones)
    val two = Seq(("abc", "abd")).toDF("x", "y").select(
      TextAnalysis.rollingHashFrom(col("x")),
      TextAnalysis.rollingHashFrom(col("y"))).head()
    assert(two.getLong(0) !== two.getLong(1))
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

  test("repetition metrics: duplicate lines and degenerate tokens score high") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "line a\nline a\nline a\nline b"), // 3 dup lines of 4
      (2L, "all lines unique here"),          // single line
      (3L, "spam spam spam spam tail")        // token spam
    ).toDF("id", "text")
    val dup = df.select(TextAnalysis.dupLineRatio(col("text")))
      .collect().map(_.getDouble(0))
    assert(dup(0) === 0.5)   // 2 distinct / 4 lines
    assert(dup(1) === 0.0)
    val tf = TextAnalysis.topTokenFrac(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(tf(3L) === 0.8)   // 4 of 5 tokens are 'spam'
    assert(tf(2L) === 0.25)  // all unique
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
