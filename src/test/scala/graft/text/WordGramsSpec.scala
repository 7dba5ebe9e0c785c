package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordGramsSpec extends SparkSpec {
  import spark.implicits._

  test("grams canonicalizes, windows and drops incomplete tails") {
    val docs = Seq(
      (1L, "The quick, BROWN fox!"),
      (2L, "tiny doc"),
      (3L, "")
    ).toDF("doc_id", "text")
    val got = WordGrams.grams(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set(
      (1L, "the quick brown"), (1L, "quick brown fox")))
  }

  test("grams n=1 emits every token; blank docs emit nothing") {
    val docs = Seq((1L, "a b a"), (2L, "   ")).toDF("doc_id", "text")
    val got = WordGrams.grams(docs, "doc_id", "text", 1)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq.sorted === Seq((1L, "a"), (1L, "a"), (1L, "b")))
  }

  test("decontaminate counts distinct shared grams and keeps clean docs") {
    val train = Seq(
      (10L, "alpha beta gamma delta"),      // shares "alpha beta gamma" once
      (11L, "alpha beta gamma alpha beta gamma"), // same gram twice -> distinct 1 + "beta gamma alpha" + "gamma alpha beta"
      (12L, "totally different words here")
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (90L, "alpha beta gamma alpha beta")
    ).toDF("doc_id", "text")
    val got = WordGrams.decontaminate(train, eval_, "doc_id", "text", 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // eval grams: {alpha beta gamma, beta gamma alpha, gamma alpha beta}
    assert(got.toSeq === Seq(
      (10L, 1L, true),
      (11L, 3L, true),
      (12L, 0L, false)))
  }

  test("grams match the naive sliding-window reference on random corpora") {
    val vocab = Vector("a", "bb", "ccc", "Dd", "e9", "f!f", "GG")
    for (seed <- Seq(3, 17, 42); n <- Seq(2, 3, 5)) {
      val rng = new scala.util.Random(seed)
      val docs = (0L until 20L).map { i =>
        (i, (0 until rng.nextInt(12)).map(_ => vocab(rng.nextInt(vocab.size)))
          .mkString(" "))
      }
      // reference: canonicalize like WordGrams.tokens, then sliding(n)
      val want = docs.flatMap { case (id, text) =>
        val toks = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
          .split(" ").filter(_.nonEmpty)
        if (toks.length < n) Seq.empty
        else toks.sliding(n).map(g => (id, g.mkString(" "))).toSeq
      }
      val got = WordGrams.grams(docs.toDF("doc_id", "text"),
          "doc_id", "text", n)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.sorted.toSeq === want.sorted.toSeq, s"seed $seed n=$n")
    }
  }

  test("vocabulary counts occurrences and doc frequency with a floor") {
    val docs = Seq(
      (1L, "ab ab ab cd"),
      (2L, "ab cd cd"),
      (3L, "ef")
    ).toDF("doc_id", "text")
    val got = WordGrams.vocabulary(docs, "doc_id", "text", minCount = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(("ab", 4L, 2L), ("cd", 3L, 2L)))
  }

  test("commonGrams counts document frequency, not occurrences") {
    val docs = Seq(
      (1L, "x y x y x y"), // gram "x y" appears 3x in one doc -> df 1
      (2L, "x y z"),
      (3L, "x y q"),
      (4L, "unrelated words")
    ).toDF("doc_id", "text")
    val got = WordGrams.commonGrams(docs, "doc_id", "text", 2, minDocs = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("x y", 3L)))
  }

  test("collocations: hand-computed PMI in micro-nats, floor applied") {
    val docs = Seq(
      (1L, "new york new york"), // pairs: (new,york) x2, (york,new)
      (2L, "a new day"),         // (a,new), (new,day)
      (3L, "york a a")           // (york,a), (a,a)
    ).toDF("doc_id", "text")
    val got = WordGrams.collocations(docs, "doc_id", "text", minPairCount = 2)
      .collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("n_pair"), r.getAs[Long]("n_w1"),
        r.getAs[Long]("n_w2"), r.getAs[Long]("pmi_micro")))
    // T = 10 tokens, B = 7 pairs; counts: new 3, york 3, a 3, day 1.
    // only (new, york) clears the floor of 2
    val expected = math.round(
      1e6 * math.log(2.0 * 10 * 10 / (7.0 * 3 * 3)))
    assert(got.toSeq === Seq(("new", "york", 2L, 3L, 3L, expected)))
  }

  test("collocations: blank docs contribute nothing; cross-doc pairs never form") {
    val docs = Seq(
      (1L, "alpha beta"),
      (2L, "beta alpha"), // adjacency is WITHIN doc: no (beta, beta) pair
      (3L, "   ")
    ).toDF("doc_id", "text")
    val got = WordGrams.collocations(docs, "doc_id", "text", minPairCount = 1)
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"))).toSet
    assert(got === Set(("alpha", "beta"), ("beta", "alpha")))
  }
}
