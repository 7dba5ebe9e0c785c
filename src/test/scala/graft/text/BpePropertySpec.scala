package graft.text

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: the distributed BPE trainer against an in-JVM
  * reference implementation on random corpora. The reference applies
  * merges with the canonical greedy left-to-right scan; the operator's
  * replace-chain application agrees with greedy whenever no token
  * repeats one pair more than ~2^passes times consecutively, which the
  * generator guarantees (tokens ≤ 10 chars) — so the DECISION SEQUENCE
  * (pair, merged, count per round) must match exactly, for any corpus
  * shape, duplicate mix and round count. */
class BpePropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(1234L + i)))

  private val corpusGen: Gen[(List[String], Int)] =
    for {
      vocabN <- Gen.choose(1, 12)
      vocab <- Gen.listOfN(vocabN,
        Gen.choose(1, 10).flatMap(len =>
          Gen.listOfN(len, Gen.oneOf("abcde".toSeq)).map(_.mkString)))
      nDocs <- Gen.choose(1, 20)
      docs <- Gen.listOfN(nDocs,
        Gen.choose(1, 8).flatMap(w =>
          Gen.listOfN(w, Gen.oneOf(vocab)).map(_.mkString(" "))))
      rounds <- Gen.choose(1, 4)
    } yield (docs, rounds)

  /** Reference trainer: word-frequency table, exact weighted pair
    * counts, (count desc, pair asc) winner, greedy left-to-right
    * re-segmentation. */
  private def referenceMerges(
      docs: Seq[String], rounds: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = docs
      .flatMap(_.split("[^a-z0-9]+").filter(_.length >= 2))
      .groupBy(identity).map { case (w, g) =>
        w.map(_.toString).toVector -> g.size.toLong
      }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, wc) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + wc
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.minBy { case ((x, y), c) => (-c, s"$x $y") }
        out += ((r, s"$a $b", a + b, n))
        vocab = vocab.groupBy { case (syms, _) => greedyMerge(syms, a, b) }
          .map { case (m, g) => m -> g.values.sum }
        r += 1
      }
    }
    out.result()
  }

  /** Canonical greedy left-to-right merge: scan, merge at each match,
    * resume after the merged symbol. */
  private def greedyMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Reference encode: greedy-apply each learned merge in round order
    * to every token (length ≥ 1), return per-doc (tokens, char syms,
    * bpe syms). */
  private def referenceEncode(
      docs: Seq[String],
      learned: Seq[(String, String)]): Map[Long, (Long, Long, Long)] =
    docs.zipWithIndex.map { case (text, i) =>
      val toks = text.split("[^a-z0-9]+").filter(_.nonEmpty)
      val enc = toks.map { w =>
        learned.foldLeft(w.map(_.toString).toVector) { case (syms, (pair, _)) =>
          val Array(a, b) = pair.split(" ", 2)
          greedyMerge(syms, a, b)
        }
      }
      i.toLong -> ((toks.length.toLong, toks.map(_.length.toLong).sum,
        enc.map(_.length.toLong).sum))
    }.toMap

  test("encodeStats == reference greedy application on random corpora") {
    samples(corpusGen, 8).foreach { case (docs, rounds) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val learned = referenceMerges(docs, rounds).map(m => (m._2, m._3))
      val got = BpeStats.encodeStats(df, "doc_id", "text", rounds)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      val want = referenceEncode(docs, learned)
        .filter { case (_, (n, _, _)) => n > 0 } // token-less docs emit nothing
      assert(got === want, s"corpus=${docs.take(5)}... rounds=$rounds")
    }
  }

  test("merges == reference greedy BPE trainer on random corpora") {
    samples(corpusGen, 12).foreach { case (docs, rounds) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = BpeStats.merges(df, "doc_id", "text", rounds)
        .orderBy("round").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      val want = referenceMerges(docs, rounds)
      assert(got === want,
        s"corpus=${docs.take(5)}... rounds=$rounds")
    }
  }
}
