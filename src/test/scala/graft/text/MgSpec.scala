package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** The Misra–Gries invariants, machine-checked against exact truth on
  * randomized streams and randomized merge trees. */
class MgSpec extends AnyFunSuite {

  private def zipfStream(rng: scala.util.Random, n: Int, vocab: Int): Seq[String] =
    (1 to n).map { _ =>
      // crude zipf: token id ~ floor(vocab^u) gives heavy low ids
      val u = rng.nextDouble()
      s"t${math.floor(math.pow(vocab.toDouble, u)).toLong}"
    }

  private def check(s: MgSummary, truth: Map[String, Long], cap: Int): Unit = {
    assert(s.n === truth.values.sum)
    assert(s.err <= s.n / (cap + 1), s"err ${s.err} > n/(cap+1)")
    s.counts.foreach { case (t, lb) =>
      val tr = truth.getOrElse(t, 0L)
      assert(lb <= tr, s"$t: lb $lb > true $tr")
      assert(tr <= lb + s.err, s"$t: true $tr > ub ${lb + s.err}")
    }
    // bracket also holds for tokens NOT stored (lb = 0)
    truth.foreach { case (t, tr) =>
      if (!s.counts.contains(t))
        assert(tr <= s.err, s"dropped $t with true $tr > err ${s.err}")
    }
  }

  test("summarize keeps the bracket and error invariants") {
    val rng = new scala.util.Random(7)
    for (cap <- Seq(3, 10, 50); n <- Seq(100, 5000)) {
      val stream = zipfStream(rng, n, vocab = 200)
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      check(Mg.summarize(stream.iterator, cap), truth, cap)
    }
  }

  test("merge keeps the invariants over randomized merge trees") {
    val rng = new scala.util.Random(11)
    for (cap <- Seq(5, 20); trial <- 1 to 5) {
      val stream = zipfStream(rng, 4000, vocab = 150)
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // random chunking, then a random-order left fold of merges
      val chunks = rng.shuffle(
        stream.grouped(1 + rng.nextInt(700)).toSeq)
      val merged = chunks
        .map(c => Mg.summarize(c.iterator, cap))
        .foldLeft(Mg.empty)((a, b) => Mg.merge(a, b, cap))
      check(merged, truth, cap)
      assert(merged.counts.size <= cap, s"trial $trial overflow")
    }
  }

  test("candidates(k) is a superset of the true heavy hitters") {
    val rng = new scala.util.Random(13)
    val stream = zipfStream(rng, 8000, vocab = 300)
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    for (cap <- Seq(30, 100); k <- Seq(10, 25)) {
      val s = Mg.summarize(stream.iterator, cap)
      val cands = s.candidates(k).map(_._1).toSet
      val trueHh = truth.collect { case (t, c) if c * k >= n => t }.toSet
      assert(trueHh.subsetOf(cands), s"cap=$cap k=$k missed ${trueHh -- cands}")
    }
  }

  test("candidates(k) enforces k <= capacity — superset guarantee boundary") {
    val s = Mg.summarize(Iterator("a", "b", "a", "c", "a"), capacity = 4)
    assert(s.capacity === 4)
    s.candidates(4) // at the boundary: allowed
    intercept[IllegalArgumentException](s.candidates(5))
    intercept[IllegalArgumentException](s.candidates(0))
    // the recorded capacity survives a merge at a LOOSER capacity
    val m = Mg.merge(s, Mg.summarize(Iterator("d", "e"), capacity = 100), 100)
    assert(m.capacity === 4)
    intercept[IllegalArgumentException](m.candidates(5))
  }
}
