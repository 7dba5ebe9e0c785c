package graft.etl

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests: the as-of join and binned range join against naive
  * per-row references on random inputs — the distributed plans must
  * reproduce the trivially-correct quadratic answers exactly. */
class JoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  // ---------------------------------------------------------------- as-of
  private val asofGen: Gen[(List[(Long, String, Long)], List[(String, Long, Double)])] =
    for {
      lefts <- Gen.nonEmptyListOf(for {
        k <- Gen.oneOf("u", "v", "w")
        t <- Gen.choose(0L, 50L)
      } yield (0L, k, t))
      rights <- Gen.listOf(for {
        k <- Gen.oneOf("u", "v", "x")
        t <- Gen.choose(0L, 50L)
        v <- Gen.choose(1, 999)
      } yield (k, t, v.toDouble))
    } yield (lefts.zipWithIndex.map { case ((_, k, t), i) => (i.toLong, k, t) },
      // unique per (key, ts): the operator's determinism contract
      rights.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toList)

  test("asofJoin == naive max-preceding scan on random inputs (both strictness modes)") {
    samples(asofGen, 12).foreach { case (lefts, rights) =>
      val l = lefts.toDF("event_id", "k", "t")
      val r = rights.toDF("k", "qt", "qv")
      for (strict <- Seq(false, true)) {
        val got = AsofJoin.asofJoin(l, r, Seq("k"), "t", "qt", Seq("qv"),
            strict = strict)
          .select("event_id", "asof_ts", "qv")
          .collect()
          .map(row => row.getLong(0) ->
            (if (row.isNullAt(1)) None else Some((row.getLong(1), row.getDouble(2)))))
          .toMap
        val expect = lefts.map { case (id, k, t) =>
          val cands = rights.filter(q =>
            q._1 == k && (if (strict) q._2 < t else q._2 <= t))
          id -> (if (cands.isEmpty) None
                 else { val m = cands.maxBy(_._2); Some((m._2, m._3)) })
        }.toMap
        assert(got === expect, s"strict=$strict lefts=$lefts rights=$rights")
      }
    }
  }

  // ---------------------------------------------------------------- range
  private val rangeGen: Gen[(List[(Long, Long, Long)], List[(Long, Long)])] =
    for {
      ivs <- Gen.nonEmptyListOf(for {
        s <- Gen.choose(-40L, 40L)
        len <- Gen.choose(0L, 25L)
      } yield (0L, s, s + len))
      pts <- Gen.nonEmptyListOf(Gen.choose(-45L, 65L))
    } yield (ivs.zipWithIndex.map { case ((_, s, e), i) => (i.toLong, s, e) },
      pts.zipWithIndex.map { case (p, i) => (i.toLong, p) })

  test("intervalPointJoin == naive filter for random intervals incl. negatives") {
    samples(rangeGen, 12).foreach { case (ivs, pts) =>
      for (width <- Seq(1L, 7L, 64L)) {
        val got = RangeJoin.intervalPointJoin(
            ivs.toDF("iv_id", "s", "e"), pts.toDF("pt_id", "p"),
            "s", "e", "p", width)
          .select("iv_id", "pt_id").as[(Long, Long)].collect().toSeq
        val expect = for {
          (iv, s, e) <- ivs
          (pt, p) <- pts
          if p >= s && p < e
        } yield (iv, pt)
        assert(got.sorted === expect.sorted,
          s"width=$width ivs=$ivs pts=$pts")
        assert(got.size === got.distinct.size, "pair emitted twice")
      }
    }
  }
}
