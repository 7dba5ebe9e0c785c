package graft.text

import graft.SparkSpec

class ZipfSpec extends SparkSpec {
  import spark.implicits._

  /** The exact integer OLS the operator promises, over a rank-ordered
    * frequency list. */
  private def fit(freqs: Seq[Long]): (Long, Long) = {
    val pts = freqs.zipWithIndex.map { case (f, i) =>
      (math.round(1e3 * math.log(i + 1.0)),
        math.round(1e3 * math.log(f.toDouble)))
    }
    val n = pts.size.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val num = 1000L * (n * sxy - sx * sy)
    val den = (n * sxx - sx * sx) / 1000L
    (Math.floorDiv(num, den), sy / n)
  }

  test("zipfFit: integer OLS matches a hand-rolled fit; one-token sources drop") {
    val docs = Seq(
      (1L, "s1", "a a a a b b c"), // freqs 4, 2, 1
      (2L, "s2", "x y"),           // freqs 1, 1 -> slope 0
      (3L, "s3", "solo")           // one distinct token: no slope
    ).toDF("doc_id", "source", "text")
    val got = Zipf.zipfFit(docs, "source", "text")
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_ranks"), r.getAs[Long]("slope_ppm"),
          r.getAs[Long]("mean_log_freq_milli"))).toMap
    val (slope1, mean1) = fit(Seq(4L, 2L, 1L))
    val (slope2, mean2) = fit(Seq(1L, 1L))
    assert(got === Map(
      "s1" -> ((3L, slope1, mean1)),
      "s2" -> ((2L, slope2, mean2))))
    assert(slope1 < 0, "descending frequencies must fit a negative slope")
    assert(slope2 === 0L)
  }

  test("zipfFit: a perfect zipf corpus fits slope near -1e6 ppm") {
    // freq(rank) = round(1200 / rank) for ranks 1..40
    val text = (1 to 40).flatMap { r =>
      Seq.fill(math.round(1200.0 / r).toInt)(s"w$r")
    }.mkString(" ")
    val docs = Seq((1L, "zipfy", text)).toDF("doc_id", "source", "text")
    val Array(row) = Zipf.zipfFit(docs, "source", "text").collect()
    val slope = row.getAs[Long]("slope_ppm")
    assert(slope < -900000L && slope > -1100000L,
      s"expected slope near -1e6 ppm, got $slope")
    assert(row.getAs[Long]("n_ranks") === 40L)
  }

  test("zipfFit: topRanks caps the fitted head") {
    val text = (1 to 30).flatMap(r => Seq.fill(31 - r)(s"w$r")).mkString(" ")
    val docs = Seq((1L, "s", text)).toDF("doc_id", "source", "text")
    val Array(row) = Zipf.zipfFit(docs, "source", "text", topRanks = 10).collect()
    assert(row.getAs[Long]("n_ranks") === 10L)
  }
}
