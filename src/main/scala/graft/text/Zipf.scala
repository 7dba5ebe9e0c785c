package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zipf rank-frequency audit: per source, the log-log slope of the
  * token frequency head — a natural-language corpus follows
  * `freq ∝ rank^(-s)` with s ≈ 1 (Zipf 1949), and a source whose
  * fitted slope drifts far from −1 is machine-generated boilerplate,
  * template spam, or a scrape of something that is not prose. The
  * corpus-health signal a source-level quality gate reads next to
  * langid and the Gopher rules.
  *
  * Engine-exact arithmetic (hash-exact oracle): ln(rank) and ln(freq)
  * are rounded ONCE per point to integer MILLI-nats (the q113/q121
  * rounding convention — milli not micro so every least-squares
  * product stays far inside BIGINT at any corpus scale), then the
  * ordinary-least-squares slope is pure integer arithmetic:
  *
  *   num = 1000 · (n·Σxy − Σx·Σy)          (slope → ppm scale)
  *   den = (n·Σxx − Σx·Σx) div 1000
  *   slope_ppm = (num − pmod(num, den)) div den    (floor division)
  *
  * The pmod dance makes the numerator an exact multiple before the
  * `div`, so Spark's truncating div and an oracle floor agree on the
  * NEGATIVE slopes this fit produces (the q57 convention). Bounds with
  * `topRanks` ≤ 1000: |x| ≤ 6 908, |y| ≤ ~32 000 even at 1e12
  * occurrences, so n·Σxy ≤ ~2e14 and num ≤ ~2e17 — no overflow.
  *
  * Scale shape: the per-source frequency table is one
  * map-side-combinable aggregate keyed on (source, token); the head is
  * a two-phase per-source top-k (bucket pre-rank then global rank — no
  * one-task-per-source funnel); everything after is ≤ |sources|·topRanks
  * rows collapsing to |sources| fit rows. Sources with fewer than two
  * distinct tokens are dropped (a one-point fit has no slope).
  */
object Zipf {

  def zipfFit(
      docs: DataFrame,
      srcCol: String,
      textCol: String,
      topRanks: Int = 1000): DataFrame = {
    require(topRanks >= 2 && topRanks <= 1000,
      s"topRanks must be in [2, 1000] (BIGINT overflow headroom), got $topRanks")
    val tf = docs
      .select(col(srcCol).as("source"),
        explode(WordGrams.tokens(col(textCol))).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("freq"))
    val ranked = graft.curate.Curation.twoPhaseTopK(
      tf.withColumn("_bkt", pmod(xxhash64(col("tok")), lit(32))),
      "source", Seq(col("freq").desc, col("tok").asc), topRanks)
    val pts = ranked.select(col("source"),
      round(lit(1e3) * log(col("sample_rank").cast("double")))
        .cast("long").as("x"),
      round(lit(1e3) * log(col("freq").cast("double")))
        .cast("long").as("y"))
    pts.groupBy(col("source"))
      .agg(count(lit(1)).as("n_ranks"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .where(col("n_ranks") >= 2)
      .withColumn("num", expr("1000 * (n_ranks * sxy - sx * sy)"))
      .withColumn("den", expr("(n_ranks * sxx - sx * sx) div 1000"))
      .select(col("source"), col("n_ranks"),
        expr("(num - pmod(num, den)) div den").as("slope_ppm"),
        expr("sy div n_ranks").as("mean_log_freq_milli"))
  }
}
