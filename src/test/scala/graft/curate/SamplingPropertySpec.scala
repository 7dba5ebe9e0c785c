package graft.curate

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests: the two-phase top-k samplers against the naive
  * single-window formulations on random corpora — the bucket-parallel
  * plans must reproduce the one-task-per-stratum answers exactly, for
  * any stratum layout, k, and weight distribution. */
class SamplingPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(77L + i)))

  private val corpusGen: Gen[(List[(Long, String, Long)], Int)] =
    for {
      n <- Gen.choose(1, 300)
      strata <- Gen.choose(1, 5)
      rows <- Gen.listOfN(n, for {
        s <- Gen.choose(0, strata - 1)
        w <- Gen.choose(-2L, 40L) // includes non-positive weights
      } yield (s, w))
      k <- Gen.choose(1, 12)
    } yield (rows.zipWithIndex.map { case ((s, w), i) =>
      (i.toLong, s"s$s", w) }, k)

  test("sampleFixedK == naive per-stratum window for random strata and k") {
    samples(corpusGen, 10).foreach { case (rows, k) =>
      val df = rows.toDF("id", "stratum", "w")
      val got = Curation.sampleFixedK(df, "id", "stratum", k)
        .select("id", "sample_rank").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      val win = Window.partitionBy($"stratum")
        .orderBy(md5(concat($"id".cast("string"), lit("graft"))), $"id")
      val want = df.withColumn("sample_rank", row_number().over(win))
        .where($"sample_rank" <= k)
        .select("id", "sample_rank").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got === want, s"k=$k rows=${rows.size}")
    }
  }

  test("sampleWeightedK == naive priority window for random weights and k") {
    samples(corpusGen, 10).foreach { case (rows, k) =>
      val df = rows.toDF("id", "stratum", "w")
      val got = Curation.sampleWeightedK(df, "id", "stratum", "w", k)
        .select("id", "sample_rank").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      val u = (conv(substring(md5(concat($"id".cast("string"), lit("graft"))),
        1, 8), 16, 10).cast("long") + 1L).cast("double") / 4294967296.0
      val win = Window.partitionBy($"stratum").orderBy($"_pri".desc, $"id")
      val want = df
        .where($"w".isNotNull && $"w" > 0)
        .withColumn("_pri", $"w".cast("double") / u)
        .withColumn("sample_rank", row_number().over(win))
        .where($"sample_rank" <= k)
        .select("id", "sample_rank").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got === want, s"k=$k rows=${rows.size}")
    }
  }
}
