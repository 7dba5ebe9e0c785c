package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // skewed corpus: "alpha" dominates, "beta" sits at the threshold,
  // a long tail of singletons must never surface
  private def corpus(nTail: Int) = {
    val docs =
      Seq.fill(30)("alpha alpha alpha") ++
        Seq.fill(10)("beta alpha") ++
        (1 to nTail).map(i => s"tail$i")
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  private def truth(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val toks = df.select(explode(WordGrams.tokens(col("text"))).as("token"))
      .where(length(col("token")) > 0)
    val total = toks.count()
    toks.groupBy("token").agg(count(lit(1)).as("n"))
      .where(col("n") * k >= total)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
  }

  test("heavyTokens is exact against the full groupBy truth") {
    val df = corpus(nTail = 60)
    for (k <- Seq(5, 20, 100)) {
      val got = HeavyHitters.heavyTokens(df, "text", k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got === truth(df, k), s"k=$k")
    }
  }

  test("heavyTokens result is independent of input partitioning") {
    val df = corpus(nTail = 40)
    val expected = HeavyHitters.heavyTokens(df.repartition(1), "text", 10)
      .collect().toSeq
    for (parts <- Seq(3, 7, 16)) {
      val got = HeavyHitters.heavyTokens(df.repartition(parts), "text", 10)
        .collect().toSeq
      assert(got === expected, s"parts=$parts")
    }
  }

  test("heavyTokens share_bp is the exact integer basis-point share") {
    // 8 of 10 tokens are "x" -> 8000 bp
    val df = Seq((1L, "x x x x x x x x y z")).toDF("id", "text")
    val row = HeavyHitters.heavyTokens(df, "text", 2).head()
    assert(row.getString(0) === "x")
    assert(row.getLong(1) === 8L)
    assert(row.getLong(2) === 8000L)
  }
}
