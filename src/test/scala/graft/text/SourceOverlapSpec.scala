package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SourceOverlapSpec extends SparkSpec {
  import spark.implicits._

  // srcA and srcB share one exact sentence (its 3-grams overlap);
  // srcC shares nothing with anyone.
  private val shared = "alpha beta gamma delta epsilon"
  private val docs = Seq(
    (1L, "a", shared),
    (2L, "a", "one two three four five six"),
    (3L, "b", shared),
    (4L, "b", "seven eight nine ten eleven"),
    (5L, "c", "zig zag zip zap zoom zest")
  ).toDF("doc_id", "source", "text")

  private def run() =
    WordGrams.sourceOverlap(docs, "doc_id", "source", "text", n = 3)

  test("shared sentences surface; disjoint pairs appear with zero") {
    val rows = run().collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        (r.getAs[Long]("n_common"), r.getAs[Long]("jaccard_ppm"))).toMap
    assert(rows.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    // 5 tokens -> 3 distinct 3-grams shared between a and b
    assert(rows(("a", "b"))._1 === 3L)
    assert(rows(("a", "c")) === (0L, 0L))
    assert(rows(("b", "c")) === (0L, 0L))
  }

  test("containment ppm is exact integer arithmetic") {
    val ab = run().where(col("src_a") === "a" && col("src_b") === "b").head
    val (ga, gb, c) = (ab.getAs[Long]("grams_a"), ab.getAs[Long]("grams_b"),
      ab.getAs[Long]("n_common"))
    assert(ga === 7L && gb === 6L) // 4 + 3 and 3 + 3 distinct 3-grams
    assert(ab.getAs[Long]("cont_a_ppm") === 1000000L * c / ga)
    assert(ab.getAs[Long]("cont_b_ppm") === 1000000L * c / gb)
    assert(ab.getAs[Long]("jaccard_ppm") === 1000000L * c / (ga + gb - c))
  }

  test("duplicate grams within a source count once") {
    val dup = docs.unionByName(Seq((6L, "a", shared)).toDF("doc_id", "source", "text"))
    val ab = WordGrams.sourceOverlap(dup, "doc_id", "source", "text", n = 3)
      .where(col("src_a") === "a" && col("src_b") === "b").head
    assert(ab.getAs[Long]("grams_a") === 7L) // unchanged: sets, not bags
    assert(ab.getAs[Long]("n_common") === 3L)
  }

  test("matrix is partition-independent") {
    val a = run().collect().map(_.toSeq).toSet
    val b = WordGrams.sourceOverlap(docs.repartition(7), "doc_id", "source",
      "text", n = 3).collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
