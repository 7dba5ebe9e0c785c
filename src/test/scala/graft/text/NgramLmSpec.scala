package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // A corpus that overwhelmingly speaks a handful of sentences (high
  // bigram counts in few bucket pairs) plus one doc of unique-token
  // gibberish whose bigrams each occur once against heavy contexts.
  private val sentences = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a stitch in time saves nine every single day",
    "all that glitters is not gold in the end",
    "the early bird catches the worm every day")
  private val gibberish =
    "qx7 vz93 jjq0 wpl2 kd8n rr4t yb6m zc1s hh5v nq2k md9x tt3p aw8j fo4y ue7r ik2w"
  private val docs = (
    (1L to 300L).map(i => (i, sentences((i % 4).toInt))) :+ (900L, gibberish)
  ).toDF("doc_id", "text")

  private def scored(buckets: Int = 16) =
    NgramLm.perplexityFilter(docs, "doc_id", "text", buckets = buckets)

  test("corpus-speaking docs kept, unique-token gibberish rejected") {
    val byDoc = scored().collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("avg_nll_micro"), r.getAs[Boolean]("kept"))).toMap
    assert((1L to 300L).forall(byDoc(_)._2),
      s"corpus docs should beat the uniform baseline: ${byDoc(1L)}")
    assert(!byDoc(900L)._2,
      s"gibberish should read worse than uniform: ${byDoc(900L)}")
    assert(byDoc(900L)._1 > byDoc(1L)._1)
  }

  test("scores are partition-independent (integer micro-nat sums)") {
    val a = scored().collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("nll_micro_sum"))).toMap
    val b = NgramLm.perplexityFilter(docs.repartition(7), "doc_id", "text",
        buckets = 16).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("nll_micro_sum"))).toMap
    assert(a === b)
  }

  test("docs with fewer than two canonical tokens emit nothing") {
    val extra = docs.unionByName(Seq(
      (901L, "solo"), (902L, "  !! ?? "), (903L, "")).toDF("doc_id", "text"))
    val out = NgramLm.perplexityFilter(extra, "doc_id", "text", buckets = 16)
    assert(out.where(col("doc_id").isin(901L, 902L, 903L)).isEmpty)
  }

  test("token and bigram counts line up with the canonical tokenization") {
    val r = scored().where(col("doc_id") === 1L).head
    assert(r.getAs[Long]("n_tokens") === 9L)
    assert(r.getAs[Long]("n_bigrams") === 8L)
    assert(r.getAs[Long]("avg_nll_micro") ===
      r.getAs[Long]("nll_micro_sum") / 8L)
  }

  test("score table joins back as a broadcast (no corpus-scale shuffle)") {
    val plan = scored().queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"bounded score table should broadcast:\n$plan")
  }
}
