package graft.curate

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  // Two clearly-separated token populations: "target-ish" docs speak
  // apple/banana/cherry, the rest speak xray/yankee/zulu, with a small
  // shared stopword ("the") in both.
  private val docs = (
    (1L to 40L).map(i => (i, "the apple banana cherry apple banana")) ++
    (41L to 200L).map(i => (i, "the xray yankee zulu xray yankee"))
  ).toDF("doc_id", "text")

  private def weights(buckets: Int = 64) =
    Importance.importanceWeights(docs, "doc_id", "text",
      targetPred = col("doc_id") <= 40L, buckets = buckets)

  test("target-domain docs score positive, off-domain negative") {
    val byDoc = weights().collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("w_micro_sum"), r.getAs[Boolean]("selected"))).toMap
    assert(byDoc(1L)._1 > 0 && byDoc(1L)._2)
    assert(byDoc(100L)._1 < 0 && !byDoc(100L)._2)
    // every doc of each population shares its population's verdict
    assert((1L to 40L).forall(byDoc(_)._2))
    assert((41L to 200L).forall(!byDoc(_)._2))
  }

  test("weights are partition-independent (integer micro-nat sums)") {
    val a = weights().collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val b = Importance.importanceWeights(docs.repartition(7), "doc_id",
        "text", targetPred = col("doc_id") <= 40L, buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(a === b)
  }

  test("empty docs emit no row; n_tokens counts canonical tokens") {
    val withEmpty = docs.unionByName(Seq((999L, "  --  ")).toDF("doc_id", "text"))
    val out = Importance.importanceWeights(withEmpty, "doc_id", "text",
      targetPred = col("doc_id") <= 40L, buckets = 64)
    assert(out.where(col("doc_id") === 999L).isEmpty)
    assert(out.where(col("doc_id") === 1L).head.getAs[Long]("n_tokens") === 6L)
  }

  test("bucket table is metadata-sized and the score join broadcasts") {
    val plan = weights().queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"score join should broadcast the 64-row bucket table:\n$plan")
  }
}
