package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The conditional-spread contract: an already-split source must NOT
  * gain a repartition (at 100 TB that would be a full-corpus shuffle
  * executed for nothing), while a single-partition source must. */
class SpreadSpec extends SparkSpec {

  test("wide input is returned untouched — no shuffle, same object") {
    val wide = spark.range(0, 1000).toDF("id").repartition(8)
    assert(wide.rdd.getNumPartitions === 8)
    val out = Spread.byKeyIfNarrow(wide, col("id"))
    // identity, not merely shuffle-free: no plan node was added at all
    assert(out eq wide)
    assert(!out.queryExecution.optimizedPlan.toString
      .contains("RepartitionByExpression"))
  }

  test("narrow input gains the key-hashed repartition") {
    val narrow = spark.range(0, 1000).toDF("id").coalesce(1)
    val out = Spread.byKeyIfNarrow(narrow, col("id"))
    assert(out.queryExecution.optimizedPlan.toString
      .contains("RepartitionByExpression"))
    // post-AQE partition count may coalesce on tiny data; the contract
    // is the plan shape (hash exchange present) + unchanged results
    assert(out.count() === 1000)
  }

  test("explicit floor overrides the default-parallelism gate") {
    val df = spark.range(0, 100).toDF("id").repartition(2)
    // 2 >= floor 2 -> untouched
    assert(Spread.byKeyIfNarrow(df, col("id"), minPartitions = 2) eq df)
    // 2 < floor 16 -> spread
    assert(Spread.byKeyIfNarrow(df, col("id"), minPartitions = 16)
      .queryExecution.optimizedPlan.toString
      .contains("RepartitionByExpression"))
  }
}
