package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomContainsSpec extends SparkSpec {
  import spark.implicits._

  test("stat.bloomFilter has no false negatives via bloom_contains") {
    val df = (0 until 1000).map(i => s"key-$i").toDF("fp")
    val bloom = df.stat.bloomFilter(col("fp"), 1000L, 0.03)
    val misses = df
      .withColumn("hit", BloomContains.contains(col("fp"), bloom))
      .where(!col("hit")).count()
    assert(misses === 0L, "bloom false negative")
    // sanity: absent keys are mostly rejected (fpp 3%, allow slack)
    val fps = (0 until 1000).map(i => s"other-$i").toDF("fp")
      .withColumn("hit", BloomContains.contains(col("fp"), bloom))
      .where(col("hit")).count()
    assert(fps < 150L, s"bloom rejects too little: $fps/1000 false positives")
  }

  test("long keys round-trip; null key yields null") {
    val df = (0L until 500L).toDF("k")
    val bloom = df.stat.bloomFilter(col("k"), 500L, 0.03)
    val misses = df
      .withColumn("hit", BloomContains.contains(col("k"), bloom))
      .where(!col("hit")).count()
    assert(misses === 0L)
    val r = Seq[java.lang.Long](null).toDF("k")
      .select(BloomContains.contains(col("k"), bloom).as("hit")).head()
    assert(r.isNullAt(0))
  }
}
