package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

case class Reading(sensor: String, value: Double)

class StreamingExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val constraints = Seq(
    "value_positive" -> (col("value") > 0),
    "sensor_known"   -> col("sensor").isin("a", "b"))

  test("per-batch quality reports accumulate with batch ids") {
    val metrics = Files.createTempDirectory("dqmetrics").toString + "/m"
    val ckpt = Files.createTempDirectory("dqckpt").toString
    val batches = Seq(
      Seq(Reading("a", 1.0), Reading("b", 2.0)),            // clean
      Seq(Reading("a", -5.0), Reading("z", 3.0)))           // both fail

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Reading]
    val q = StreamingExpectations.start(input.toDF(), constraints,
      metrics, ckpt)
    for (b <- batches) { input.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val got = spark.read.parquet(metrics)
      .orderBy("batch_id", "constraint_name")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(4)))
    assert(got.toSeq === Seq(
      (0L, "sensor_known", 0L, true),
      (0L, "value_positive", 0L, true),
      (1L, "sensor_known", 1L, false),
      (1L, "value_positive", 1L, false)))
  }
}
