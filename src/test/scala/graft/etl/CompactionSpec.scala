package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def truthBins(
      files: Seq[(Long, Long)], target: Long): Map[Long, Long] = {
    // single-threaded sorted-fill reference
    var cum = 0L
    files.sortBy { case (id, b) => (-b, id) }.map { case (id, b) =>
      val bin = cum / target
      cum += b
      id -> bin
    }.toMap
  }

  test("planSortedFill matches the sequential reference on random inputs") {
    val rng = new scala.util.Random(17)
    for (trial <- 1 to 3) {
      val files = (1L to 200L).map(i => (i, 1L + rng.nextInt(5000).toLong))
      val target = 8000L
      val got = Compaction.planSortedFill(
          files.toDF("file_id", "bytes").repartition(7),
          "file_id", "bytes", target)
        .collect().map(r => r.getAs[Long]("file_id") -> r.getAs[Long]("bin"))
        .toMap
      assert(got === truthBins(files, target), s"trial $trial")
    }
  }

  test("plan is invariant to input partitioning") {
    val files = (1L to 100L).map(i => (i, (i * 37 % 900) + 10))
    val expected = Compaction.planSortedFill(
        files.toDF("file_id", "bytes").repartition(1),
        "file_id", "bytes", 2000L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    for (parts <- Seq(3, 13)) {
      val got = Compaction.planSortedFill(
          files.toDF("file_id", "bytes").repartition(parts),
          "file_id", "bytes", 2000L)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(got === expected, s"parts=$parts")
    }
  }

  test("oversized files sit alone; small-file bins fill toward target") {
    val files = Seq((1L, 10000L), (2L, 9000L)) ++
      (3L to 30L).map(i => (i, 100L))
    val plan = Compaction.planSortedFill(
      files.toDF("file_id", "bytes"), "file_id", "bytes", 1000L)
    val summary = Compaction.binSummary(plan, "bytes", 1000L)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the two big files consume bins 0..9 and 10..18 by prefix range;
    // each occupies its start bin ALONE
    assert(summary.count(_._2 == 1L) >= 2, summary.mkString(","))
    // the 28 small files (2800 bytes) pack into bins of ~10 files
    val smallBins = summary.filter(_._2 > 1)
    assert(smallBins.nonEmpty)
    assert(smallBins.map(_._3).forall(_ <= 1000L + 100L))
  }
}
