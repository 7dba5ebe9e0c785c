package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave, bit-by-bit. */
  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zvalue matches the reference interleave on random points") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(200)((rnd.nextInt(1 << 12).toLong, rnd.nextInt(1 << 12).toLong))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", ZOrder.zvalue($"x", $"y", 12).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((x, y) <- pts)
      assert(got((x, y)) === mortonRef(x, y, 12), s"($x, $y)")
  }

  test("zvalueN: 3-D round-robin interleave matches the reference; 2-D delegates") {
    def ref(vals: Seq[Long], bits: Int): Long = {
      val m = vals.size
      vals.zipWithIndex.foldLeft(0L) { case (acc, (v, j)) =>
        (0 until bits).foldLeft(acc) { (a, i) =>
          a | (((v >> i) & 1L) << (i * m + j))
        }
      }
    }
    val rnd = new scala.util.Random(21)
    val pts = Seq.fill(100)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong,
      rnd.nextInt(256).toLong))
    val got = pts.toDF("a", "b", "c")
      .select($"a", $"b", $"c",
        ZOrder.zvalueN(Seq($"a", $"b", $"c"), 8).as("z3"),
        ZOrder.zvalueN(Seq($"a", $"b"), 8).as("z2"),
        ZOrder.zvalue($"a", $"b", 8).as("z2d"))
      .collect()
    for (r <- got) {
      val (a, b, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) === ref(Seq(a, b, c), 8), s"3-D ($a,$b,$c)")
      assert(r.getLong(4) === r.getLong(5), "2-D zvalue must equal zvalueN")
    }
  }

  test("zvalue corners: (0,0)=0, x-only fills even bits, y-only odd bits") {
    val r = Seq((0L, 0L, 255L)).toDF("zero", "z2", "m")
      .select(
        ZOrder.zvalue($"zero", $"zero", 8),
        ZOrder.zvalue($"m", $"zero", 8),     // x=11111111 -> 0101...01
        ZOrder.zvalue($"zero", $"m", 8))     // y=11111111 -> 1010...10
      .head()
    assert(r.getLong(0) === 0L)
    assert(r.getLong(1) === 0x5555L)
    assert(r.getLong(2) === 0xAAAAL)
  }

  test("fileStats boxes are exhaustive, disjoint by file, and skip-effective") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(4000)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val df = pts.toDF("x", "y")
    val stats = ZOrder.fileStats(df, "x", "y", bits = 8, fileBits = 4).collect()
    assert(stats.map(_.getAs[Long]("n_rows")).sum === 4000L)
    // each file is one z-prefix: its box must be the prefix's quadrant,
    // so with fileBits=4 every box spans at most 1/4 of each axis
    for (r <- stats) {
      assert(r.getAs[Long]("x_max") - r.getAs[Long]("x_min") < 256 / 4 * 2,
        s"x box too wide: $r")
      assert(r.getAs[Long]("y_max") - r.getAs[Long]("y_min") < 256 / 4 * 2,
        s"y box too wide: $r")
    }
    // skipping: a narrow x predicate must prune most files on min/max
    val lo = 32L; val hi = 47L
    val pruned = stats.count(r =>
      r.getAs[Long]("x_max") < lo || r.getAs[Long]("x_min") > hi)
    assert(pruned.toDouble / stats.length >= 0.5,
      s"only $pruned/${stats.length} files prunable")
  }

  test("fileStats quarantines out-of-domain rows under NULL file_id") {
    // 300 and -5 are outside [0, 256): they must NOT alias into a real
    // curve cell and inflate its bounding box
    val df = Seq((3L, 4L), (300L, 4L), (-5L, 4L), (3L, 5L))
      .toDF("x", "y")
    val stats = ZOrder.fileStats(df, "x", "y", bits = 8, fileBits = 4)
      .collect()
    val (bad, good) = stats.partition(_.isNullAt(0))
    assert(bad.length === 1 && bad.head.getAs[Long]("n_rows") === 2L)
    assert(good.map(_.getAs[Long]("n_rows")).sum === 2L)
    // the real file's box stays tight: only the in-domain points
    for (r <- good) {
      assert(r.getAs[Long]("x_min") >= 0L && r.getAs[Long]("x_max") < 256L)
    }
  }

  test("layout yields z-sorted partitions covering all rows") {
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(1000)((rnd.nextInt(64).toLong, rnd.nextInt(64).toLong))
      .toDF("x", "y")
    val laid = ZOrder.layout(df, "x", "y", bits = 6, numFiles = 8)
    assert(laid.count() === 1000L)
    // within every partition the zval sequence is non-decreasing
    val perPart = laid.select($"zval")
      .withColumn("pid", spark_partition_id())
      .collect().groupBy(_.getAs[Int]("pid"))
      .map { case (_, rows) => rows.map(_.getAs[Long]("zval")).toSeq }
    for (zs <- perPart) assert(zs === zs.sorted)
  }

  test("skippingScan prunes files by bounding box — measured numFiles gate") {
    val rnd = new scala.util.Random(13)
    val data = Seq.fill(4000)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val df = data.toDF("x", "y").repartition(6)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-zorder").toString + "/layout"
    ZOrder.writeLayout(df, "x", "y", bits = 8, fileBits = 6, path = dir)
    val stats = ZOrder.fileStats(df, "x", "y", bits = 8, fileBits = 6)

    val (xLo, xHi, yLo, yHi) = (32L, 47L, 0L, 255L)
    val scan = ZOrder.skippingScan(
      spark, dir, stats, "x", "y", xLo, xHi, yLo, yHi)
    val got = scan.select($"x", $"y").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = data
      .filter { case (x, y) => x >= xLo && x <= xHi && y >= yLo && y <= yHi }
      .sorted
    assert(got === want, "skipping scan lost or invented rows")

    // the measured gate: the executed scan READ fewer files than the
    // layout holds — pruning happened in the file index, not post-scan
    val leafMetrics = scan.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles")).map(_.value)
    assert(leafMetrics.nonEmpty, scan.queryExecution.executedPlan.toString)
    val filesRead = leafMetrics.sum
    val totalFiles = stats.where($"file_id".isNotNull).count()
    assert(filesRead < totalFiles,
      s"selective box read $filesRead of $totalFiles files — no skipping")
    // an x-slice of 16/256 columns touches only curve segments whose
    // boxes cross it; on uniform data that is a strict minority
    assert(filesRead.toDouble / totalFiles <= 0.5,
      s"read $filesRead of $totalFiles — weaker pruning than the layout promises")
    // and the pruned id set is exactly what the boxes said survives
    val kept = ZOrder.overlappingFiles(stats, xLo, xHi, yLo, yHi)
    assert(filesRead <= kept.size,
      s"scan read $filesRead files but only ${kept.size} ids survived the boxes")
  }
}
