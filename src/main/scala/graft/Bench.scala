package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, xxhash64}
/** Benchmark main: times every registered query against
  * SPARK_GRAFT_SF_DIR and emits ONE JSON line. A failing query is
  * reported with "ok": false and does NOT masquerade as a fast time —
  * its elapsed value is set to -1.
  *
  * Each query runs SPARK_GRAFT_RUNS times (default 3) after one
  * discarded warm-up run, and reports the MEDIAN — single-shot numbers
  * at toy scale swing 2-3× with GC/AQE/page-cache noise, drowning real
  * regressions. Per-query relative spread (max−min)/median goes to
  * "spread". Between runs BOTH storage layers are swept: the Dataset
  * cache (`clearCache`) AND every RDD-level block set
  * ([[graft.util.Blocks.releaseAll]]) — local-checkpoint blocks from
  * iterative operators live at the RDD level, invisible to
  * `clearCache`, and their accumulation across an 82-query suite
  * measurably doubled total wall time before the sweep existed.
  *
  * BENCH_SELF.json additionally records, per query: `gc_ms` (JVM
  * GC-time delta across the query's runs) and `storage_residue_bytes`
  * (max block-manager bytes the query left behind before the sweep) —
  * so a suite-pressure dispute is diagnosable from the artifact.
  *
  * Optional args name a subset of queries to run (default: all).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // CPU-heavy interpreted stages (array intersects, shingle
      // transforms) are tiny by bytes; stop AQE from coalescing them
      // onto one core
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warm-up so the first timed query doesn't absorb
    // session start-up cost
    spark.range(100000).selectExpr("sum(id % 7)").collect()
    // Consume by hashing EVERY output column into one aggregate: a bare
    // count() lets Catalyst prune unreferenced projections, so a
    // projection-only query (e.g. the per-doc filter verdicts) would be
    // timed as a row count of its scan. The hash forces the full result
    // to be computed while the final ORDER BY still collapses
    // (EliminateSorts) exactly as under count().
    def consume(df: DataFrame): Unit =
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).collect()
    val selected =
      if (args.nonEmpty) SparkEntry.queries.filter(kv => args.contains(kv._1))
      else SparkEntry.queries
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    def gcMillis(): Long = ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // run 0 is warm-up (codegen compile, shuffle-file + page cache):
      // discarded from the stats
      val gc0 = gcMillis()
      var residue = 0L
      val times = (0 to runs).flatMap { run =>
        val t0 = System.nanoTime()
        val ok =
          try { consume(fn(spark, sfDir)); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        // what this run left in the block manager (cache + checkpoint
        // blocks) — the suite-pressure signal — then sweep BOTH layers
        residue = math.max(residue,
          spark.sparkContext.getRDDStorageInfo
            .map(i => i.memSize + i.diskSize).sum)
        spark.sharedState.cacheManager.clearCache()
        graft.util.Blocks.releaseAll(spark)
        if (ok && run > 0) Some(sec) else None
      }
      val gcDelta = gcMillis() - gc0
      if (times.isEmpty) (name, -1.0, -1.0, false, residue, gcDelta)
      else {
        val sorted = times.sorted
        val median = sorted(sorted.size / 2)
        val spread = if (median > 0) (sorted.last - sorted.head) / median else 0.0
        (name, median, spread, true, residue, gcDelta)
      }
    }
    // The driver captures a bounded TAIL of stdout: the round-4 line
    // (full-precision medians + per-query spread and ok maps) overran it
    // and the artifact truncated mid-JSON with "parsed": null. Keep the
    // stdout line COMPACT (3-decimal medians, failures as a list, one
    // spread summary) so it always parses, and write the full-precision
    // per-query detail to BENCH_SELF.json for regression diffs.
    val qs = results.map { case (k, v, _, _, _, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.filter(_._4).map(_._2).sum
    val nFail = results.count(!_._4)
    val failedList = results.filter(!_._4).map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    val (spreadMaxQ, spreadMax) = results.map(r => (r._1, r._3))
      .maxBy(_._2)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"failed":$nFail,"failed_queries":$failedList,"spread_max":${f"$spreadMax%.3f"},"spread_max_q":"$spreadMaxQ","sf":"$sfDir"}""")
    val detail = results.map { case (k, v, s, ok, res, gc) =>
      s""""$k":{"median_sec":$v,"spread":${f"$s%.3f"},"ok":$ok,"storage_residue_bytes":$res,"gc_ms":$gc}"""
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_SELF.json"),
      s"""{"total_sec":$total,"runs":$runs,"failed":$nFail,"sf":"$sfDir","queries":$detail}""".getBytes("UTF-8"))
    spark.stop()
  }
}
