package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, xxhash64}

/** Per-pass warm-up ramp probe for ONE registered query: runs it
  * `SPARK_GRAFT_RUNS` (default 4) times in a single fresh JVM and
  * prints one JSON line with EVERY pass's wall seconds in order —
  * the per-pass detail [[Bench]] (which reports median/min across
  * interleaved passes) deliberately hides. This is the tool behind
  * the "fresh-JVM first pass ≤ 2× warm median" checks in
  * BENCH_NOTES: a monotone decay across passes with healthy host
  * probes is driver-side planning/JIT ramp, not executor work.
  *
  * Usage: runMain graft.Ramp <query_name>
  */
object Ramp {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: Ramp <query_name>")
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id % 7)").collect()
    val q = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query: $name"))
    def consume(df: DataFrame): Unit =
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).collect()
    def hostProbe(): Double = {
      val t0 = System.nanoTime()
      var s = 0L; var i = 0L
      while (i < 50000000L) { s += i ^ (s >>> 7); i += 1 }
      if (s == 42) println("")
      (System.nanoTime() - t0) / 1e9
    }
    val passes = (1 to runs).map { _ =>
      val probe = hostProbe()
      val t0 = System.nanoTime()
      consume(q(spark, sfDir))
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      graft.util.Blocks.releaseAll(spark)
      System.gc()
      (sec, probe)
    }
    val secs = passes.map(p => graft.util.Fmt.f3(p._1)).mkString("[", ",", "]")
    val probes = passes.map(p => graft.util.Fmt.f3(p._2)).mkString("[", ",", "]")
    println(s"""{"query":"$name","pass_sec":$secs,"host_probe_sec":$probes,"sf":"$sfDir"}""")
    spark.stop()
  }
}
