package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the snapshot-bloom tier handover for
  * [[graft.dedup.Dedup.bloomDedupAgainstSnapshot]]: for a synthetic
  * snapshot of N fingerprints and a batch with a few-percent dup rate,
  * times each dispatch tier end-to-end (filter build + probe +
  * confirm anti-join) and prints one JSON line per (N, tier). The
  * numbers behind BENCH_NOTES' tier table and the `MaxKeysPerBloom` /
  * `LadderMaxRanges` constants.
  *
  * Tiers: `single` (one corpus-wide plan-constant filter), `ladder-R`
  * (R per-range filters in one CASE expression), `local-R` (R filters
  * probed executor-locally via the co-partitioned zipPartitions path).
  *
  * Usage: `runMain graft.BloomBench [snapshotSizes...]` (default
  * 1e6 2e6 5e6 1e7 2e7); batch is fixed at 200k rows, 3% dup rate.
  */
object BloomBench {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toDouble.toLong)
      else Seq(1000000L, 2000000L, 5000000L, 10000000L, 20000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.Dedup

    val batchN = 200000L
    // discarded warm-up: codegen + parquet writer/reader + RDD paths
    locally {
      val wSnap = spark.range(1000L).select(graft.text.TextAnalysis
        .fingerprint(concat(lit("doc"), col("id"))).as("fp"))
      val wBatch = spark.range(1000L)
        .select(col("id"), concat(lit("doc"), col("id")).as("text"))
      for ((r, lm) <- Seq((1, 16), (4, 16), (4, 0)))
        Dedup.bloomDedupAgainstSnapshot(wBatch, "id", "text", wSnap,
          expectedItems = 1000L, ranges = r, ladderMaxRanges = lm).count()
    }
    for (n <- sizes) {
      // snapshot fps in the PRODUCTION fingerprint space
      // (md5(canonical(text))) so the batch's planted 3% dup tail
      // really collides
      val snap = spark.range(n)
        .select(graft.text.TextAnalysis
          .fingerprint(concat(lit("doc"), col("id"))).as("fp"))
      val batch = spark.range(batchN)
        .select(col("id"),
          when(col("id") < (batchN * 97 / 100),
              concat(lit("fresh"), col("id")))
            .otherwise(concat(lit("doc"), col("id"))).as("text"))
      snap.write.mode("overwrite").parquet("/tmp/bloomknee/snap")
      batch.write.mode("overwrite").parquet("/tmp/bloomknee/batch")
      val snapFps = spark.read.parquet("/tmp/bloomknee/snap")
      val batchP = spark.read.parquet("/tmp/bloomknee/batch")
      def time(tier: String, ranges: Int, ladderMax: Int): Unit = {
        // fresh run each time; cache nothing
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val out = Dedup.bloomDedupAgainstSnapshot(
          batchP, "id", "text", snapFps,
          expectedItems = n, ranges = ranges, ladderMaxRanges = ladderMax)
        val rows = out.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(s"""{"bench":"bloom_tier","snapshot":$n,"tier":"$tier","ranges":$ranges,"sec":${graft.util.Fmt.f2(sec)},"out_rows":$rows}""")
      }
      time("single", 1, 16)
      time("ladder-4", 4, 16)
      time("local-4", 4, 0)
      time("local-16", 16, 0)
    }
    spark.stop()
  }
}
