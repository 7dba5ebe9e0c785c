package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Scale probe for [[graft.dedup.Dedup.connectedComponents]]'s tier
  * split: builds the q26 similarity graph from SPARK_GRAFT_SF_DIR's
  * documents and labels it with a caller-chosen `driverTierMaxEdges`
  * — `0` (the default) FORCES the distributed fixpoint loop, the
  * 100 TB path that ordinary sf0.1/sf1 runs never exercise because
  * star contraction leaves only metadata-scale graphs that the
  * driver union-find absorbs. Prints one JSON line with the tier
  * actually taken, fixpoint rounds, contracted-graph size, wall
  * seconds (pair build vs CC), label count, and the block-manager
  * residue before/after the release sweep — the proof obligation
  * that the loop tier's checkpoint-release cycle converges at its
  * advertised cost and leaks nothing.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.CcBench [driverTierMaxEdges]
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val maxEdges = args.headOption.map(_.toInt).getOrElse(0)
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
    def residueBytes(): Long = spark.sparkContext.getRDDStorageInfo
      .map(i => i.memSize + i.diskSize).sum
    val docs = graft.etl.Spread.byKeyIfNarrow(
      graft.sources.Tables.documents(spark, sfDir), col("doc_id"))
    val t0 = System.nanoTime()
    // the exact q26 pair graph (char-3-gram Jaccard >= 0.5 per lang)
    val pairs = Dedup.jaccardJoin(
      docs.select(col("doc_id").as("id"), col("lang").as("blk"),
          TextAnalysis.canonical(col("text")).as("ct"))
        .select(col("id"), col("blk"),
          Dedup.charShinglesFrom(col("ct"), 3).as("sh")),
      threshold = 0.5)
    val tPairs = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val comp = Dedup.connectedComponents(
      pairs.select(col("id_a"), col("id_b")),
      driverTierMaxEdges = maxEdges)
    graft.util.Blocks.release(pairs)
    val nLabels = comp.count()
    val ccSec = (System.nanoTime() - t1) / 1e9
    val (tier, rounds, contractedDirected) = Dedup.lastCcDiag
    // `comp` is the operator's own eagerly-materialized result handle —
    // the only blocks a caller should see alive at this point
    val resBefore = residueBytes()
    graft.util.Blocks.releaseAll(spark)
    spark.sharedState.cacheManager.clearCache()
    System.gc()
    Thread.sleep(500) // let the ContextCleaner drain
    val resAfter = residueBytes()
    println(s"""{"tier":"$tier","rounds":$rounds,"contracted_directed_edges":$contractedDirected,"driver_tier_max_edges":$maxEdges,"pairs_sec":${graft.util.Fmt.f3(tPairs)},"cc_sec":${graft.util.Fmt.f3(ccSec)},"labels":$nLabels,"residue_before_release_bytes":$resBefore,"residue_after_release_bytes":$resAfter,"sf":"$sfDir"}""")
    spark.stop()
  }
}
