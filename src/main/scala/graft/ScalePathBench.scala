package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement harness for SCALE-PATH configurations of
  * label-source-agnostic operators — currently the q132 split fed by
  * the cluster-first collapse labels instead of the gate-scale exact
  * pair tier. Prints one JSON line per configuration. */
object ScalePathBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    // warm-up pass (JIT/codegen), then the timed pass
    def run(): Long = {
      val labels = graft.dedup.Dedup.nearDupCollapse(
        docs, "doc_id", "text", threshold = 0.5)
      graft.curate.Curation.leakageSafeSplit(
          docs.select(col("doc_id")), "doc_id",
          labels.select(col("id"), col("comp")),
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        .groupBy(col("split")).agg(count(lit(1)).as("n"))
        .collect().map(_.getLong(1)).sum
    }
    run()
    spark.sharedState.cacheManager.clearCache()
    graft.util.Blocks.releaseAll(spark)
    System.gc()
    val t0 = System.nanoTime()
    val n = run()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"q132_scale_path_cluster_first","sf":"$dir%s","rows":$n%d,"sec":$sec%.2f}""")
    spark.stop()
  }
}
