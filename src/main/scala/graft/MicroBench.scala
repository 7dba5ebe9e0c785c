package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway-style diagnostic: isolate stages of the MinHash collapse
  * to attribute wall time (native char-shingle kernel vs interpreted
  * transform). args: <sfDir> */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.etl.Spread.byKeyIfNarrow(
        graft.sources.Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), col("text"))

    def timed(name: String)(f: => Long): Unit = {
      f // warm-up
      val t0 = System.nanoTime()
      val n = f
      println(f"""{"stage":"$name%s","rows":$n%d,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }

    val nativeSh = docs.select(col("doc_id").as("id"),
      graft.expressions.CharNGrams.charNGrams(
        graft.text.TextAnalysis.canonical(col("text")), 3).as("sh"))
    val legacySh = docs.select(col("doc_id").as("id"),
      array_distinct(transform(
        sequence(lit(1), greatest(
          length(graft.text.TextAnalysis.canonical(col("text"))) - 2, lit(1))),
        i => graft.text.TextAnalysis.canonical(col("text")).substr(i, lit(3))))
        .as("sh"))

    timed("native_shingles_count")(
      nativeSh.select(explode(col("sh"))).count())
    timed("legacy_shingles_count")(
      legacySh.select(explode(col("sh"))).count())
    timed("native_signatures")(
      graft.dedup.Dedup.minHashSignaturesFromShingles(nativeSh, 32).count())
    timed("legacy_signatures")(
      graft.dedup.Dedup.minHashSignaturesFromShingles(legacySh, 32).count())
    def sweep(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      graft.util.Blocks.releaseAll(spark)
      System.gc()
    }
    sweep()
    timed("native_collapse")(
      graft.dedup.Dedup.nearDupCollapseFromShingles(nativeSh,
        numPerm = 32, bands = 8, threshold = 0.5).count())
    sweep()
    timed("legacy_collapse")(
      graft.dedup.Dedup.nearDupCollapseFromShingles(legacySh,
        numPerm = 32, bands = 8, threshold = 0.5).count())
    sweep()
    spark.stop()
  }
}
