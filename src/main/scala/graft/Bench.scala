package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: times every registered query against
  * SPARK_GRAFT_SF_DIR and emits ONE JSON line. A failing query is
  * reported with "ok": false and does NOT masquerade as a fast time —
  * its elapsed value is set to -1.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, if (ok) sec else -1.0, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val oks = results.map { case (k, _, ok) => "\"" + k + "\":" + ok }
      .mkString("{", ",", "}")
    val total = results.filter(_._3).map(_._2).sum
    val nFail = results.count(!_._3)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"ok":$oks,"failed":$nFail,"sf":"$sfDir"}""")
    spark.stop()
  }
}
