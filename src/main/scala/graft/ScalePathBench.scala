package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement harness for SCALE-PATH configurations of
  * edge/label-source-agnostic operators — the q132 split fed by the
  * cluster-first collapse labels instead of the gate-scale exact pair
  * tier, and the q135 PageRank fed by the persisted kNN edge store
  * instead of the exact Jaccard pairs. Prints one JSON line per
  * configuration. args: <sfDir> [split|pagerank|all] */
object ScalePathBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf10")
    val which = args.lift(1).getOrElse("all")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def sweep(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      graft.util.Blocks.releaseAll(spark)
      System.gc()
    }
    def timed(metric: String, run: () => Long): Unit = {
      run() // warm-up pass (JIT/codegen), then the timed pass
      sweep()
      val t0 = System.nanoTime()
      val n = run()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"$metric%s","sf":"$dir%s","rows":$n%d,"sec":$sec%.2f}""")
      sweep()
    }

    if (which == "all" || which == "split") {
      val docs = graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      timed("q132_scale_path_cluster_first", () => {
        val labels = graft.dedup.Dedup.nearDupCollapse(
          docs, "doc_id", "text", threshold = 0.5)
        graft.curate.Curation.leakageSafeSplit(
            docs.select(col("doc_id")), "doc_id",
            labels.select(col("id"), col("comp")),
            Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
          .groupBy(col("split")).agg(count(lit(1)).as("n"))
          .collect().map(_.getLong(1)).sum
      })
    }

    if (which == "all" || which == "pagerank") {
      // q135's corpus-scale configuration: the edge set comes from the
      // persisted kNN edge store (built ONCE, shared by q123/q126/q135
      // in a real pipeline), symmetrized to undirected distinct pairs.
      // Build and consumer are timed separately — the store's whole
      // point is that consumers never re-pay the build.
      val e = graft.etl.Spread.byKeyIfNarrow(
          graft.sources.Tables.embeddings(spark, dir), col("vec_id"))
        .select(col("vec_id"), col("embedding"))
      val dim = e.select(size(col("embedding")).as("d")).head().getInt(0)
      val store = java.nio.file.Files
        .createTempDirectory("graft-spb-edges-").toString
      timed("q135_scale_path_edge_build", () => {
        graft.sim.KnnEdgeStore.buildVersion(e, "vec_id", "embedding",
          dim, k = 8, store = store, version = 1L, numTables = 8,
          maxBucketSize = 2000)
        graft.sim.KnnEdgeStore.readLatest(spark, store).count()
      })
      timed("q135_scale_path_pagerank_consumer", () => {
        val edges = graft.sim.KnnEdgeStore.readLatest(spark, store)
          .select(
            least(col("query_id"), col("neighbor_id")).as("id_a"),
            greatest(col("query_id"), col("neighbor_id")).as("id_b"))
          .distinct()
        graft.graph.PageRank.pageRank(
            e.select(col("vec_id")), "vec_id", edges,
            iters = 2, dampPpm = 850000L)
          .agg(sum(col("pr_micro"))).collect().head.getLong(0)
      })
    }
    spark.stop()
  }
}
