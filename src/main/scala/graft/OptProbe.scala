package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-16 optimization diagnostic: attribute wall time inside the
  * heavy query families (jaccard pair tier, CC, PageRank, spans,
  * unigram LM) by timing sub-stages in isolation and printing a
  * per-job timeline for whole queries. Throwaway-style tool in the
  * MicroBench mold; not part of the query API.
  *
  * args: <sfDir> [probe names...] (default: all probes)
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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

    // per-job timeline listener: prints description, duration, tasks
    val jobLog = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    @volatile var logJobs = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (logJobs) {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
          jobLog.put(e.jobId, (d, e.time))
        }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (logJobs) Option(jobLog.remove(e.jobId)).foreach { case (d, t0) =>
          println(f"    job ${e.jobId}%4d ${(e.time - t0) / 1000.0}%7.2fs  $d")
        }
    })
    val taskCount = new java.util.concurrent.atomic.AtomicLong(0)
    val taskMax = new java.util.concurrent.atomic.AtomicLong(0)
    val taskSum = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = if (e.taskInfo != null) e.taskInfo.duration else 0L
        taskCount.incrementAndGet(); taskSum.addAndGet(d)
        var cur = taskMax.get()
        while (d > cur && !taskMax.compareAndSet(cur, d)) cur = taskMax.get()
      }
    })
    def taskStats(label: String): Unit = {
      println(f"""  {"tasks":"$label","n":${taskCount.getAndSet(0)},"max_ms":${taskMax.getAndSet(0)},"sum_ms":${taskSum.getAndSet(0)}}""")
    }

    def sweep(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      graft.util.Blocks.releaseAll(spark)
      System.gc()
    }
    def consume(df: DataFrame): Long = {
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      0L
    }
    def timed(name: String, warm: Int = 1)(f: => Unit): Unit = {
      var i = 0
      while (i < warm) { f; sweep(); i += 1 }
      val t0 = System.nanoTime()
      f
      println(f"""  {"probe":"$name%s","sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
      sweep()
    }
    def want(n: String): Boolean = which.isEmpty || which.contains(n)

    import graft.dedup.Dedup
    import graft.text.TextAnalysis
    val docs = graft.etl.Spread.byKeyIfNarrow(
      graft.sources.Tables.documents(spark, dir), col("doc_id"))
    def shingled: DataFrame = docs
      .select(col("doc_id").as("id"), col("lang").as("blk"),
        TextAnalysis.canonical(col("text")).as("ct"))
      .select(col("id"), col("blk"), Dedup.charShinglesFrom(col("ct"), 3).as("sh"))

    if (want("jaccard_steps")) {
      println("== jaccard bitmap tier, stepwise ==")
      // step 1: shingle table materialization
      val withN = shingled.withColumn("n", size(col("sh")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("shingle_persist_count", warm = 0)(withN.count())
      val toks = withN.select(col("id"), col("blk"), col("n"),
        explode(col("sh")).as("t"))
      timed("vocab_probe", warm = 0) {
        withN.select(col("blk"), explode(col("sh")).as("t"))
          .groupBy(col("blk")).agg(approx_count_distinct(col("t")).as("v"))
          .agg(coalesce(max(col("v")), lit(0L))).head()
      }
      timed("max_docs", warm = 0) {
        withN.groupBy(col("blk")).agg(count(lit(1)).as("d"))
          .agg(coalesce(max(col("d")), lit(0L))).head()
      }
      val dict = toks.select(col("blk"), col("t")).distinct()
        .withColumn("tid",
          (row_number().over(Window.partitionBy(col("blk")).orderBy(col("t"))) - 1)
            .cast("int"))
      timed("dict_build", warm = 0)(consume(dict))
      val nbits = dict.groupBy(col("blk"))
        .agg((max(col("tid")) + 1).cast("int").as("nbits"))
      val encoded = toks.join(dict, Seq("blk", "t"))
        .groupBy(col("id"), col("blk"), col("n"))
        .agg(collect_list(col("tid")).as("tids"))
        .join(broadcast(nbits), Seq("blk"))
        .select(col("id"), col("blk"), col("n"),
          graft.expressions.BitmapOps.bitmapFromIds(col("tids"), col("nbits")).as("bm"))
      timed("encoded_build", warm = 0)(encoded.select(count(lit(1))).head())
      withN.unpersist(blocking = false)
      sweep()
      // end-to-end tiers
      timed("jaccard_auto")(consume(Dedup.jaccardJoin(shingled, 0.5)))
      timed("jaccard_bitmap")(consume(Dedup.jaccardJoin(shingled, 0.5, tier = "bitmap")))
      timed("jaccard_prefix")(consume(Dedup.jaccardJoin(shingled, 0.5, tier = "prefix")))
    }

    if (want("tiers3")) {
      println("== jaccard tiers, 3 timed reps each (interleaved) ==")
      for (rep <- 1 to 3) {
        timed(s"auto_$rep", warm = if (rep == 1) 1 else 0)(
          consume(Dedup.jaccardJoin(shingled, 0.5)))
        timed(s"bitmap_$rep", warm = if (rep == 1) 1 else 0)(
          consume(Dedup.jaccardJoin(shingled, 0.5, tier = "bitmap")))
      }
    }

    if (want("cc_pagerank")) {
      println("== CC / PageRank on pre-materialized pairs ==")
      for (rep <- 1 to 3) {
        val pairs = Dedup.jaccardJoin(shingled, 0.5, tier = "bitmap")
        val t0 = System.nanoTime()
        val c = Dedup.connectedComponents(pairs.select(col("id_a"), col("id_b")))
        consume(c)
        println(f"""  {"probe":"cc_only_$rep%d","sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
        graft.util.Blocks.release(c)
        graft.util.Blocks.release(pairs)
        sweep()
        val pairs2 = Dedup.jaccardJoin(shingled, 0.5, tier = "bitmap")
        val t1 = System.nanoTime()
        consume(graft.graph.PageRank.pageRank(
          docs.select(col("doc_id")), "doc_id",
          pairs2.select(col("id_a"), col("id_b")), iters = 2, dampPpm = 850000L))
        println(f"""  {"probe":"pagerank_only_$rep%d","sec":${(System.nanoTime() - t1) / 1e9}%.3f}""")
        graft.util.Blocks.release(pairs2)
        sweep()
      }
    }

    if (want("lazy_plan")) {
      // full lazy jaccard plan (persistIntermediate = false -> no
      // checkpoint truncation) for the plans/r16 stage-level evidence
      println("======== jaccard_lazy ========")
      Dedup.jaccardJoin(shingled, 0.5, persistIntermediate = false)
        .explain("formatted")
    }

    if (want("png_micro")) {
      println("== single-threaded PngImage.build / DHash micro ==")
      for (rep <- 1 to 3) {
        var i = 0; var bytes = 0L
        val t0 = System.nanoTime()
        while (i < 2000) {
          val b = graft.expressions.PngImage.build(
            72, 64, (1000000L + i) * 4294967296L + 3L)
          bytes += b.length
          i += 1
        }
        val bsec = (System.nanoTime() - t0) / 1e9
        var j = 0; var acc = 0L
        val imgs = (0 until 256).map(k => graft.expressions.PngImage.build(
          72, 64, (1000000L + k) * 4294967296L + 3L)).toArray
        val t1 = System.nanoTime()
        while (j < 2000) {
          acc ^= graft.expressions.DHash.compute(imgs(j & 255)).longValue()
          j += 1
        }
        val hsec = (System.nanoTime() - t1) / 1e9
        println(f"""  {"probe":"png_micro_$rep%d","build2000_sec":$bsec%.3f,"dhash2000_sec":$hsec%.3f,"avg_bytes":${bytes / 2000}%d,"acc":$acc%d}""")
      }
    }

    if (want("q150_sig")) {
      println("== q150 sig build isolated ==")
      import graft.expressions.{DHash, PngImage}
      import spark.implicits._
      val F = 8
      val base = docs
        .select(col("doc_id"),
          (expr("doc_id div 4") % 1000000000L).as("vseed"),
          (pmod(col("doc_id"), lit(4)) + 1L).as("nbase"))
      val frames = base
        .withColumn("f", explode(sequence(lit(0L), lit(F - 1L))))
        .select(
          ((col("doc_id") + 2L) * 16L + col("f")).as("id"),
          col("f"),
          (((col("vseed") * 8L + col("f")) % 1000000000L) * lit(4294967296L)
            + col("nbase") * 16L + col("f")).cast("long").as("seeds"))
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        val cp = graft.util.Blocks.checkpoint(frames.select(col("id"), col("f"),
          DHash.dhash(PngImage.pngImage(lit(72), lit(64), col("seeds"))).as("sig")))
        println(f"""  {"probe":"q150_sig_$rep%d","sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
        cp.release()
        sweep()
        val t1 = System.nanoTime()
        taskCount.set(0); taskMax.set(0); taskSum.set(0)
        val n = frames.select(col("id"),
          PngImage.pngImage(lit(72), lit(64), col("seeds")).as("p"))
          .select(sum(length(col("p")))).head().getLong(0)
        println(f"""  {"probe":"q150_png_only_$rep%d","sec":${(System.nanoTime() - t1) / 1e9}%.3f,"bytes":$n%d}""")
        taskStats(s"q150_png_only_$rep")
        sweep()
      }
    }

    // whole-query job timelines
    val timeline = args.drop(1).filter(_.startsWith("q"))
    for (q <- timeline) {
      println(s"== job timeline: $q ==")
      consume(SparkEntry.queries(q)(spark, dir)) // warm
      sweep()
      logJobs = true
      val t0 = System.nanoTime()
      consume(SparkEntry.queries(q)(spark, dir))
      println(f"  total ${(System.nanoTime() - t0) / 1e9}%.3f s")
      logJobs = false
      sweep()
    }
    spark.stop()
  }
}
