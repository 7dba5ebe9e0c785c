package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),   // close to 1
    (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),   // orthogonal to 1
    (4L, Seq(1.0f, 0.0f, 0.0f, 0.0f))    // identical to 1
  ).toDF("vec_id", "embedding")

  test("cosine kernel: identical -> 1, orthogonal -> 0") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0), Seq(-2.0, 1.0)))
      .toDF("a", "b", "c")
    val r = df.select(
      Ann.cosine(col("a"), col("b")), Ann.cosine(col("a"), col("c"))).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("bruteForceTopK ranks the identical vector first") {
    val out = Ann.bruteForceTopK(
        vecs.where($"vec_id" === 1), vecs, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank")))
    assert(out.head === ((4L, 1)))          // identical vector
    assert(out(1)._1 === 2L)                // near vector second
    assert(out.last._1 === 3L)              // orthogonal last
  }

  test("nearDupPairs finds only the identical pair at 0.9999 within block") {
    val blocked = vecs.withColumn("label", lit(0))
    val pairs = Ann.nearDupPairs(blocked, "vec_id", "embedding", "label", 0.9999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 4L)))
    // at 0.99 the (0.9, 0.1) vector also qualifies (cos = 0.9939)
    val loose = Ann.nearDupPairs(blocked, "vec_id", "embedding", "label", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose === Set((1L, 4L), (1L, 2L), (2L, 4L)))
  }

  test("nearDupPairsLsh recovers planted identical pair across tables, capped") {
    // identical vectors collide in EVERY table, so the planted (1, 4)
    // pair must survive any numPlanes/numTables choice
    val pairs = Ann.nearDupPairsLsh(vecs, "vec_id", "embedding",
        dim = 4, numPlanes = 6, threshold = 0.9999, numTables = 4,
        maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 4L)))
  }

  test("nearDupPairsLsh emits each pair once despite multi-table collisions") {
    val rows = Ann.nearDupPairsLsh(vecs, "vec_id", "embedding",
        dim = 4, numPlanes = 2, threshold = 0.0, numTables = 8,
        maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === rows.toSet.size)
  }

  test("nearDupPairs maxBlockSize drops degenerate blocks") {
    val blocked = vecs.withColumn("label", lit(0))
    // all 4 rows share one block; cap at 3 -> block dropped -> no pairs
    val capped = Ann.nearDupPairs(blocked, "vec_id", "embedding", "label",
      0.0, maxBlockSize = 3)
    assert(capped.count() === 0L)
    // cap >= block size -> unchanged
    val kept = Ann.nearDupPairs(blocked, "vec_id", "embedding", "label",
      0.9999, maxBlockSize = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept === Set((1L, 4L)))
  }

  test("capPairsPerId bounds output per id, keeps strongest pairs, planted survives") {
    // a dense near-identical cluster: 8 copies of one direction with
    // tiny per-id noise — the quadratic-pair corpus shape in miniature
    val cluster = (1L to 8L).map { i =>
      (i, Seq(1.0f, 0.001f * i, 0.0f, 0.0f))
    } :+ (100L, Seq(0.0f, 0.0f, 1.0f, 0.0f))
    val df = cluster.toDF("vec_id", "embedding").withColumn("label", lit(0))
    val uncapped = Ann.nearDupPairs(df, "vec_id", "embedding", "label", 0.9)
    assert(uncapped.count() === 28L) // 8 choose 2: the quadratic term
    val capped = Ann.nearDupPairs(df, "vec_id", "embedding", "label", 0.9,
      maxPairsPerId = 2)
    val rows = capped.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // declared bound: at most 2 pairs per lower id
    val perA = rows.groupBy(_._1).view.mapValues(_.length)
    assert(perA.values.forall(_ <= 2), perA.toMap.toString)
    assert(rows.length <= 2 * 8)
    // deterministic: strongest-cosine-first with id tiebreak — re-run
    // identical
    val again = capped.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.sorted.toSeq === again.sorted.toSeq)
    // an IDENTICAL planted pair (cos 1.0) always survives the cap even
    // when its id has more partners than the cap admits
    val planted = (cluster :+ (0L, Seq(1.0f, 0.001f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding").withColumn("label", lit(0))
    val p = Ann.nearDupPairs(planted, "vec_id", "embedding", "label", 0.9,
      maxPairsPerId = 1).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(p.contains((0L, 1L)), p.mkString(","))
  }

  test("lshBucket table=0 matches the legacy single-table planes") {
    val df = vecs.select(
      Ann.lshBucket(col("embedding"), 4, 6).as("legacy"),
      Ann.lshBucket(col("embedding"), 4, 6, table = 0).as("t0"),
      Ann.lshBucket(col("embedding"), 4, 6, table = 1).as("t1"))
    val rows = df.collect()
    assert(rows.forall(r => r.getLong(0) === r.getLong(1)))
    // independent tables must produce a different bucketing somewhere
    assert(rows.exists(r => r.getLong(0) !== r.getLong(2)))
  }

  test("ivfTopK finds the identical vector with enough probes") {
    val out = Ann.ivfTopK(
        vecs.where($"vec_id" === 1), vecs, "vec_id", "embedding",
        k = 3, numCentroids = 2, nProbe = 2)
      .orderBy("rank").collect()
    assert(out.nonEmpty)
    assert(out.head.getAs[Long]("neighbor_id") === 4L)
  }

  test("semanticDedupPairs: identical pair survives any centroid geometry") {
    for (nc <- Seq(1, 2, 4)) {
      val pairs = Ann.semanticDedupPairs(vecs, "vec_id", "embedding",
          threshold = 0.9999, numCentroids = nc)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // identical vectors rank every centroid identically -> always blocked
      // together; no duplicate pair rows despite multi-probe assignment
      assert(pairs.toSet === Set((1L, 4L)), s"numCentroids=$nc")
      assert(pairs.length === 1, s"numCentroids=$nc emitted duplicates")
    }
  }

  test("semanticDedupPairs soft assignment recovers a boundary pair") {
    // two tight groups plus a pair straddling them: hard assignment
    // (probe=1) can split (10, 11); probe=2 must compare them
    val straddle = Seq(
      (10L, Seq(1.0f, 0.02f, 0f, 0f)), (11L, Seq(0.02f, 1.0f, 0f, 0f)),
      (20L, Seq(1.0f, 0f, 0f, 0f)), (21L, Seq(0.98f, 0.01f, 0f, 0f)),
      (30L, Seq(0f, 1.0f, 0f, 0f)), (31L, Seq(0.01f, 0.98f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val got = Ann.semanticDedupPairs(straddle, "vec_id", "embedding",
        threshold = 0.0, numCentroids = 2, assignProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((10L, 11L)), s"boundary pair missed: $got")
  }

  test("lshTopK agrees with brute force for the identical-vector top hit") {
    val out = Ann.lshTopK(
        vecs.where($"vec_id" === 1), vecs, "vec_id", "embedding",
        dim = 4, numPlanes = 2, k = 3)
      .orderBy("rank").collect()
    assert(out.nonEmpty)
    assert(out.head.getAs[Long]("neighbor_id") === 4L)
  }

  test("pqTopK ranks the identical vector first (minimal ADC)") {
    val out = Ann.pqTopK(
        vecs.where($"vec_id" === 1), vecs, "vec_id", "embedding",
        dim = 4, k = 3, m = 2, ksub = 2, sampleSize = 4)
      .orderBy("rank").collect()
    assert(out.nonEmpty)
    // vec 4 is identical to the query: its codes equal the query's own
    // argmin codes, so ADC(q, 4) is the query's self-quantization error
    // — provably minimal. Vec 2 quantizes to the SAME codes (that is
    // what compression means), so it ties at the minimal ADC and the
    // smaller id wins rank 1; the guarantee is "an ADC-minimal
    // neighbor ranks first", which is why the planted corpus doc uses
    // the corpus-minimal id.
    val top = out.head
    assert(Set(2L, 4L).contains(top.getAs[Long]("neighbor_id")))
    val distOf = out.map(r =>
      r.getAs[Long]("neighbor_id") -> r.getAs[Double]("adc_dist")).toMap
    assert(distOf(4L) === top.getAs[Double]("adc_dist"))
  }

  test("pqTopK recall vs brute force on clustered vectors") {
    // three tight clusters of 8; top-3 of any member should be members
    // of its own cluster under PQ too
    val rng = new scala.util.Random(11)
    def cluster(center: Array[Float], base: Long) =
      (0 until 8).map { i =>
        (base + i, center.toSeq.map(_ + (rng.nextFloat() - 0.5f) * 0.1f))
      }
    val data = (cluster(Array(10f, 0f, 0f, 0f), 0L) ++
      cluster(Array(0f, 10f, 0f, 0f), 100L) ++
      cluster(Array(0f, 0f, 10f, 0f), 200L)).toDF("vec_id", "embedding")
    val got = Ann.pqTopK(data.where($"vec_id" === 101), data,
        "vec_id", "embedding", dim = 4, k = 3, m = 2, ksub = 4,
        sampleSize = 24)
      .collect().map(_.getAs[Long]("neighbor_id"))
    assert(got.length === 3)
    assert(got.forall(id => id >= 100L && id < 200L), got.toSeq)
  }

  test("trainPqCodebook is deterministic") {
    val a = Ann.trainPqCodebook(vecs, "vec_id", "embedding", 2, 2, 2)
    val b = Ann.trainPqCodebook(vecs, "vec_id", "embedding", 2, 2, 2)
    assert(a.toSeq === b.toSeq)
    assert(a.length === 2 * 2 * 2)
  }

  test("knnGraph: every node gets edges, identical pair is mutual rank-1") {
    val out = Ann.knnGraph(vecs, "vec_id", "embedding", dim = 4,
      k = 2, numTables = 4, numPlanes = 2).collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    // identical vectors 1 and 4 co-bucket in every table: mutual rank-1
    assert(byQ(1L).find(_.getAs[Int]("rank") == 1).get
      .getAs[Long]("neighbor_id") == 4L)
    assert(byQ(4L).find(_.getAs[Int]("rank") == 1).get
      .getAs[Long]("neighbor_id") == 1L)
    // degree bounded by k, no self-edges
    byQ.values.foreach(es => assert(es.length <= 2))
    assert(out.forall(r =>
      r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
  }

  test("contrastiveTriples: in-band positive + hardest sub-band negative per anchor") {
    val s = math.sqrt(1 - 0.98 * 0.98).toFloat
    val tri = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),            // anchor
      (2L, Seq(0.98f, s, 0.0f, 0.0f)),              // cos .98 -> positive
      (3L, Seq(0.5f, 0.8660254f, 0.0f, 0.0f)),      // cos .5  -> in no band
      (4L, Seq(0.2f, 0.9797959f, 0.0f, 0.0f))       // cos .2  -> negative
    ).toDF("vec_id", "embedding")
    val out = Ann.contrastiveTriples(tri, "vec_id", "embedding", dim = 4,
        posLo = 0.8, posHi = 0.99, negHi = 0.4,
        k = 3, numTables = 8, numPlanes = 1)
      .collect().map(r => r.getAs[Long]("anchor_id") ->
        (r.getAs[Long]("pos_id"), r.getAs[Double]("pos_cos"),
          r.getAs[Long]("neg_id"), r.getAs[Double]("neg_cos"))).toMap
    val (posId, posCos, negId, negCos) = out(1L)
    assert(posId === 2L && math.abs(posCos - 0.98) < 1e-3)
    assert(negId === 4L && math.abs(negCos - 0.2) < 1e-3)
    // vec 3 (cos .5) is in neither band: never a positive nor a negative of 1
    assert(!out.contains(3L) || out(3L)._1 != 1L)
  }

  test("contrastiveTriples: anchors missing either side are dropped") {
    // only two far-apart vectors: no in-band positive exists for either
    val two = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Ann.contrastiveTriples(two, "vec_id", "embedding", dim = 4,
      posLo = 0.8, posHi = 0.99, negHi = 0.4,
      k = 2, numTables = 8, numPlanes = 1)
    assert(out.count() === 0L)
  }

  test("knnGraph edges are symmetric candidates: both directions scored equally") {
    val out = Ann.knnGraph(vecs, "vec_id", "embedding", dim = 4,
      k = 3, numTables = 4, numPlanes = 1).collect()
    val score = out.map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cos_sim")).toMap
    for (((a, b), s) <- score; if score.contains((b, a)))
      assert(score((b, a)) == s, s"asymmetric score for $a<->$b")
  }
}
