package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity: cosine kernels, embedding near-dup detection,
  * brute-force top-k and an LSH-bucketed approximate path.
  *
  * The cosine kernel is a sequential left-to-right double fold
  * (`aggregate` over `zip_with`) so results are bit-deterministic and
  * reproducible by any engine that folds in index order — which makes the
  * exact variants oracle-checkable.
  */
object Ann {

  /** dot(a, b) folded left-to-right in double precision — the native
    * codegen'd kernel ([[graft.expressions.DotProduct]]); bit-identical
    * to the `aggregate(zip_with(...))` fold it replaces. */
  def dot(a: Column, b: Column): Column =
    graft.expressions.DotProduct.dotProduct(a, b)

  /** cosine(a, b) = dot(a,b) / sqrt(dot(a,a) * dot(b,b)). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))

  /** Precompute the self-inner-product once per row so pairwise cosine
    * only needs one dot per pair. */
  def withNorm(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("self_dot", dot(col(vecCol), col(vecCol)))

  /** Embedding near-duplicate pairs within blocks: candidate pairs share
    * `blockCol` (e.g. a cluster/label or an LSH bucket) and have cosine ≥
    * threshold. Blocking keys the shuffle, so the pair space is per-block
    * local — the 100 TB path swaps the label block for the multi-table
    * LSH of [[nearDupPairsLsh]]. `maxBlockSize` drops degenerate blocks
    * (a block of b rows costs b² pairs; an uncapped hot block is the
    * classic quadratic scale-killer — same guard as
    * [[graft.dedup.Dedup]]'s bucket cap). */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      threshold: Double,
      maxBlockSize: Int = Int.MaxValue,
      maxPairsPerId: Int = Int.MaxValue): DataFrame = {
    val n = withNorm(
      graft.dedup.Dedup.capBuckets(
        df.select(col(idCol).as("id"), col(vecCol).as("v"), col(blockCol).as("blk")),
        maxBlockSize, Seq("blk")),
      "v")
    val pairs = n.as("l")
      .join(n.as("r"), col("l.blk") === col("r.blk") && col("l.id") < col("r.id"))
      .withColumn(
        "cos_sim",
        dot(col("l.v"), col("r.v")) / sqrt(col("l.self_dot") * col("r.self_dot")))
      .where(col("cos_sim") >= threshold)
      .select(
        col("l.id").as("id_a"), col("r.id").as("id_b"),
        round(col("cos_sim"), 6).as("cos_sim"))
    capPairsPerId(pairs, maxPairsPerId)
  }

  /** DECLARED output bound for the pair-emitting near-dup ops: keep at
    * most `maxPairsPerId` verified partners per lower id (strongest
    * cosine first, id tiebreak — deterministic). The bucket caps bound
    * the candidate INTERMEDIATE; this bounds the OUTPUT, which is what
    * actually grows quadratically on a dense-cluster corpus (a
    * c-member near-identical cluster has c²/2 TRUE pairs — at a real
    * 100 TB corpus the dup-cluster size distribution, not volume,
    * governs this term). With the cap, output ≤ n·cap rows by
    * construction, so a boilerplate-heavy corpus degrades
    * DETERMINISTICALLY (documented recall trade: weaker pairs of a
    * saturated id are dropped; an identical planted pair has cos 1.0
    * and always survives). Downstream cluster-collapse (connected
    * components → canonical keep) is unaffected for dense clusters —
    * every member still links to its `cap` strongest higher partners —
    * though a pathological chain can fragment; callers that need exact
    * connectivity leave the cap off and collapse to clusters FIRST.
    * The rank window partitions by id_a (doc-cardinality, bounded
    * group size ≤ the id's candidate count), so no single task ever
    * funnels the corpus. */
  def capPairsPerId(pairs: DataFrame, maxPairsPerId: Int): DataFrame = {
    require(maxPairsPerId >= 1, s"maxPairsPerId must be >= 1")
    if (maxPairsPerId == Int.MaxValue) pairs
    else {
      val w = Window.partitionBy(col("id_a"))
        .orderBy(col("cos_sim").desc, col("id_b").asc)
      pairs.withColumn("_pcap_rn", row_number().over(w))
        .where(col("_pcap_rn") <= maxPairsPerId)
        .drop("_pcap_rn")
    }
  }

  /** Embedding near-dup pairs blocked by sign-bit LSH buckets instead of
    * a data label — the 100 TB path: a categorical label block is a
    * constant fraction of the corpus (quadratic at scale), while LSH
    * bucket population shrinks geometrically with `numPlanes`.
    *
    * AND/OR-amplified: each of `numTables` independent plane sets is an
    * AND over `numPlanes` sign bits (per-table collision probability
    * (1 − θ/π)^numPlanes — geometric bucket decay), and a pair is a
    * candidate if it collides in ANY table (OR over tables restores the
    * recall the extra planes cost). Candidates are generated ids-only —
    * vectors don't ride the (table, bucket) shuffle — deduped across
    * tables, then verified with one exact-cosine join back to the
    * vectors. `maxBucketSize` caps each (table, bucket): a degenerate
    * bucket (e.g. the all-zero embedding) costs b² candidate pairs, so
    * an uncapped hot bucket is quadratic no matter how many planes.
    * Identical vectors always share every table's bucket; recall < 1 by
    * design (no oracle). */
  /** Per-id (tbl, bkt) probe entries: each point's own bucket in every
    * table, plus — at `multiProbe = 1` — the `numPlanes` buckets at
    * hamming distance 1 in the sign pattern (flip one plane bit). The
    * standard multi-probe trick (Lv et al., VLDB'07): a near pair that
    * disagrees on exactly one plane still collides, lifting per-table
    * recall from p^planes to p^planes + planes·p^(planes−1)(1−p) for
    * ~(planes+1)× probe volume — far cheaper at scale than dropping a
    * plane, which doubles every bucket's population instead. Buckets
    * are materialized once per table as an array attribute so each
    * probe is an array access, not a re-projection of the vector. */
  private def probeEntries(
      base: DataFrame,
      dim: Int,
      numPlanes: Int,
      numTables: Int,
      multiProbe: Int): DataFrame = {
    require(multiProbe >= 0 && multiProbe <= 1,
      s"multiProbe must be 0 or 1, got $multiProbe")
    val bucketed = base.withColumn("bks",
      array((0 until numTables).map(t =>
        lshBucket(col("v"), dim, numPlanes, table = t)): _*))
    val entries = (0 until numTables).flatMap { t =>
      val b = col("bks").getItem(t)
      val probes =
        if (multiProbe == 0) Seq(b)
        else b +: (0 until numPlanes).map(p => b.bitwiseXOR(lit(1L << p)))
      probes.map(x => struct(lit(t).as("tbl"), x.as("bkt")))
    }
    bucketed
      .select((base.columns.map(col) :+ explode(array(entries: _*)).as("e")): _*)
      .withColumn("tbl", col("e.tbl")).withColumn("bkt", col("e.bkt"))
      .drop("e")
  }

  def nearDupPairsLsh(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      numPlanes: Int,
      threshold: Double,
      numTables: Int = 4,
      maxBucketSize: Int = 100000,
      multiProbe: Int = 0): DataFrame = {
    require(numTables >= 1, s"numTables must be >= 1, got $numTables")
    val base = withNorm(
      df.select(col(idCol).as("id"), col(vecCol).as("v")), "v")
    val entries = base
      .select(col("id"), explode(array((0 until numTables).map { t =>
        struct(lit(t).as("tbl"),
          lshBucket(col("v"), dim, numPlanes, table = t).as("bkt"))
      }: _*)).as("e"))
      .select(col("id"), col("e.tbl").as("tbl"), col("e.bkt").as("bkt"))
    val capped =
      graft.dedup.Dedup.capBuckets(entries, maxBucketSize, Seq("tbl", "bkt"))
    val cands0 =
      if (multiProbe == 0)
        capped.as("l")
          .join(capped.as("r"),
            col("l.tbl") === col("r.tbl") && col("l.bkt") === col("r.bkt") &&
              col("l.id") < col("r.id"))
          .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      else {
        // asymmetric probe⋈index join: a hamming-1 pair surfaces in both
        // orders (each side probes the other's bucket), canonicalize
        val probes = probeEntries(base.select(col("id"), col("v")),
          dim, numPlanes, numTables, multiProbe)
          .select(col("id").as("pid"), col("tbl"), col("bkt"))
        probes
          .join(capped.withColumnRenamed("id", "cid"), Seq("tbl", "bkt"))
          .where(col("pid") =!= col("cid"))
          .select(least(col("pid"), col("cid")).as("id_a"),
            greatest(col("pid"), col("cid")).as("id_b"))
      }
    val cands = cands0.dropDuplicates("id_a", "id_b")
    cands
      .join(base.select(col("id").as("id_a"), col("v").as("va"),
        col("self_dot").as("da")), "id_a")
      .join(base.select(col("id").as("id_b"), col("v").as("vb"),
        col("self_dot").as("db")), "id_b")
      .withColumn("cos_sim",
        dot(col("va"), col("vb")) / sqrt(col("da") * col("db")))
      .where(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos_sim"), 6).as("cos_sim"))
  }

  /** [[nearDupPairsLsh]] with the [[capPairsPerId]] output bound —
    * the dense-cluster-safe form (output ≤ n·maxPairsPerId rows by
    * construction). Kept as an overload wrapper so existing uncapped
    * callers keep their exact semantics. */
  def nearDupPairsLshCapped(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      numPlanes: Int,
      threshold: Double,
      numTables: Int,
      maxBucketSize: Int,
      multiProbe: Int,
      maxPairsPerId: Int): DataFrame =
    capPairsPerId(
      nearDupPairsLsh(df, idCol, vecCol, dim, numPlanes, threshold,
        numTables, maxBucketSize, multiProbe),
      maxPairsPerId)

  /** Approximate k-NN GRAPH over the whole corpus — every node's top-k
    * cosine neighbors from capped LSH buckets (the edge set
    * SemDeDup-style graph clustering and graph-based dedup walk).
    *
    * Scale shape, measured the hard way at 100×:
    *   - Vectors ride ONLY the bucket-entry shuffle (n · tables rows).
    *     Scoring happens INSIDE the bucket self-join's projection, so
    *     everything downstream — cross-table dedup, two-phase
    *     [[perQueryTopK]] — shuffles slim (query, neighbor, cos) rows.
    *     The [[nearDupPairsLsh]] pair-list shape instead re-attaches
    *     vectors to the pair list through two more joins, which puts
    *     the FULL candidate volume × vector width through the shuffle
    *     (measured: disk-spill blowout at 100×).
    *   - The plane count GROWS with the corpus: candidate volume is
    *     n · E[bucket] · tables, so fixed planes make the graph
    *     quadratic in corpus density (measured 18× wall for 10× data
    *     at 6 planes). Auto-size holds E[bucket] at `targetBucketSize`:
    *     planes = ⌈log2(n / target)⌉, volume LINEAR in n; the
    *     `maxBucketSize` cap is only a skew backstop. The count() is a
    *     parquet-metadata-cheap plan-time probe (the q31 dim-probe
    *     spirit); pass numPlanes > 0 to pin instead.
    *   - No hamming multi-probe: probe amplification costs
    *     (planes+1)× on a side that is the WHOLE corpus here; the
    *     `numTables` OR-amplification carries the recall instead
    *     (measured recall@5 at the registered setting: 1.0 at sf0.01,
    *     0.9 at sf0.1). */
  def knnGraph(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      numTables: Int = 4,
      maxBucketSize: Int = 100000,
      numPlanes: Int = 0,
      targetBucketSize: Int = 64): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(numTables >= 1, s"numTables must be >= 1, got $numTables")
    require(targetBucketSize >= 2,
      s"targetBucketSize must be >= 2, got $targetBucketSize")
    val planes =
      if (numPlanes > 0) numPlanes
      else {
        val n = df.count().max(1L)
        val raw = math.ceil(
          math.log(n.toDouble / targetBucketSize) / math.log(2.0)).toInt
        raw.max(2).min(24)
      }
    val base = withNorm(
      df.select(col(idCol).as("id"), col(vecCol).as("v")), "v")
    val entries = base
      .select(col("id"), col("v"), col("self_dot"),
        explode(array((0 until numTables).map { t =>
          struct(lit(t).as("tbl"),
            lshBucket(col("v"), dim, planes, table = t).as("bkt"))
        }: _*)).as("e"))
      .select(col("id"), col("v"), col("self_dot"),
        col("e.tbl").as("tbl"), col("e.bkt").as("bkt"))
    val capped =
      graft.dedup.Dedup.capBuckets(entries, maxBucketSize, Seq("tbl", "bkt"))
    // score in the join projection; only slim rows leave this stage
    val scored = capped.as("l")
      .join(capped.as("r"),
        col("l.tbl") === col("r.tbl") && col("l.bkt") === col("r.bkt") &&
          col("l.id") =!= col("r.id"))
      .select(col("l.id").as("query_id"), col("r.id").as("neighbor_id"),
        (dot(col("l.v"), col("r.v"))
          / sqrt(col("l.self_dot") * col("r.self_dot"))).as("cos_sim"))
      // a pair can collide in several tables — score each once
      .dropDuplicates("query_id", "neighbor_id")
    perQueryTopK(scored, Seq(col("cos_sim").desc, col("neighbor_id").asc), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_sim"), 6).as("cos_sim"))
  }

  /** Contrastive triple mining for embedding-model training data —
    * per anchor, ONE in-band positive (a near neighbor that is similar
    * but not a duplicate: `posLo ≤ cos ≤ posHi`) and ONE hard negative
    * (the MOST similar candidate still below `negHi` — the
    * "hard negative" every DPR/SimCSE-style trainer mines rather than
    * sampling randomly). Anchors lacking either side are dropped: a
    * triple is only useful complete.
    *
    * Candidates come from [[knnGraph]]'s capped-bucket edge set (top-k
    * cosine edges per anchor), so both selections read the SAME slim
    * (anchor, neighbor, cos) frame: the positive is the best in-band
    * edge, the negative the best sub-`negHi` edge — "hard" by
    * construction since edges are the anchor's most similar candidates.
    * Selection is a partial-aggregable `max(struct(cos, -neighbor))`
    * per anchor (ties → smaller id; no rank window, no funnel), and
    * the edge set is |corpus|·k rows — nothing here exceeds the
    * knnGraph scale envelope.
    *
    * Caveat (documented, not hidden): an anchor whose top-k edges are
    * ALL in-band never yields a negative — raise `k` if dense near-dup
    * clusters starve negatives. */
  def contrastiveTriples(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      posLo: Double,
      posHi: Double,
      negHi: Double,
      k: Int = 32,
      numTables: Int = 8,
      maxBucketSize: Int = 100000,
      numPlanes: Int = 0,
      targetBucketSize: Int = 64): DataFrame = {
    val edges = graft.util.Blocks.lazyCheckpoint(
      knnGraph(df, idCol, vecCol, dim, k, numTables, maxBucketSize,
        numPlanes, targetBucketSize))
    triplesFromEdges(edges, posLo, posHi, negHi)
  }

  /** [[contrastiveTriples]] over an ALREADY-MATERIALIZED edge set —
    * the consumer half, reading a [[KnnEdgeStore]] snapshot (or any
    * (query_id, neighbor_id, cos_sim) frame) so several graph
    * consumers share ONE edge build. Selection semantics identical to
    * [[contrastiveTriples]]: best in-band edge is the positive, best
    * sub-`negHi` edge the hard negative, both via partial-aggregable
    * max(struct) — no rank window, edge-set-sized work only. */
  def triplesFromEdges(
      edges: DataFrame,
      posLo: Double,
      posHi: Double,
      negHi: Double): DataFrame = {
    require(posLo < posHi, s"need posLo < posHi, got [$posLo, $posHi]")
    require(negHi <= posLo,
      s"negative band must sit below the positive band, got negHi=$negHi > posLo=$posLo")
    def bestIn(cond: Column, outId: String, outCos: String): DataFrame =
      edges.where(cond)
        .groupBy(col("query_id").as("anchor_id"))
        .agg(max(struct(col("cos_sim").as("c"),
          (-col("neighbor_id")).as("negid"))).as("m"))
        .select(col("anchor_id"), (-col("m.negid")).as(outId),
          col("m.c").as(outCos))
    bestIn(col("cos_sim").between(posLo, posHi), "pos_id", "pos_cos")
      .join(bestIn(col("cos_sim") < negHi, "neg_id", "neg_cos"),
        Seq("anchor_id"))
  }

  /** SemDeDup-style semantic cluster walk over an already-materialized
    * edge set ([[KnnEdgeStore]]): edges at `cos_sim ≥ simThreshold`
    * (and optionally `rank ≤ maxRank`, to consume a k'-NN subgraph of
    * a larger snapshot) contracted by
    * [[graft.dedup.Dedup.connectedComponents]] — one row per clustered
    * vector with its cluster label (the cluster's MIN id), member
    * count, and the canonical-keep verdict (`is_kept` = the min-id
    * member). Cluster-first: the quadratic near-dup pair list never
    * materializes; everything past the threshold filter is edge-set
    * sized. */
  def clustersFromEdges(
      edges: DataFrame,
      simThreshold: Double,
      maxRank: Int = Int.MaxValue): DataFrame = {
    val es = edges
      .where(col("cos_sim") >= simThreshold && col("rank") <= maxRank
        && col("query_id") < col("neighbor_id"))
      .select(col("query_id").as("id_a"), col("neighbor_id").as("id_b"))
    val labels = graft.util.Blocks.lazyCheckpoint(
      graft.dedup.Dedup.connectedComponents(es)
        .select(col("id").as("vec_id"), col("comp").as("cluster_id")))
    // no broadcast hint: cluster count is corpus-scale on sparse
    // graphs (mostly 2-member clusters), so AQE decides — it still
    // broadcasts when the size table measures small
    val sizes = labels.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
    labels.join(sizes, "cluster_id")
      .select(col("vec_id"), col("cluster_id"),
        (col("vec_id") === col("cluster_id")).as("is_kept"),
        col("n_members"))
  }

  /** Exact per-query top-k over a scored candidate frame WITHOUT a
    * one-task-per-query funnel — the [[graft.curate.Curation]]
    * twoPhaseTopK shape, keyed by query: a rank window partitioned by
    * `query_id` alone sends EVERY candidate of a query through one
    * task, which serializes on the full-corpus tiers (brute/PQ/SQ score
    * |Q|·|C| rows). Candidates first rank inside 256 hash buckets of
    * `neighbor_id` (256-way parallel per query); only each bucket's
    * top-k — ≤ 256·k rows per query, metadata scale — enter the global
    * per-query window that assigns the final rank. Exact for any
    * `order` because a global top-k row is also top-k in its own
    * bucket. Requires `query_id`/`neighbor_id` columns; emits
    * `rank` ∈ [1, k]. */
  private[graft] def perQueryTopK(
      scored: DataFrame,
      order: Seq[Column],
      k: Int): DataFrame = {
    val wBucket = Window.partitionBy(col("query_id"), col("_qbkt"))
      .orderBy(order: _*)
    val wGlobal = Window.partitionBy(col("query_id")).orderBy(order: _*)
    scored
      .withColumn("_qbkt",
        pmod(xxhash64(col("neighbor_id").cast("string")), lit(256)))
      .withColumn("_qr", row_number().over(wBucket))
      .where(col("_qr") <= k)
      .withColumn("rank", row_number().over(wGlobal))
      .where(col("rank") <= k)
      .drop("_qbkt", "_qr")
  }

  /** Brute-force cosine top-k: every query row against the full corpus.
    * Correctness baseline — O(|Q|·|C|); keep |Q| small or use
    * [[lshTopK]] at scale. Ties broken by neighbor id ascending. */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = withNorm(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "qv")
      .withColumnRenamed("self_dot", "q_dot")
    val c = withNorm(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")), "cv")
      .withColumnRenamed("self_dot", "c_dot")
    val scored = broadcast(q)
      .join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn(
        "cos_sim",
        dot(col("qv"), col("cv")) / sqrt(col("q_dot") * col("c_dot")))
    perQueryTopK(scored, Seq(col("cos_sim").desc, col("neighbor_id").asc), k)
      .select(
        col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_sim"), 6).as("cos_sim"))
  }

  /** Sign-bit LSH bucket id over `numPlanes` fixed hyperplanes — the
    * native codegen'd kernel ([[graft.expressions.LshBucket]]; plane
    * components mixed on the fly, one pass per plane). `table` selects
    * an independent plane set for OR-amplification
    * ([[nearDupPairsLsh]]); table 0 is the original single-table planes
    * (the plane index is mixed as `(table << 16) | p`, identity at 0). */
  def lshBucket(vec: Column, dim: Int, numPlanes: Int, table: Int = 0): Column = {
    // hard bounds (planes pack into one Long) live in the LshBucket
    // expression itself, covering this path and the SQL-registered one
    graft.expressions.LshBucket.lshBucket(vec, dim, numPlanes, table)
  }

  // ---------------------------------------------------------------------
  // IVF (inverted-file) ANN
  // ---------------------------------------------------------------------

  /** Nearest-centroid assignments: one (id, vec, norm, cid, dist rank)
    * row per vector × probed centroid. Centroids ride in a broadcast
    * join — |corpus| × numCentroids scored rows, the standard IVF
    * assignment cost, fully distributed. */
  private[graft] def assign(
      vecs: DataFrame,
      centroids: DataFrame,
      probe: Int): DataFrame = {
    val scored = vecs.join(broadcast(centroids))
      .withColumn("c_sim",
        dot(col("v"), col("cv")) / sqrt(col("self_dot") * col("c_dot")))
    val w = Window.partitionBy(col("id")).orderBy(col("c_sim").desc, col("cid").asc)
    scored
      .withColumn("c_rank", row_number().over(w))
      .where(col("c_rank") <= probe)
      .drop("cv", "c_dot", "c_sim", "c_rank")
  }

  /** Approximate top-k via an inverted-file index (IVF-flat): centroids
    * are seeded deterministically from the corpus (hash-ordered sample)
    * and refined with one distributed Lloyd step; every corpus vector
    * lands in its nearest centroid's list; a query scans only its
    * `nProbe` nearest lists. The centroid id is the shuffle/join key, so
    * per-list work is local and the cross product never materializes —
    * the classic 100 TB ANN shape (billions of vectors, thousands of
    * lists, nProbe ≪ lists).
    *
    * The only driver-side data is the centroid table (numCentroids × dim
    * floats — metadata-scale by construction, like any ANN index's
    * coarse quantizer). */
  /** Deterministic coarse quantizer shared by [[ivfTopK]] and
    * [[semanticDedupPairs]]: `numCentroids` corpus vectors seeded in
    * xxhash64 order, refined with ONE fully-distributed Lloyd step
    * (assign to nearest seed, then average each cluster's members
    * element-wise via posexplode). Expects the (id, v, self_dot) shape
    * [[withNorm]] produces; returns (cid, cv, c_dot). The centroid
    * table is numCentroids × dim floats — metadata scale — and rides in
    * broadcast joins; the corpus never leaves the executors. Clusters
    * emptied by the Lloyd step drop out (their seed attracted no
    * members, so no assignment can need them). */
  private[graft] def trainCentroids(c: DataFrame, numCentroids: Int): DataFrame = {
    val seeds = c.orderBy(xxhash64(col("id").cast("string")), col("id"))
      .limit(numCentroids)
      .select(col("id").as("cid"), col("v").as("cv"), col("self_dot").as("c_dot"))
    assign(c, seeds, probe = 1)
      .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos"))
      .agg(avg(col("x")).as("mx"))
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mx")))).as("pm"))
      .select(col("cid"),
        transform(col("pm"), p => p.getField("mx").cast("float")).as("cv"))
      .withColumn("c_dot", dot(col("cv"), col("cv")))
  }

  /** SemDeDup-shaped semantic near-duplicate pairs: cluster the
    * embedding space with the SAME deterministic coarse quantizer as
    * [[ivfTopK]] and verify exact cosine ONLY within a cluster — pairs
    * are (id_a < id_b, cos_sim ≥ threshold) among vectors sharing a
    * nearest centroid. Complements [[nearDupPairsLsh]]: centroids adapt
    * to the corpus's density (random hyperplanes are data-blind), so
    * dense regions split into many small blocks while sparse regions
    * stay whole.
    *
    * Boundary pairs: with hard assignment a pair straddling a centroid
    * boundary is missed, so each vector is SOFT-assigned to its
    * `assignProbe` nearest centroids (the write-side analog of IVF's
    * nProbe) — a pair is compared when ANY assigned cluster is shared,
    * and duplicate meetings collapse in a final pair-dedup. Recall < 1
    * by design — no oracle; identical vectors always rank centroids
    * identically, so a planted identical pair shares every assignment.
    *
    * Scale: the centroid id keys every shuffle; within-cluster work is
    * local; `assignProbe` multiplies the candidate volume by at most
    * probe², and `maxClusterSize` caps the quadratic blow-up of a
    * degenerate cluster (same guard as the LSH bucket cap). */
  def semanticDedupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      numCentroids: Int = 64,
      assignProbe: Int = 2,
      maxClusterSize: Int = 100000,
      maxPairsPerId: Int = Int.MaxValue): DataFrame = {
    require(assignProbe >= 1, s"assignProbe must be >= 1, got $assignProbe")
    val c = withNorm(df.select(col(idCol).as("id"), col(vecCol).as("v")), "v")
    // materialize the assignments ONCE (lazy localCheckpoint, the same
    // GC-released pattern as the CC seeds): the within-cluster self-join
    // consumes this frame twice, and without the checkpoint each side
    // re-runs the whole centroid-training DAG (seed sort + Lloyd
    // aggregates + re-assignment) — measured 23.7 s -> 1.8 s at sf0.1
    val assigned = graft.util.Blocks.lazyCheckpoint(
      assign(c, trainCentroids(c, numCentroids), assignProbe))
    // cap AFTER the cross-probe pair dedup, so the bound is on distinct
    // output pairs, not per-probe meetings
    capPairsPerId(
      nearDupPairs(assigned, "id", "v", "cid", threshold, maxClusterSize)
        .dropDuplicates("id_a", "id_b"),
      maxPairsPerId)
  }

  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numCentroids: Int = 64,
      nProbe: Int = 4): DataFrame = {
    val c = withNorm(
      corpus.select(col(idCol).as("id"), col(vecCol).as("v")), "v")
    val refined = trainCentroids(c, numCentroids)
    val lists = assign(c, refined, probe = 1)
      .select(col("id").as("neighbor_id"), col("v").as("cv_n"),
        col("self_dot").as("c_dot_n"), col("cid"))
    val q = assign(
      withNorm(queries.select(col(idCol).as("id"), col(vecCol).as("v")), "v"),
      refined, probe = nProbe)
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("self_dot").as("q_dot"), col("cid"))
    val scored = q.join(lists, Seq("cid"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim",
        dot(col("qv"), col("cv_n")) / sqrt(col("q_dot") * col("c_dot_n")))
    // a (query, neighbor) pair surfaces once per shared probed list;
    // duplicates carry identical (cos_sim, neighbor_id) so they sort
    // adjacently — ranking first and deduping after preserves the
    // established rank semantics under the two-phase shape (duplicates
    // of a pair land in the same neighbor-hash bucket)
    perQueryTopK(scored, Seq(col("cos_sim").desc, col("neighbor_id").asc), k)
      .dropDuplicates("query_id", "neighbor_id")
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_sim"), 6).as("cos_sim"))
  }

  // ---------------------------------------------------------------------
  // PQ (product quantization) ANN
  // ---------------------------------------------------------------------

  /** Train a PQ codebook on the driver from a deterministic hash-ordered
    * corpus sample: per subspace, seed `ksub` centroids from the first
    * sample subvectors and run a few Lloyd iterations. The sample
    * (`sampleSize` × dim floats) and the codebook (m·ksub·dsub floats)
    * are metadata-scale BY CONSTRUCTION — the same contract as the IVF
    * coarse quantizer; the corpus itself never leaves the executors.
    * Empty clusters keep their previous centroid, so the codebook is a
    * total function and encoding never fails. */
  def trainPqCodebook(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      ksub: Int,
      dsub: Int,
      sampleSize: Int = 2048,
      lloydIters: Int = 3): Array[Float] = {
    // cast to array<float> before collecting so BOTH element types the
    // PQ kernels accept (float and double) train identically — without
    // it a double-element corpus passes analysis but getSeq[Float]
    // throws ClassCastException on the driver
    val sample: Array[Array[Float]] = corpus
      .orderBy(xxhash64(col(idCol).cast("string")), col(idCol))
      .limit(sampleSize)
      .select(col(vecCol).cast("array<float>"))
      .collect()
      .map(_.getSeq[Float](0).toArray)
      .filter(_.length >= m * dsub)
    require(sample.nonEmpty, "PQ training sample is empty")
    val cb = new Array[Float](m * ksub * dsub)
    for (j <- 0 until m) {
      // seed from the hash-ordered sample (wraps if sample < ksub)
      for (c <- 0 until ksub; t <- 0 until dsub)
        cb((j * ksub + c) * dsub + t) = sample(c % sample.length)(j * dsub + t)
      for (_ <- 0 until lloydIters) {
        val sums = Array.fill(ksub, dsub)(0.0)
        val counts = new Array[Int](ksub)
        sample.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          for (c <- 0 until ksub) {
            var d = 0.0
            for (t <- 0 until dsub) {
              val diff = v(j * dsub + t) - cb((j * ksub + c) * dsub + t)
              d += diff * diff
            }
            if (d < bestD) { bestD = d; best = c }
          }
          counts(best) += 1
          for (t <- 0 until dsub) sums(best)(t) += v(j * dsub + t)
        }
        for (c <- 0 until ksub if counts(c) > 0; t <- 0 until dsub)
          cb((j * ksub + c) * dsub + t) = (sums(c)(t) / counts(c)).toFloat
      }
    }
    cb
  }

  /** Approximate top-k via product quantization: the corpus ships as m
    * integer codes per vector ([[graft.expressions.PqEncode]] — at
    * dim 64 / m 8 a ~32× storage and shuffle cut vs raw floats), each
    * query precomputes one distance lookup table
    * ([[graft.expressions.PqLut]]), and scoring a pair is m table
    * lookups ([[graft.expressions.PqAdc]]) instead of a dim-length dot
    * product — the compressed tier of the ANN family (brute → LSH →
    * IVF → PQ), for corpora whose raw vectors are too large to ship.
    *
    * Distances are squared L2 of the raw vectors (normalize first for
    * cosine ranking). Ranking is ascending ADC with neighbor-id ties —
    * identical query/corpus vectors share codes, making the planted
    * pair's ADC provably minimal (the self-quantization error), so
    * recall-1 pairs always surface. Approximate by design → no oracle. */
  def pqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      m: Int = 8,
      ksub: Int = 16,
      sampleSize: Int = 2048,
      rerank: Int = 0): DataFrame = {
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    val dsub = dim / m
    val cb = trainPqCodebook(corpus, idCol, vecCol, m, ksub, dsub, sampleSize)
    import graft.expressions.PqOps
    val codes = corpus
      .select(col(idCol).as("neighbor_id"),
        PqOps.pqEncode(col(vecCol), cb, m, ksub, dsub).as("codes"))
      .where(col("codes").isNotNull)
    val q = queries
      .select(col(idCol).as("query_id"),
        PqOps.pqLut(col(vecCol), cb, m, ksub, dsub).as("lut"))
      .where(col("lut").isNotNull)
    val scored = broadcast(q)
      .join(codes, col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_dist", PqOps.pqAdc(col("codes"), col("lut"), m, ksub))
      // pq_adc NULLs on geometry mismatch; ascending order would rank
      // NULLS FIRST, so drop them before the top-k window
      .where(col("adc_dist").isNotNull)
    val shortK = if (rerank > 0) math.max(k, rerank) else k
    val shortlist = perQueryTopK(scored,
      Seq(col("adc_dist").asc, col("neighbor_id").asc), shortK)
    if (rerank <= 0)
      shortlist.select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("adc_dist"), 6).as("adc_dist"))
    else {
      // ADC-shortlist-then-exact-rerank (the standard IVFADC serving
      // shape): fetch the original vectors for only |Q|·shortK
      // shortlisted corpus rows (broadcast the shortlist into the
      // corpus scan — the corpus never shuffles), score exactly,
      // re-rank, cut to k. Output ranks by true cosine.
      val cv = withNorm(
        corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")), "cv")
        .withColumnRenamed("self_dot", "c_dot")
        .join(broadcast(shortlist.select(col("query_id"), col("neighbor_id"))),
          Seq("neighbor_id"))
      val qv = withNorm(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "qv")
        .withColumnRenamed("self_dot", "q_dot")
      val exact = cv.join(broadcast(qv), Seq("query_id"))
        .withColumn("cos_sim",
          dot(col("qv"), col("cv")) / sqrt(col("q_dot") * col("c_dot")))
      // per-query input here is the ≤ shortK-row shortlist (bounded by
      // construction), so the plain per-query window cannot funnel
      val w2 = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
      exact
        .withColumn("rank", row_number().over(w2))
        .where(col("rank") <= k)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
    }
  }

  /** Scalar-quantized (SQ8) top-k — the middle compression tier
    * between brute-force floats and [[pqTopK]]: the corpus rides as one
    * byte per dimension plus per-vector (min, step, exact norm), a 4×
    * shrink with far lower distortion than PQ. Scoring fuses
    * decompression into one codegen'd byte pass
    * ([[graft.expressions.SqOps.dot]]): approx cosine = sq_dot /
    * sqrt(q_dot · exact c_dot); the exact norm keeps the denominator
    * honest so only the dot carries quantization error. Shortlist +
    * exact rerank as in pqTopK (only |Q|·shortK corpus vectors are
    * ever hydrated; the corpus never shuffles). */
  def sqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      rerank: Int = 0): DataFrame = {
    import graft.expressions.SqOps
    val c = withNorm(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v")), "v")
      .select(col("neighbor_id"), SqOps.sqEncode(col("v")).as("enc"),
        col("self_dot").as("c_dot"))
      .where(col("enc").isNotNull)
    val q = withNorm(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "qv")
      .withColumnRenamed("self_dot", "q_dot")
    val scored = broadcast(q)
      .join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sq_sim",
        SqOps.sqDot(col("qv"), col("enc")) / sqrt(col("q_dot") * col("c_dot")))
      .where(col("sq_sim").isNotNull)
    val shortK = if (rerank > 0) math.max(k, rerank) else k
    val shortlist = perQueryTopK(scored,
      Seq(col("sq_sim").desc, col("neighbor_id").asc), shortK)
    if (rerank <= 0)
      shortlist.select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sq_sim"), 6).as("sq_sim"))
    else {
      val cv = withNorm(
        corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")), "cv")
        .withColumnRenamed("self_dot", "c_dot")
        .join(broadcast(shortlist.select(col("query_id"), col("neighbor_id"))),
          Seq("neighbor_id"))
      val exact = cv.join(broadcast(q.withColumnRenamed("qv", "qv2")
          .select(col("query_id"), col("qv2"), col("q_dot"))),
        Seq("query_id"))
        .withColumn("cos_sim",
          dot(col("qv2"), col("cv")) / sqrt(col("q_dot") * col("c_dot")))
      // per-query input here is the ≤ shortK-row shortlist (bounded by
      // construction), so the plain per-query window cannot funnel
      val w2 = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
      exact
        .withColumn("rank", row_number().over(w2))
        .where(col("rank") <= k)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
    }
  }

  /** Approximate top-k: queries only compete against corpus rows in the
    * same LSH bucket. The bucket is the shuffle/join key — per-bucket
    * work is local and the cross product never materializes. */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      numPlanes: Int,
      k: Int,
      numTables: Int = 1,
      multiProbe: Int = 0): DataFrame = {
    require(numTables >= 1, s"numTables must be >= 1, got $numTables")
    // queries probe (their bucket + optional hamming-1 flips) in every
    // table; the corpus indexes only its exact bucket per table — probe
    // amplification costs (planes+1)×tables rows on the SMALL side only
    val q = probeEntries(
      withNorm(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("v")), "v"),
      dim, numPlanes, numTables, multiProbe)
      .select(col("query_id"), col("v").as("qv"),
        col("self_dot").as("q_dot"), col("tbl"), col("bkt"))
    val c = probeEntries(
      withNorm(
        corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v")), "v"),
      dim, numPlanes, numTables, multiProbe = 0)
      .select(col("neighbor_id"), col("v").as("cv"),
        col("self_dot").as("c_dot"), col("tbl"), col("bkt"))
    val scored = q
      .join(c, Seq("tbl", "bkt"))
      .where(col("query_id") =!= col("neighbor_id"))
      // a pair can collide in several tables/probes — score each once
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn(
        "cos_sim",
        dot(col("qv"), col("cv")) / sqrt(col("q_dot") * col("c_dot")))
    perQueryTopK(scored, Seq(col("cos_sim").desc, col("neighbor_id").asc), k)
      .select(
        col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_sim"), 6).as("cos_sim"))
  }
}
