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
    * local — the 100 TB path swaps the label block for [[lshBucket]]. */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      threshold: Double): DataFrame = {
    val n = withNorm(
      df.select(col(idCol).as("id"), col(vecCol).as("v"), col(blockCol).as("blk")),
      "v")
    n.as("l")
      .join(n.as("r"), col("l.blk") === col("r.blk") && col("l.id") < col("r.id"))
      .withColumn(
        "cos_sim",
        dot(col("l.v"), col("r.v")) / sqrt(col("l.self_dot") * col("r.self_dot")))
      .where(col("cos_sim") >= threshold)
      .select(
        col("l.id").as("id_a"), col("r.id").as("id_b"),
        round(col("cos_sim"), 6).as("cos_sim"))
  }

  /** Embedding near-dup pairs blocked by sign-bit LSH buckets instead of
    * a data label — the 100 TB path: a categorical label block is a
    * constant fraction of the corpus (quadratic at scale), while LSH
    * bucket population shrinks geometrically with `numPlanes`.
    * Candidates must agree on all numPlanes sign bits, so recall < 1 by
    * design (no oracle); identical vectors always share a bucket. */
  def nearDupPairsLsh(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      numPlanes: Int,
      threshold: Double): DataFrame =
    nearDupPairs(
      df.withColumn("_lsh_bucket", lshBucket(col(vecCol), dim, numPlanes)),
      idCol, vecCol, "_lsh_bucket", threshold)

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
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(
        col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_sim"), 6).as("cos_sim"))
  }

  /** Deterministic pseudo-random hyperplanes for sign-bit LSH: component
    * j of plane p is derived from a splitmix-style integer mix of (p, j),
    * mapped into [-1, 1]. Fully reproducible across runs and executors. */
  private def planeComponent(p: Int, j: Int): Double = {
    var z = (p.toLong << 32 | j.toLong) + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  /** Sign-bit LSH bucket id over `numPlanes` fixed hyperplanes. */
  def lshBucket(vec: Column, dim: Int, numPlanes: Int): Column = {
    val bits = (0 until numPlanes).map { p =>
      val proj = (0 until dim).map { j =>
        vec.getItem(j).cast("double") * lit(planeComponent(p, j))
      }.reduce(_ + _)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  // ---------------------------------------------------------------------
  // IVF (inverted-file) ANN
  // ---------------------------------------------------------------------

  /** Nearest-centroid assignments: one (id, vec, norm, cid, dist rank)
    * row per vector × probed centroid. Centroids ride in a broadcast
    * join — |corpus| × numCentroids scored rows, the standard IVF
    * assignment cost, fully distributed. */
  private def assign(
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
    // seed: deterministic hash-ordered sample of corpus vectors
    val seeds = c.orderBy(xxhash64(col("id").cast("string")), col("id"))
      .limit(numCentroids)
      .select(col("id").as("cid"), col("v").as("cv"), col("self_dot").as("c_dot"))
    // one Lloyd refinement, fully distributed: assign to nearest seed,
    // then average member vectors element-wise via posexplode
    val members = assign(c, seeds, probe = 1)
    val refined = members
      .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos"))
      .agg(avg(col("x")).as("mx"))
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mx")))).as("pm"))
      .select(col("cid"),
        transform(col("pm"), p => p.getField("mx").cast("float")).as("cv"))
      .withColumn("c_dot", dot(col("cv"), col("cv")))
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
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .dropDuplicates("query_id", "neighbor_id")
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_sim"), 6).as("cos_sim"))
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
      k: Int): DataFrame = {
    val q = withNorm(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "qv")
      .withColumnRenamed("self_dot", "q_dot")
      .withColumn("bucket", lshBucket(col("qv"), dim, numPlanes))
    val c = withNorm(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")), "cv")
      .withColumnRenamed("self_dot", "c_dot")
      .withColumn("bucket", lshBucket(col("cv"), dim, numPlanes))
    val scored = q
      .join(c, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn(
        "cos_sim",
        dot(col("qv"), col("cv")) / sqrt(col("q_dot") * col("c_dot")))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(
        col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_sim"), 6).as("cos_sim"))
  }
}
