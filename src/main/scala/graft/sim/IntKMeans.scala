package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Auditable k-means topic clustering over integer-quantized
  * embeddings — the HASH-EXACT tier of the clustering ladder (the float
  * tier, [[Ann.trainCentroids]], stays the IVF-internal coarse
  * quantizer). Classic Lloyd iterations (MacQueen 1967 / Lloyd 1982 —
  * public technique) made engine-portable so an ANSI-SQL oracle
  * reproduces every assignment bit-for-bit:
  *
  *  - vectors quantize ONCE to integer micro-units
  *    (`round(x·10⁶) : BIGINT`) — all distances and centroid updates
  *    thereafter are exact integer arithmetic, so nothing depends on
  *    float summation order;
  *  - seeds are the `k` corpus vectors smallest in `(md5(id), id)`
  *    order — deterministic AND hash-spread (first-k-by-id would seed
  *    one dense region);
  *  - a Lloyd step assigns each vector to the argmin-squared-L2
  *    centroid (ties → lowest cluster id, both engines) and recomputes
  *    each centroid as the element-wise truncated integer mean
  *    (`sum div count`; Spark `div` and DuckDB `//` both truncate
  *    toward zero — verified, so the engines cannot drift on negative
  *    coordinate sums). A cluster left empty keeps its previous
  *    centroid.
  *
  * Scale shape: the corpus never leaves the executors — each iteration
  * is one scan with the k×dim centroid table as plan constants (the
  * argmin is a per-row expression, no explode against k), plus one
  * cluster-keyed aggregate with dim sum columns (codegen'd, no
  * Generate) whose post-combine shuffle volume is ≤ k rows per
  * partition regardless of corpus size. The
  * driver holds only k·dim longs between iterations. Overflow margins:
  * |coord| ≤ ~2·10⁶ micro-units ⇒ squared diffs ≤ 1.6·10¹³, ×4096 dims
  * still < 2⁶³; per-(cluster,dim) sums bound by n·2·10⁶.
  */
object IntKMeans {

  val Scale = 1000000L

  private def quantize(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * Scale).cast("long"))

  /** (distances-array, argmin cluster id, min dist²) expression triple
    * for one vector column against plan-constant centroids. */
  private def assignCols(qv: Column, cents: Array[Array[Long]]): (Column, Column) = {
    val dists = array(cents.map { c =>
      aggregate(
        zip_with(qv, typedlit(c.toSeq), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x)
    }: _*)
    val d2 = array_min(dists)
    ((array_position(dists, d2) - 1L).cast("int"), d2)
  }

  /** Final assignments after `iters` Lloyd steps: one row per vector —
    * (id, cluster ∈ [0,k), dist2 = squared integer distance to its
    * centroid). Deterministic on any partitioning/engine. */
  def cluster(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    // quantized corpus is scanned once per Lloyd step + once for the
    // final assignment — materialize it once (GC-released handle)
    val q = graft.util.Blocks.lazyCheckpoint(
      df.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv")))

    var cents: Array[Array[Long]] = q
      .orderBy(md5(col("id").cast("string")), col("id")).limit(k)
      .select(col("qv")).collect()
      .map(_.getSeq[Long](0).toArray)

    val dim = cents.headOption.map(_.length).getOrElse(0)
    for (_ <- 1 to iters) {
      val (cl, _) = assignCols(col("qv"), cents)
      // element-wise truncated integer mean per cluster WITHOUT a
      // Generate: one codegen'd aggregate with dim sum columns,
      // partial-aggregated to <= k rows per partition
      val sums = (0 until dim).map(d =>
        sum(element_at(col("qv"), d + 1)).as(s"s$d"))
      val updated = q
        .groupBy(cl.as("cluster"))
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
      val next = cents.map(_.clone()) // empty cluster keeps its centroid
      updated.foreach { r =>
        val n = r.getAs[Long]("n")
        val c = next(r.getAs[Int]("cluster"))
        var d = 0
        while (d < dim) { c(d) = r.getAs[Long](s"s$d") / n; d += 1 }
      }
      cents = next
    }

    val (cl, d2) = assignCols(col("qv"), cents)
    q.select(col("id"), cl.as("cluster"), d2.as("dist2"))
  }
}
