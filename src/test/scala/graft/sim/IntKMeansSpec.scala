package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntKMeansSpec extends SparkSpec {
  import spark.implicits._

  // Two well-separated blobs in 4-d: ids 0-49 near (+1,+1,0,0),
  // ids 50-99 near (-1,-1,0,0), with small deterministic jitter.
  private def jit(i: Long, s: Int): Float = (((i * 31 + s * 7) % 11) - 5) / 100.0f
  private val blobs = (0L until 100L).map { i =>
    val base = if (i < 50) 1.0f else -1.0f
    (i, Seq(base + jit(i, 1), base + jit(i, 2), jit(i, 3), jit(i, 4)))
  }.toDF("id", "vec")

  test("separated blobs land in separate clusters, ids exact") {
    val out = IntKMeans.cluster(blobs, "id", "vec", k = 2, iters = 3).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("cluster")).toMap
    val a = (0L until 50L).map(out).toSet
    val b = (50L until 100L).map(out).toSet
    assert(a.size === 1 && b.size === 1 && a != b,
      s"blobs should separate: left=$a right=$b")
  }

  test("assignments are partition-independent and repeatable") {
    def run(df: org.apache.spark.sql.DataFrame) =
      IntKMeans.cluster(df, "id", "vec", k = 3, iters = 2).collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Int]("cluster"),
          r.getAs[Long]("dist2"))).sortBy(_._1).toSeq
    assert(run(blobs) === run(blobs.repartition(7)))
  }

  test("duplicate-vector ties go to the lowest cluster id; emptied clusters keep their centroid") {
    // every vector is one of exactly two values, k = 3: at least two
    // seeds share a value, so every member of that value ties and the
    // lowest cluster id takes them all — one cluster MUST end empty
    // and the run must still complete with clusters from [0, 3).
    val dup = (0L until 60L).map { i =>
      val v = if (i % 2 == 0) Seq(1.0f, 2.0f) else Seq(-3.0f, 0.5f)
      (i, v)
    }.toDF("id", "vec")
    val out = IntKMeans.cluster(dup, "id", "vec", k = 3, iters = 2).collect()
    val clusters = out.map(_.getAs[Int]("cluster")).toSet
    assert(clusters.size === 2, s"two value-groups -> two live clusters: $clusters")
    assert(clusters.forall(c => c >= 0 && c < 3))
    // members of the same value share a cluster and sit AT its centroid
    assert(out.filter(_.getAs[Long]("id") % 2 == 0).map(_.getAs[Long]("dist2")).toSet === Set(0L))
  }

  test("dist2 is the exact integer squared distance to the final centroid") {
    // k=1: the single centroid is the truncated element-wise mean of
    // everything; recompute it here and check one row's dist2.
    val out = IntKMeans.cluster(blobs, "id", "vec", k = 1, iters = 1)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("dist2")).toMap
    val qv: Map[Long, Array[Long]] = blobs.collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[Seq[Float]]("vec").map(x =>
        math.round(x.toDouble * 1000000L)).toArray).toMap
    val n = qv.size
    val cent: IndexedSeq[Long] = (0 until 4).map { d =>
      val s = qv.values.map(_(d)).sum
      s / n // truncated toward zero (all-positive count)
    }
    val id7 = qv(7L)
    val expected = (0 until 4).map(d => {
      val diff = id7(d) - cent(d); diff * diff
    }).sum
    assert(out(7L) === expected)
  }

  test("corpus stays distributed: no explode against k in the assignment scan") {
    val plan = IntKMeans.cluster(blobs, "id", "vec", k = 4, iters = 0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"),
      s"final assignment must be a per-row expression, not an explode:\n$plan")
  }
}
