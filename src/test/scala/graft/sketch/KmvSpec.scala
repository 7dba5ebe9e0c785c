package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("sketch holds exactly min(k, distinct) smallest hashes") {
    val items = (0 until 50).map(i => ("g", s"item$i")) ++
      (0 until 5).map(i => ("h", s"x$i"))
    val sk = Kmv.minK(items.toDF("grp", "item"), "grp", "item", k = 16)
    val byG = sk.collect().groupBy(_.getAs[String]("grp"))
    assert(byG("g").length == 16)
    assert(byG("h").length == 5)
    // the kept hashes are the k SMALLEST: max(kept) < min(dropped)
    val all = items.filter(_._1 == "g").map { case (_, it) =>
      spark.sql(s"SELECT CAST(conv(substring(md5('${it}kmv'), 1, 15), 16, 10) AS BIGINT) AS h")
        .head().getLong(0)
    }.sorted
    val kept = byG("g").map(_.getAs[Long]("h")).sorted.toSeq
    assert(kept == all.take(16))
  }

  test("small-union pairs are EXACT: est equals true set arithmetic") {
    // two sets with |A|=20, |B|=15, |A∩B|=5 — union 30 < k=64, so the
    // sketch holds everything and every estimate collapses to exact
    val a = (0 until 20).map(i => ("a", s"t$i"))
    val b = (15 until 30).map(i => ("b", s"t$i"))
    val sk = Kmv.minK((a ++ b).toDF("grp", "item"), "grp", "item", k = 64)
    val r = Kmv.pairwiseOverlap(sk, k = 64).head()
    assert(r.getAs[Long]("k_used") == 30L)
    assert(r.getAs[Long]("n_both") == 5L)
    assert(r.getAs[Long]("union_est") == 30L)
    assert(r.getAs[Long]("jaccard_est_ppm") == 1000000L * 5 / 30)
    assert(r.getAs[Long]("inter_est") == 5L)
  }

  test("large-set estimates land inside the 3-sigma KMV envelope") {
    // |A|=3000, |B|=2500, |A∩B|=1000 → J = 1000/4500 ≈ 0.2222
    val a = (0 until 3000).map(i => ("a", s"w$i"))
    val b = (2000 until 4500).map(i => ("b", s"w$i"))
    val sk = Kmv.minK((a ++ b).toDF("grp", "item"), "grp", "item", k = 256)
    val r = Kmv.pairwiseOverlap(sk, k = 256).head()
    val jTrue = 1000.0 / 4500.0
    val jEst = r.getAs[Long]("jaccard_est_ppm") / 1e6
    val sigma = math.sqrt(jTrue * (1 - jTrue) / 256)
    assert(math.abs(jEst - jTrue) < 3 * sigma + 0.01,
      s"jaccard est $jEst vs true $jTrue")
    val uEst = r.getAs[Long]("union_est").toDouble
    assert(math.abs(uEst - 4500.0) / 4500.0 < 0.2, s"union est $uEst")
    val iEst = r.getAs[Long]("inter_est").toDouble
    assert(math.abs(iEst - 1000.0) / 1000.0 < 0.35, s"inter est $iEst")
  }

  test("sketches are mergeable: bottom-k of sketch union = sketch of set union") {
    val a = (0 until 400).map(i => ("a", s"m$i"))
    val b = (300 until 700).map(i => ("b", s"m$i"))
    val k = 32
    val skParts = Kmv.minK((a ++ b).toDF("grp", "item"), "grp", "item", k)
    // merge the two per-group sketches by hand: distinct h, k smallest
    val merged = skParts.select(col("h")).distinct()
      .orderBy(col("h")).limit(k).collect().map(_.getLong(0)).toSeq
    // sketch of the true union set under one group
    val u = (a ++ b).map { case (_, it) => ("u", it) }
    val direct = Kmv.minK(u.toDF("grp", "item"), "grp", "item", k)
      .orderBy(col("h")).collect().map(_.getAs[Long]("h")).toSeq
    assert(merged == direct)
  }

  test("mergeSketches is the lossless union: merge(minK(A), minK(B)) == minK(A ∪ B)") {
    val k = 32
    val a = (0 until 400).map(i => (s"s${i % 2}", s"ma$i"))
    val b = (0 until 300).map(i => (s"s${i % 3}", s"mb$i")) ++
      (0 until 100).map(i => (s"s${i % 2}", s"ma$i")) // overlap with a
    val merged = Kmv.mergeSketches(
        Kmv.minK(a.toDF("grp", "item"), "grp", "item", k),
        Kmv.minK(b.toDF("grp", "item"), "grp", "item", k), k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val direct = Kmv.minK((a ++ b).toDF("grp", "item"), "grp", "item", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(merged === direct)
  }

  test("deterministic across partitionings") {
    val items = (0 until 2000).map(i => (s"s${i % 3}", s"it$i"))
    val x = Kmv.pairwiseOverlap(
      Kmv.minK(items.toDF("grp", "item").repartition(13), "grp", "item", 64), 64)
      .collect().toSet
    val y = Kmv.pairwiseOverlap(
      Kmv.minK(items.toDF("grp", "item").coalesce(1), "grp", "item", 64), 64)
      .collect().toSet
    assert(x == y)
  }
}
