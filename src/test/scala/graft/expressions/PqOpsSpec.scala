package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqOpsSpec extends SparkSpec {
  import spark.implicits._

  // m=2 subspaces, ksub=2 centroids, dsub=2: centroids at known points
  private val cb: Array[Float] = Array(
    0f, 0f,   /* j=0 c=0 */ 10f, 10f, /* j=0 c=1 */
    5f, 5f,   /* j=1 c=0 */ -5f, -5f /* j=1 c=1 */)

  test("encode picks the argmin centroid per subspace; ties to lowest code") {
    val vecs = Seq(
      (1L, Seq(1f, 1f, 4f, 4f)),    // j0 -> c0 (d=2) ; j1 -> c0 (d=2)
      (2L, Seq(9f, 9f, -4f, -6f)),  // j0 -> c1 ; j1 -> c1
      (3L, Seq(5f, 5f, 0f, 0f))     // j0 equidistant -> c0 ; j1 equidistant -> c0
    ).toDF("id", "v")
    val got = vecs.orderBy("id")
      .select(PqOps.pqEncode(col("v"), cb, 2, 2, 2))
      .collect().map(_.getSeq[Int](0))
    assert(got.toSeq === Seq(Seq(0, 0), Seq(1, 1), Seq(0, 0)))
  }

  test("short arrays encode to NULL instead of garbage") {
    val got = Seq((1L, Seq(1f, 2f))).toDF("id", "v")
      .select(PqOps.pqEncode(col("v"), cb, 2, 2, 2)).head()
    assert(got.isNullAt(0))
  }

  test("adc(codes, lut) equals the sum of per-subspace squared L2") {
    val q = Seq(1f, 2f, 3f, 4f)
    val df = Seq((1L, q)).toDF("id", "v")
      .select(PqOps.pqLut(col("v"), cb, 2, 2, 2).as("lut"))
    val lut = df.head().getSeq[Float](0)
    // lut layout [j*ksub + c]
    assert(lut(0) === (1f * 1f + 2f * 2f))           // j0 c0: (1,2) vs (0,0)
    assert(lut(1) === (9f * 9f + 8f * 8f))           // j0 c1: vs (10,10)
    assert(lut(2) === (2f * 2f + 1f * 1f))           // j1 c0: (3,4) vs (5,5)
    assert(lut(3) === (8f * 8f + 9f * 9f))           // j1 c1: vs (-5,-5)
    val adc = df
      .withColumn("codes", PqOps.pqEncode(lit(null).cast("array<float>"), cb, 2, 2, 2))
      .select(PqOps.pqAdc(
        org.apache.spark.sql.functions.array(lit(0), lit(1)), col("lut"), 2, 2))
      .head().getDouble(0)
    assert(adc === lut(0) + lut(3))
  }

  test("adc NULLs on geometry mismatch instead of throwing or misreading") {
    val lutDf = Seq((1L, Seq(1f, 2f, 3f, 4f))).toDF("id", "v")
      .select(PqOps.pqLut(col("v"), cb, 2, 2, 2).as("lut"))
    // codes shorter than m
    assert(lutDf.select(PqOps.pqAdc(array(lit(0)), col("lut"), 2, 2))
      .head().isNullAt(0))
    // a code outside [0, ksub)
    assert(lutDf.select(PqOps.pqAdc(array(lit(0), lit(2)), col("lut"), 2, 2))
      .head().isNullAt(0))
    assert(lutDf.select(PqOps.pqAdc(array(lit(-1), lit(0)), col("lut"), 2, 2))
      .head().isNullAt(0))
    // lut shorter than m*ksub (PqAdc declared with the wrong geometry)
    assert(lutDf.select(PqOps.pqAdc(array(lit(0), lit(1), lit(0)), col("lut"), 3, 2))
      .head().isNullAt(0))
    // matching geometry still scores
    assert(!lutDf.select(PqOps.pqAdc(array(lit(0), lit(1)), col("lut"), 2, 2))
      .head().isNullAt(0))
  }

  test("codebook size mismatch is an analysis error") {
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1L, Seq(1f, 2f, 3f, 4f))).toDF("id", "v")
        .select(PqOps.pqEncode(col("v"), Array(1f, 2f), 2, 2, 2)).collect()
    }
  }
}
