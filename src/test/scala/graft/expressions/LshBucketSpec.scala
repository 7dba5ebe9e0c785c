package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

class LshBucketSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: the unrolled Column form's math — left-to-right double
    * fold of vec(j) · planeComponent((table<<16)|p, j), sign bit per
    * plane. */
  private def ref(v: Seq[Float], numPlanes: Int, table: Int): Long =
    (0 until numPlanes).foldLeft(0L) { (bits, p) =>
      val proj = v.indices.foldLeft(0.0)((acc, j) =>
        acc + v(j).toDouble * LshBucket.planeComponent((table << 16) | p, j))
      if (proj >= 0) bits | (1L << p) else bits
    }

  private val vecs = Seq(
    (1L, Seq(1.0f, 0.0f, -0.5f, 2.0f)),
    (2L, Seq(-0.9f, 0.1f, 3.0f, 0.0f)),
    (3L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
    (4L, Seq(1.0f, 0.0f, -0.5f, 2.0f))
  ).toDF("id", "v")

  test("kernel matches the reference fold across planes and tables") {
    for (table <- Seq(0, 1, 3); planes <- Seq(1, 6, 16)) {
      val got = vecs.orderBy("id")
        .select(LshBucket.lshBucket(col("v"), 4, planes, table))
        .collect().map(_.getLong(0)).toSeq
      val want = Seq(
        Seq(1.0f, 0.0f, -0.5f, 2.0f), Seq(-0.9f, 0.1f, 3.0f, 0.0f),
        Seq(0.0f, 0.0f, 0.0f, 0.0f), Seq(1.0f, 0.0f, -0.5f, 2.0f))
        .map(ref(_, planes, table))
      assert(got === want, s"table=$table planes=$planes")
    }
  }

  test("identical vectors share a bucket in every table") {
    for (table <- 0 until 4) {
      val b = vecs.where(col("id").isin(1L, 4L))
        .select(LshBucket.lshBucket(col("v"), 4, 8, table))
        .collect().map(_.getLong(0))
      assert(b(0) === b(1))
    }
  }

  test("double arrays accepted; short array yields bucket 0; null propagates") {
    val r = Seq((Seq(1.0, -2.0, 0.5), Seq(1.0f), null: Seq[Float]))
      .toDF("d", "short", "n")
      .select(
        LshBucket.lshBucket(col("d"), 3, 4),
        LshBucket.lshBucket(col("short"), 4, 4),
        LshBucket.lshBucket(col("n"), 4, 4))
      .head()
    assert(!r.isNullAt(0))
    assert(r.getLong(1) === 0L)
    assert(r.isNullAt(2))
  }

  test("non-numeric-array input is an analysis error") {
    val bad = Seq((Seq(1, 2, 3), "x")).toDF("ints", "s")
    intercept[AnalysisException] {
      bad.select(LshBucket.lshBucket(col("ints"), 3, 2)).collect()
    }
    intercept[AnalysisException] {
      bad.select(LshBucket.lshBucket(col("s"), 3, 2)).collect()
    }
  }

  test("out-of-range numPlanes/table/dim are analysis errors (Long packs 64 bits)") {
    // 1L << p wraps mod 64, so planes 65+ would silently alias onto bits
    // 0-63; the bound lives in the expression so the SQL path errors too
    for ((dim, planes, table) <- Seq((4, 0, 0), (4, 65, 0), (4, 6, -1),
        (4, 6, 1 << 15), (0, 6, 0))) {
      intercept[AnalysisException] {
        vecs.select(LshBucket.lshBucket(col("v"), dim, planes, table)).collect()
      }
    }
    // boundary values are fine
    vecs.select(LshBucket.lshBucket(col("v"), 4, 64, (1 << 15) - 1)).collect()
  }

  test("lsh_bucket and dot_product register as SQL functions") {
    org.apache.spark.sql.GraftColumnBridge.registerFunctions(spark)
    val r = spark.sql(
      """SELECT lsh_bucket(array(1.0F, 0.0F, -0.5F, 2.0F), 4, 6) AS b0,
        |       lsh_bucket(array(1.0F, 0.0F, -0.5F, 2.0F), 4, 6, 1) AS b1,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp
        |""".stripMargin).head()
    assert(r.getLong(0) === ref(Seq(1.0f, 0.0f, -0.5f, 2.0f), 6, 0))
    assert(r.getLong(1) === ref(Seq(1.0f, 0.0f, -0.5f, 2.0f), 6, 1))
    assert(r.getDouble(2) === 11.0)
    // non-literal plane count is rejected with a clear message
    val e = intercept[Exception] {
      spark.sql("SELECT lsh_bucket(array(1.0F), cast(rand()*4 AS INT), 2)")
        .collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("DotProduct rejects integer arrays instead of reading garbage") {
    val df = Seq((Seq(1, 2), Seq(1.0f, 2.0f))).toDF("ints", "floats")
    intercept[AnalysisException] {
      df.select(DotProduct.dotProduct(col("ints"), col("floats"))).collect()
    }
  }
}
