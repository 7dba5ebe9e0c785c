package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class BitmapOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bitmap_from_ids packs bits; jaccard matches set arithmetic") {
    val df = Seq(
      (Seq(0, 3, 8, 64, 100), Seq(3, 8, 99), 101),
      (Seq(0), Seq(0), 101),
      (Seq(1, 2), Seq(3, 4), 101))
      .toDF("a", "b", "nb")
    val out = df.select(
      BitmapOps.bitmapJaccard(
        BitmapOps.bitmapFromIds(col("a"), col("nb")),
        BitmapOps.bitmapFromIds(col("b"), col("nb"))).as("j"))
      .collect().map(_.getDouble(0))
    assert(out(0) === 2.0 / 6.0)  // inter {3,8}=2, union 6
    assert(out(1) === 1.0)
    assert(out(2) === 0.0)
  }

  test("out-of-range id yields NULL bitmap (filter-don't-throw)") {
    val df = Seq((Seq(0, 7), 8), (Seq(0, 8), 8), (Seq(-1), 8))
      .toDF("ids", "nb")
    val out = df.select(
      BitmapOps.bitmapFromIds(col("ids"), col("nb")).isNull.as("n"))
      .collect().map(_.getBoolean(0))
    assert(out.toSeq === Seq(false, true, true))
  }

  test("unequal bitmap lengths zero-extend (cross-vocab safety)") {
    // {0,1} over 16 bits vs {0, 100} over 128 bits: inter {0}, union 3
    val df = Seq((Seq(0, 1), 16, Seq(0, 100), 128)).toDF("a", "na", "b", "nb")
    val j = df.select(BitmapOps.bitmapJaccard(
        BitmapOps.bitmapFromIds(col("a"), col("na")),
        BitmapOps.bitmapFromIds(col("b"), col("nb"))))
      .head().getDouble(0)
    assert(j === 1.0 / 3.0)
  }

  test("property: bitmap jaccard == JaccardSim on random id sets") {
    val genIds = Gen.listOfN(30, Gen.chooseNum(0, 499)).map(_.distinct)
    val cases = (1 to 25).map { i =>
      (genIds.pureApply(Gen.Parameters.default, Seed(11L + i)),
        genIds.pureApply(Gen.Parameters.default, Seed(1100L + i)))
    }
    val df = cases.toDF("a", "b")
    val rows = df.select(
        BitmapOps.bitmapJaccard(
          BitmapOps.bitmapFromIds(col("a"), lit(500)),
          BitmapOps.bitmapFromIds(col("b"), lit(500))).as("bm"),
        JaccardSim.jaccardSim(
          transform(col("a"), x => concat(lit("t"), x)),
          transform(col("b"), x => concat(lit("t"), x))).as("arr"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("interpreted eval matches codegen (tail strides over 8 bytes)") {
    // 70 bits -> 8-byte stride + 1-byte tail on one side, longer other side
    val df = Seq((Seq(0, 63, 64, 69), 70, Seq(63, 64, 200), 201))
      .toDF("a", "na", "b", "nb")
    val viaKernel = df.select(BitmapOps.bitmapJaccard(
        BitmapOps.bitmapFromIds(col("a"), col("na")),
        BitmapOps.bitmapFromIds(col("b"), col("nb"))))
      .head().getDouble(0)
    assert(viaKernel === 2.0 / 5.0)
    // direct (interpreted) call agrees
    val bm1 = BitmapOps.fromIds(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(0, 63, 64, 69)), 70)
    val bm2 = BitmapOps.fromIds(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(63, 64, 200)), 201)
    assert(BitmapOps.jaccard(bm1, bm2) === 2.0 / 5.0)
  }

  test("SQL registration: bitmap_from_ids / bitmap_jaccard") {
    org.apache.spark.sql.GraftColumnBridge.registerFunctions(spark)
    val j = spark.sql(
      """SELECT bitmap_jaccard(bitmap_from_ids(array(1, 2), 10),
        |                      bitmap_from_ids(array(2, 3), 10)) AS j""".stripMargin)
      .head().getDouble(0)
    assert(j === 1.0 / 3.0)
  }
}
