package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private val composable = {
    aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)
  }

  test("native kernel is bit-identical to the aggregate/zip_with fold") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2), Seq(0.3, 0.7)),
      ((1 to 200).map(i => i * 0.137), (1 to 200).map(i => 1.0 / i))
    ).toDF("a", "b")
    val bad = df.select(
      DotProduct.dotProduct(col("a"), col("b")).as("fast"),
      composable.as("slow")
    ).where(col("fast") =!= col("slow"))
    assert(bad.count() === 0)
  }

  test("float arrays fold in double precision") {
    val df = Seq((Seq(1.5f, 2.5f), Seq(2.0f, 4.0f))).toDF("a", "b")
    assert(df.select(DotProduct.dotProduct(col("a"), col("b")))
      .head().getDouble(0) === 13.0)
  }

  test("length mismatch and null inputs yield null") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
    assert(df.select(DotProduct.dotProduct(col("a"), col("b"))).head().isNullAt(0))
    val dfn = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(dfn.select(DotProduct.dotProduct(col("a"), col("b"))).head().isNullAt(0))
  }
}
