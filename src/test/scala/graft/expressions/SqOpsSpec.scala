package graft.expressions

import graft.SparkSpec
import graft.sim.Ann
import org.apache.spark.sql.functions._

class SqOpsSpec extends SparkSpec {
  import spark.implicits._

  test("encode/dot round trip: sq_dot approximates the exact dot within step error") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(50)((
      Seq.fill(16)(rnd.nextFloat() * 4 - 2),
      Seq.fill(16)(rnd.nextFloat() * 4 - 2)))
    val df = rows.toDF("q", "v")
      .withColumn("enc", SqOps.sqEncode($"v"))
      .withColumn("approx", SqOps.sqDot($"q", $"enc"))
      .withColumn("exact", Ann.dot($"q", $"v"))
    val got = df.select($"approx", $"exact").collect()
    for (r <- got) {
      // worst-case error: sum_i |q_i| * step/2 <= 16 * 2 * (4/255)/2
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 16 * 2 * (4.0 / 255),
        s"approx ${r.getDouble(0)} vs exact ${r.getDouble(1)}")
    }
  }

  test("constant vector encodes step 0 and dots exactly") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(0.5f, 0.5f, 0.5f)))
      .toDF("q", "v")
      .withColumn("enc", SqOps.sqEncode($"v"))
    val enc = df.select($"enc.vmin", $"enc.vstep").head()
    assert(enc.getFloat(0) === 0.5f)
    assert(enc.getFloat(1) === 0.0f)
    val d = df.select(SqOps.sqDot($"q", $"enc")).head().getDouble(0)
    assert(math.abs(d - (1 + 2 + 3) * 0.5) < 1e-6)
  }

  test("dimension mismatch and empty vectors yield NULL") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)))
      .toDF("q", "v")
      .withColumn("enc", SqOps.sqEncode($"v"))
      .withColumn("d", SqOps.sqDot($"q", $"enc"))
    assert(df.select($"d").head().isNullAt(0))
    val empty = Seq(Tuple1(Seq.empty[Float])).toDF("v")
      .select(SqOps.sqEncode($"v").as("enc"))
    assert(empty.head().isNullAt(0))
  }

  test("non-finite elements encode to NULL, not a poisoned Inf/NaN score") {
    val df = Seq(
      Seq(Float.NaN, Float.NaN),                  // all NaN
      Seq(1.0f, Float.NaN, 3.0f),                 // NaN among finites
      Seq(1.0f, Float.PositiveInfinity),          // Inf
      Seq(1.0f, 2.0f)                             // control: finite
    ).map(Tuple1(_)).toDF("v")
      .select(SqOps.sqEncode($"v").as("enc"))
      .collect()
    assert(df(0).isNullAt(0))
    assert(df(1).isNullAt(0))
    assert(df(2).isNullAt(0))
    assert(!df(3).isNullAt(0))
  }

  test("sq_dot accepts a parquet-persisted encoding (nullable-loosened struct)") {
    val dir = java.nio.file.Files.createTempDirectory("sqstore").toString + "/t"
    Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("q", "v")
      .withColumn("enc", SqOps.sqEncode($"v"))
      .write.parquet(dir)
    // parquet marks every struct field nullable; the type check must
    // match on field types, not exact StructType equality
    val back = spark.read.parquet(dir)
      .select(SqOps.sqDot($"q", $"enc").as("d")).head().getDouble(0)
    assert(math.abs(back - (1 * 3 + 2 * 4)) < 0.05)
  }

  test("SQL registration: sq_dot(q, sq_encode(v)) round-trips") {
    org.apache.spark.sql.GraftColumnBridge.registerFunctions(spark)
    val d = spark.sql(
      """SELECT sq_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |  sq_encode(array(CAST(3.0 AS FLOAT), CAST(3.0 AS FLOAT)))) AS d"""
        .stripMargin).head().getDouble(0)
    assert(math.abs(d - 9.0) < 1e-6)
  }

  test("identical vectors rank first under sqTopK (planted guarantee)") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Seq(1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Ann.sqTopK(vecs.where($"vec_id" === 1), vecs,
        "vec_id", "embedding", k = 3, rerank = 4)
      .orderBy("rank").collect()
    assert(out.head.getAs[Long]("neighbor_id") === 4L)
  }
}
