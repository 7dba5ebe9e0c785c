package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JaccardSimSpec extends SparkSpec {
  import spark.implicits._

  private val composable = {
    val a = col("a"); val b = col("b")
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter).cast("double")
  }

  test("native kernel is value-identical to the composable form") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("a")),
      (Seq("a", "b"), Seq("c", "d")),
      (Seq("x", "y", "z", "w"), Seq("z")),
      ((1 to 300).map("t" + _), (150 to 450).map("t" + _))
    ).toDF("a", "b")
    val bad = df.select(
      JaccardSim.jaccardSim(col("a"), col("b")).as("fast"),
      composable.as("slow")
    ).where(col("fast") =!= col("slow"))
    assert(bad.count() === 0)
  }

  test("registers as a SQL function") {
    org.apache.spark.sql.GraftColumnBridge.registerFunctions(spark)
    val r = spark.sql(
      "SELECT jaccard_sim(array('a','b','c'), array('b','c','d')) AS j").head()
    assert(math.abs(r.getDouble(0) - 0.5) < 1e-12)
  }

  test("null array propagates null") {
    val df = Seq((Some(Seq("a")), Option.empty[Seq[String]]))
      .toDF("a", "b")
    val r = df.select(JaccardSim.jaccardSim(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("participates in whole-stage codegen") {
    val df = spark.range(10).selectExpr(
      "array(cast(id AS string), 'b') AS a",
      "array('b', cast(id + 1 AS string)) AS b")
    val q = df.select(JaccardSim.jaccardSim(col("a"), col("b")).as("j"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project"))
    assert(q.agg(sum("j")).head().getDouble(0) > 0.0) // actually executes
  }
}
