package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PseudonymizeSpec extends SparkSpec {
  import spark.implicits._

  private val customers = Seq((1L, "alice"), (2L, "bob"), (3L, "carol"))
    .toDF("cust_id", "name")
  private val orders = Seq((10L, 1L, 50.0), (11L, 1L, 30.0), (12L, 3L, 20.0))
    .toDF("order_id", "cust_id", "amount")

  test("tokens are deterministic, salted, and non-reversible-looking") {
    val t = Pseudonymize.tokenize(customers, "s3cret", "cust_id")
      .collect().map(r => r.getAs[String]("name") -> r.getAs[String]("cust_id")).toMap
    val t2 = Pseudonymize.tokenize(customers.repartition(5), "s3cret", "cust_id")
      .collect().map(r => r.getAs[String]("name") -> r.getAs[String]("cust_id")).toMap
    assert(t === t2)
    assert(t.values.forall(_.matches("[0-9a-f]{64}")))
    assert(t.values.toSet.size === 3)
    // a different salt yields a disjoint token universe
    val other = Pseudonymize.tokenize(customers, "other", "cust_id")
      .collect().map(_.getAs[String]("cust_id")).toSet
    assert(other.intersect(t.values.toSet).isEmpty)
  }

  test("referential integrity survives: joins on tokens equal joins on keys") {
    val raw = orders.join(customers, "cust_id")
      .groupBy("name").agg(sum("amount").as("total"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val tc = Pseudonymize.tokenize(customers, "s", "cust_id")
    val to = Pseudonymize.tokenize(orders, "s", "cust_id")
    val tok = to.join(tc, "cust_id")
      .groupBy("name").agg(sum("amount").as("total"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(raw === tok)
  }

  test("null keys stay null instead of colliding on a shared token") {
    val withNull = Seq((Some(1L), "a"), (None, "b"), (None, "c"))
      .toDF("cust_id", "name")
    val t = Pseudonymize.tokenize(withNull, "s", "cust_id").collect()
      .map(r => r.getAs[String]("name") -> Option(r.getAs[String]("cust_id"))).toMap
    assert(t("b").isEmpty && t("c").isEmpty && t("a").nonEmpty)
  }

  test("tokenization is a narrow projection: no shuffle, no UDF") {
    val plan = Pseudonymize.tokenize(orders, "s", "cust_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"no shuffle expected:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
