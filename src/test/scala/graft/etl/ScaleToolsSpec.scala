package graft.etl

import graft.SparkSpec
import graft.sources.Bucketed
import org.apache.spark.sql.functions._

class ScaleToolsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join of co-bucketed tables plans without a shuffle") {
    val fact = (1L to 1000L).map(i => (i % 50, s"f$i")).toDF("k", "fv")
    val dim = (0L until 50L).map(i => (i, s"d$i")).toDF("k", "dv")
    Bucketed.writeBucketed(fact, "bkt_fact", "k", 8)
    Bucketed.writeBucketed(dim, "bkt_dim", "k", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = Bucketed.read(spark, "bkt_fact")
        .join(Bucketed.read(spark, "bkt_dim"), "k")
      assert(j.count() === 1000)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join returns exactly the plain join's rows") {
    // heavy skew: 90% of fact rows carry key 0
    val fact = (1L to 2000L)
      .map(i => (if (i % 10 == 0) i % 7 else 0L, s"f$i")).toDF("k", "fv")
    val dim = (0L until 7L).map(i => (i, s"d$i")).toDF("k", "dv")
    val salted = Skew.saltedEquiJoin(fact, dim, "k", salts = 8)
      .orderBy("k", "fv").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val plain = fact.join(dim, "k")
      .orderBy("k", "fv").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(salted.toSeq === plain.toSeq)
    // the hot key's rows actually spread across several salts
    val spread = fact.where($"k" === 0)
      .withColumn("_salt", pmod(xxhash64(struct(col("k"), col("fv"))), lit(8)))
      .select("_salt").distinct().count()
    assert(spread > 4)
  }

  test("salted join refuses dim-preserving join types") {
    val fact = Seq((1L, "f")).toDF("k", "fv")
    val dim = Seq((1L, "d")).toDF("k", "dv")
    for (jt <- Seq("right_outer", "full_outer", "full")) {
      val e = intercept[IllegalArgumentException] {
        Skew.saltedEquiJoin(fact, dim, "k", salts = 4, joinType = jt)
      }
      assert(e.getMessage.contains("fact-preserving"), jt)
    }
    // left_outer keeps unmatched FACT rows exactly once
    val fact2 = Seq((1L, "f1"), (9L, "f9")).toDF("k", "fv")
    val lo = Skew.saltedEquiJoin(fact2, dim, "k", salts = 4,
      joinType = "left_outer")
    assert(lo.count() === 2)
  }
}
