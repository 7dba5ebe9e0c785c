package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._
import java.nio.file.Files

class SchemaAuditSpec extends SparkSpec {
  import SchemaAudit._

  private val contract = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("amount", DoubleType, nullable = true)))

  test("diff reports added, missing, re-typed and null-loosened fields") {
    val actual = StructType(Seq(
      StructField("id", LongType, nullable = true),      // loosened
      StructField("name", IntegerType, nullable = true), // re-typed
      StructField("extra", StringType, nullable = true)))// added; amount missing
    val drift = diff(contract, actual)
    assert(drift.toSet === Set(
      NullabilityLoosened("id"),
      TypeChanged("name", StringType, IntegerType),
      Added("extra", StringType),
      Missing("amount", DoubleType)))
  }

  test("identical schemas produce no drift; extra nullability is fine") {
    assert(diff(contract, contract) === Seq.empty)
    // source STRICTER than contract (non-null where nulls allowed): ok
    val stricter = StructType(contract.fields.map(_.copy(nullable = false)))
    assert(diff(contract, stricter) === Seq.empty)
  }

  test("auditParquet reads only the footer and enforceParquet throws on drift") {
    import spark.implicits._
    val dir = Files.createTempDirectory("schemaaudit").toString + "/t"
    Seq((1L, "a", 2.5)).toDF("id", "name", "amount").write.parquet(dir)
    // parquet write makes everything nullable -> id is loosened vs contract
    val drift = auditParquet(spark, dir, contract)
    assert(drift === Seq(NullabilityLoosened("id")))
    val e = intercept[IllegalStateException] {
      enforceParquet(spark, dir, contract)
    }
    assert(e.getMessage.contains("NullabilityLoosened(id)"))
    // a contract that matches what parquet actually stores passes
    val relaxed = StructType(contract.fields.map(_.copy(nullable = true)))
    assert(auditParquet(spark, dir, relaxed) === Seq.empty)
  }
}
