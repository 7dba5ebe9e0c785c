package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._
import java.nio.file.Files

class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("csv loader enforces the explicit schema; malformed fields -> NULL") {
    val dir = Files.createTempDirectory("csvsrc")
    Files.writeString(dir.resolve("data.csv"),
      "id,amount,day\n1,10.50,2024-01-02\n2,notanumber,2024-01-03\n3,7.25,baddate\n")
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("amount", DecimalType(9, 2)),
      StructField("day", DateType)))
    val df = Tables.csv(spark, dir.toString, schema)
    assert(df.schema === schema)
    val rows = df.orderBy("id").collect()
    assert(rows.length === 3)
    assert(rows(0).getDecimal(1).toString === "10.50")
    assert(rows(1).isNullAt(1))     // unparsable money -> NULL
    assert(rows(2).isNullAt(2))     // unparsable date -> NULL
  }

  test("typed ingest coercions") {
    import org.apache.spark.sql.functions._
    val df = Seq(("123.0", "45.678", Double.NaN), ("x", "bad", 1.5))
      .toDF("i", "m", "f")
    val out = df.select(
      TypedIngest.intFromStringlyFloat(col("i")),
      TypedIngest.moneyFromString(col("m")),
      TypedIngest.nanToNull(col("f"))).collect()
    assert(out(0).getLong(0) === 123L)
    assert(out(0).getDecimal(1).toString === "45.68")
    assert(out(0).isNullAt(2))
    assert(out(1).isNullAt(0))
    assert(out(1).isNullAt(1))
    assert(out(1).getDouble(2) === 1.5)
  }
}
