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

  test("jsonl reads line-delimited JSON; corrupt lines surface, not vanish") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl")
    val f = dir.resolve("part0.jsonl")
    java.nio.file.Files.write(f, java.util.Arrays.asList(
      """{"doc_id": 1, "text": "hello", "lang": "en"}""",
      """{"doc_id": 2, "text": "welt", "lang": "de"}""",
      """{"doc_id": 3, "text": "truncated...""""))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val df = Tables.jsonl(spark, f.toString, schema)
    val rows = df.collect()
    assert(rows.length === 3)
    val good = rows.filter(_.isNullAt(3))
    assert(good.map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    val bad = rows.filter(!_.isNullAt(3))
    assert(bad.length === 1 &&
      bad.head.getString(3).startsWith("""{"doc_id": 3"""))
  }
}
