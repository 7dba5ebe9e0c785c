package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class DeflateSizeSpec extends SparkSpec {
  import spark.implicits._

  private def z(s: String): Int = DeflateSize.compute(UTF8String.fromString(s))

  test("separates repetition, natural text and noise by ratio") {
    val rep = "a" * 400
    val natural = "the quick brown fox jumps over the lazy dog and then " +
      "the dog chases the fox back over the same lazy river bank again"
    val rnd = new java.util.Random(42)
    val noise = (0 until 400).map(_ => (33 + rnd.nextInt(94)).toChar).mkString
    val rRep = z(rep).toDouble / rep.length
    val rNat = z(natural).toDouble / natural.length
    val rNoise = z(noise).toDouble / noise.length
    assert(rRep < 0.1, s"repetition ratio $rRep")
    assert(rNat > rRep && rNat < rNoise,
      s"natural $rNat not between repetition $rRep and noise $rNoise")
    assert(rNoise > 0.7, s"noise ratio $rNoise")
  }

  test("deterministic across repeated calls (thread-local deflater resets cleanly)") {
    val s = "some moderately compressible payload " * 5
    val first = z(s)
    assert((0 until 50).forall(_ => z(s) == first))
    // interleave other inputs to prove reset isolates rows
    z("x" * 1000); z("")
    assert(z(s) === first)
  }

  test("empty string deflates to the minimal final block, not zero") {
    assert(z("") > 0 && z("") < 5)
  }

  test("output exceeding the 8k scratch buffer is still counted fully") {
    val rnd = new java.util.Random(7)
    val big = (0 until 40000).map(_ => (33 + rnd.nextInt(94)).toChar).mkString
    val n = z(big)
    assert(n > 8192, s"expected multi-buffer output, got $n")
    assert(n <= big.getBytes("UTF-8").length + 64)
  }

  test("column form: codegen participation and null propagation") {
    val local = Seq(Some("abcabcabc"), None).toDF("t")
      .select(DeflateSize.deflateSize(col("t")).as("n")).collect()
    assert(local(0).getInt(0) > 0 && local(1).isNullAt(0))
    val df = spark.range(4).select(
      DeflateSize.deflateSize(concat(lit("payload "), col("id").cast("string")))
        .as("n"))
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
    assert(df.collect().forall(_.getInt(0) > 0))
  }

  test("SQL registration: deflate_size callable after registerFunctions") {
    org.apache.spark.sql.GraftColumnBridge.registerFunctions(spark)
    val n = spark.sql("SELECT deflate_size('aaaaaaaaaaaaaaaaaaaaaaaa') AS n")
      .head.getInt(0)
    assert(n > 0 && n < 24)
  }
}
