package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LineSelfDedupSpec extends SparkSpec {
  import spark.implicits._

  test("repeats struck, first kept, order and blanks preserved") {
    val docs = Seq(
      (1L, "a\nb\na\n\nb\nc"),
      (2L, "x\nx\nx")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLinesWithinDoc(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("clean_text") == "a\nb\n\nc")
    assert(out(1L).getAs[Long]("n_kept") == 4)
    assert(out(1L).getAs[Long]("n_dropped") == 2)
    assert(out(2L).getAs[String]("clean_text") == "x")
    assert(out(2L).getAs[Long]("n_dropped") == 2)
  }

  test("whitespace-variant lines dedup on the trimmed form but keep the original") {
    val docs = Seq((1L, "  hello \nhello\nworld")).toDF("doc_id", "text")
    val r = Dedup.dedupLinesWithinDoc(docs, "doc_id", "text").head()
    // the FIRST occurrence (with its original whitespace) survives
    assert(r.getAs[String]("clean_text") == "  hello \nworld")
  }

  test("null text and clean docs pass through") {
    val docs = Seq((1L, null: String), (2L, "a\nb")).toDF("doc_id", "text")
    val out = Dedup.dedupLinesWithinDoc(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("clean_text") == "")
    assert(out(2L).getAs[String]("clean_text") == "a\nb")
    assert(out(2L).getAs[Long]("n_dropped") == 0)
  }

  test("deterministic across partitionings") {
    val docs = (0 until 200)
      .map(i => (i.toLong, s"line${i % 7}\nshared\nline${i % 7}\nshared"))
      .toDF("doc_id", "text")
    val a = Dedup.dedupLinesWithinDoc(docs.repartition(11), "doc_id", "text")
      .collect().toSet
    val b = Dedup.dedupLinesWithinDoc(docs.coalesce(1), "doc_id", "text")
      .collect().toSet
    assert(a == b)
  }
}
