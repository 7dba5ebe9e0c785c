package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class Doc(doc_id: Long, text: String, ts: java.sql.Timestamp)

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def doc(id: Long, text: String, at: String) = Doc(id, text, ts(at))

  test("distinctByFingerprint emits only first occurrences across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingDedup
      .distinctByFingerprint(input.toDF(), "doc_id", "text", "ts", "1 day")
      .writeStream.format("memory").queryName("sd_distinct")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        doc(1, "the same text", "2024-01-01 10:00:00"),
        doc(2, "another text", "2024-01-01 10:01:00"))
      q.processAllAvailable()
      input.addData(
        doc(3, "The  Same   Text", "2024-01-01 11:00:00"), // canonical dup of 1
        doc(4, "fresh text", "2024-01-01 11:01:00"))
      q.processAllAvailable()
      val ids = spark.table("sd_distinct")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("annotateOccurrences numbers duplicates and points at the first doc") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingDedup
      .annotateOccurrences(input.toDF(), "doc_id", "text", "ts", "1 hour")
      .writeStream.format("memory").queryName("sd_annot")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        doc(10, "dup me", "2024-01-01 10:00:00"),
        doc(11, "unique one", "2024-01-01 10:01:00"))
      q.processAllAvailable()
      input.addData(
        doc(12, "dup me", "2024-01-01 11:00:00"),
        doc(13, "dup me", "2024-01-01 12:00:00"))
      q.processAllAvailable()
      // documents number off only once the watermark passes them:
      // heartbeats walk it past every real event
      input.addData(doc(90, "heartbeat", "2024-01-02 00:00:00"))
      q.processAllAvailable()
      input.addData(doc(91, "heartbeat two", "2024-01-02 01:00:00"))
      q.processAllAvailable()
      val rows = spark.table("sd_annot")
        .orderBy("docId")
        .collect()
        .map(r => (r.getAs[Long]("docId"), r.getAs[Long]("occurrence"),
          r.getAs[Long]("firstDocId")))
      assert(rows.contains((10L, 1L, 10L)))
      assert(rows.contains((11L, 1L, 11L)))
      // batch-2 duplicates attribute to doc 10 with increasing counts
      val dups = rows.filter(r => r._1 == 12L || r._1 == 13L)
      assert(dups.map(_._3).toSet === Set(10L))
      assert(dups.map(_._2).sorted.toSeq === Seq(2L, 3L))
    } finally q.stop()
  }

  test("annotateOccurrences forgets a fingerprint after the state TTL") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingDedup
      .annotateOccurrences(input.toDF(), "doc_id", "text", "ts", "1 minute",
        stateTtlMs = 60 * 1000L)
      .writeStream.format("memory").queryName("sd_ttl")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(doc(30, "ephemeral", "2024-01-01 10:00:00"))
      q.processAllAvailable()
      // push the watermark far beyond 10:00 + 1 min TTL -> state expires
      input.addData(doc(31, "unrelated", "2024-01-02 10:00:00"))
      q.processAllAvailable()
      // the same text re-arrives after expiry: a fresh first occurrence
      input.addData(doc(32, "ephemeral", "2024-01-02 10:00:30"))
      q.processAllAvailable()
      // walk the watermark past doc 32 so it numbers off
      input.addData(doc(33, "also unrelated", "2024-01-02 11:00:00"))
      q.processAllAvailable()
      input.addData(doc(34, "more unrelated", "2024-01-02 12:00:00"))
      q.processAllAvailable()
      val r32 = spark.table("sd_ttl").where("docId = 32").collect()
      assert(r32.length === 1)
      assert(r32.head.getAs[Long]("occurrence") === 1L)
      assert(r32.head.getAs[Long]("firstDocId") === 32L)
    } finally q.stop()
  }

  test("annotateOccurrences equals batch event-time ranks under shuffled slicings") {
    // occurrence numbers are event-time ranks, so they must be
    // independent of how the engine slices arrivals into micro-batches
    // and of cross-batch reordering within the watermark. A seeded
    // shuffle delivers the corpus out of order across many triggers;
    // the result must equal the batch row_number over (ts, doc_id).
    implicit val sqlCtx = spark.sqlContext
    val base = ts("2024-01-01 00:00:00").getTime
    val docs = (for { g <- 0 until 5; i <- 0 until 8 } yield
      Doc(g * 100L + i, s"group text $g",
        new java.sql.Timestamp(base + i * 60000L + (g % 3) * 1000L))).toVector
    // equal timestamps inside a group exercise the (ts, docId) tie-break
    val corpus = docs ++ Seq(
      Doc(900, "group text 0", docs(2).ts),
      Doc(901, "group text 1", docs(9).ts))
    val rnd = new scala.util.Random(19)
    val slices = rnd.shuffle(corpus).grouped(7).toSeq
    val input = MemoryStream[Doc]
    val q = StreamingDedup
      .annotateOccurrences(input.toDF(), "doc_id", "text", "ts", "2 hours")
      .writeStream.format("memory").queryName("sd_shuf")
      .outputMode(OutputMode.Append).start()
    try {
      for (s <- slices) { input.addData(s: _*); q.processAllAvailable() }
      input.addData(doc(999, "heartbeat", "2024-01-02 00:00:00"))
      q.processAllAvailable()
      input.addData(doc(998, "heartbeat two", "2024-01-03 00:00:00"))
      q.processAllAvailable()
      val streamed = spark.table("sd_shuf").collect()
        .map(r => (r.getAs[Long]("docId"), r.getAs[Long]("occurrence"),
          r.getAs[Long]("firstDocId")))
        .filter(_._1 < 990L).toSet
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = Window.partitionBy("text").orderBy("ts", "doc_id")
      val batch = corpus.toDF()
        .withColumn("occurrence", row_number().over(w).cast("long"))
        .withColumn("firstDocId", first("doc_id").over(w))
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Long]("occurrence"), r.getAs[Long]("firstDocId"))).toSet
      assert(streamed === batch,
        s"diverged: ${streamed.diff(batch)} vs ${batch.diff(streamed)}")
    } finally q.stop()
  }
}
