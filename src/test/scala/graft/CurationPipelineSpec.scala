package graft

import graft.curate.Curation
import graft.dedup.Dedup
import graft.text.{TextAnalysis, WordGrams}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation from library pieces — the flow an
  * LLM data pipeline runs per corpus snapshot: exact dedup →
  * decontaminate against the eval split → train/val/test assignment →
  * per-stratum token budget → context chunking — with cross-stage
  * invariants asserted (no eval leakage, no dup survivors, splits
  * disjoint, budgets respected). */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("dedup -> decontaminate -> split -> budget -> chunk composes consistently") {
    val base = (0L until 60L).map { i =>
      val words = (0 until 30).map(j => s"w${(i * 7 + j * 3) % 97}")
      (i, words.mkString(" "), if (i % 2 == 0) "web" else "books")
    }
    // plant exact duplicates of docs 0 and 1, and one doc sharing a
    // 5-gram with doc 2 (contamination when doc 2 lands in eval)
    val docs = (base ++ Seq(
      (100L, base(0)._2, "web"),
      (101L, base(1)._2, "books"))).toDF("doc_id", "text", "source")

    // 1. exact dedup: keep min doc_id per canonical fingerprint
    val keep = Dedup.exact(docs, "doc_id",
        TextAnalysis.fingerprint(col("text")))
      .select(col("keep_id").as("doc_id"))
    val deduped = docs.join(keep, "doc_id")
    assert(deduped.count() === 60)
    assert(deduped.where(col("doc_id") >= 100L).count() === 0)

    // 2. split assignment, then decontaminate train against the test split
    val split = Curation.assignSplit(deduped, "doc_id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    val splitSets = split.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(splitSets.size === 60) // total partition, nothing dropped

    val train = split.where(col("split") === "train")
    val test = split.where(col("split") === "test")
    val decon = WordGrams.decontaminate(train, test, "doc_id", "text", n = 5)
    val cleanTrain = train.join(
      decon.where(!col("contaminated")).select("doc_id"), "doc_id")
    // invariant: no clean-train doc shares a 5-gram with any test doc
    val trainGrams = WordGrams.grams(cleanTrain, "doc_id", "text", 5)
      .select("gram").distinct()
    val testGrams = WordGrams.grams(test, "doc_id", "text", 5)
      .select("gram").distinct()
    assert(trainGrams.join(testGrams, "gram").count() === 0)

    // 3. per-source token budget over the clean train set
    val withTokens = cleanTrain.withColumn("n_tokens",
      TextAnalysis.tokenCount(col("text")).cast("long"))
    val budgets = Map("web" -> 300L, "books" -> 200L)
    val selected = Curation.tokenBudget(withTokens, "doc_id", "source",
      "n_tokens", budgets)
    val totals = selected.groupBy("source").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (src, t) => assert(t <= budgets(src), src) }

    // 4. chunk the selected docs; spans must tile each doc exactly
    val chunks = Curation.chunkSpans(selected, "doc_id", "n_tokens",
      chunkLen = 16, overlap = 4)
    val byDoc = chunks.groupBy("doc_id")
      .agg(max("end_tok").as("max_end"), min("start_tok").as("min_start"))
      .join(selected.select(col("doc_id"), col("n_tokens")), "doc_id")
      .collect()
    byDoc.foreach { r =>
      assert(r.getAs[Long]("min_start") === 0L)
      assert(r.getAs[Long]("max_end") === r.getAs[Long]("n_tokens"))
    }
  }

  test("quality gate -> temperature mix -> epoch shuffle -> manifest composes consistently") {
    import graft.text.GopherRules
    import graft.expressions.DeflateSize.deflateSize
    val srcOf = (i: Long) => if (i % 3 == 0) "web" else if (i % 3 == 1) "books" else "code"
    val clean = (0L until 120L).map { i =>
      val words = (0 until 24).map(j => s"word${(i * 5 + j * 7) % 83}")
      (i, ("the of and " + words.mkString(" ")), srcOf(i))
    }
    // degenerate docs the gate must drop: repetition bombs + a bullet list
    val junk = Seq(
      (900L, "a " * 200, "web"),
      (901L, "zz " * 300, "books"),
      (902L, "- one\n- two\n- three\n- four", "code"))
    val docs = (clean ++ junk).toDF("doc_id", "text", "source")

    // 1. quality gate: gopher rules + compression-ratio band
    val gated2 = GopherRules.annotate(docs, "text",
        GopherRules.Thresholds(minWords = 5, minStopWords = 1))
      .withColumn("_z", deflateSize(col("text")).cast("long"))
      .withColumn("ratio_ppm",
        expr("(1000000L * _z) div octet_length(text)"))
      .withColumn("ratio_ok",
        col("ratio_ppm") > 100000L && col("ratio_ppm") < 900000L)
    val kept = gated2.where(col("gopher_ok") && col("ratio_ok"))
      .select(col("doc_id"), col("text"), col("source"),
        col("n_words").as("n_tokens"))
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!keptIds.exists(_ >= 900L), "every junk doc must be dropped")
    assert(keptIds.size > 100, "the clean corpus must survive the gate")

    // 2. temperature mixture under a token budget: subset of the gate's
    // survivors, and rates honour the sqrt-flattened weights
    val mixed = Curation.temperatureMixture(kept, "doc_id", "source",
      "n_tokens", tokenBudget = 1500L)
    val mixedIds = mixed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(mixedIds.subsetOf(keptIds))
    assert(mixedIds.nonEmpty)

    // 3. epoch shuffle: a total partition of the mixture with dense
    // per-shard positions
    val shuffled = Curation.epochShuffle(
      mixed.select("doc_id", "text", "n_tokens"), "doc_id", shards = 4, epoch = 1)
    val rows = shuffled.select("doc_id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.map(_._1).toSet === mixedIds)
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).sorted.toSeq === (0L until g.length).toSeq)
    }

    // 4. manifest over the same epoch: totals reconcile with the
    // mixture, and a content change flips exactly one shard fingerprint
    val manifest = Curation.shardManifest(
      mixed.select("doc_id", "text", "n_tokens"),
      "doc_id", "text", "n_tokens", shards = 4, epoch = 1)
    val m = manifest.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(m.values.map(_._1).sum === mixedIds.size.toLong)
    val someId = mixedIds.head
    val tampered = Curation.shardManifest(
      mixed.select(col("doc_id"),
        when(col("doc_id") === someId, lit("tampered")).otherwise(col("text"))
          .as("text"),
        col("n_tokens")),
      "doc_id", "text", "n_tokens", shards = 4, epoch = 1)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(m.count { case (s, (_, fp)) => tampered(s) != fp } === 1)
  }
}
