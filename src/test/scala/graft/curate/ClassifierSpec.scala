package graft.curate

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // Three token populations with distinct vocabularies plus a shared
  // stopword; "mixed" docs borrow fruit vocabulary so they confuse
  // toward that class.
  private val docs = (
    (1L to 30L).map(i => (i, "the apple banana cherry apple banana", "fruit")) ++
    (31L to 60L).map(i => (i, "the xray yankee zulu xray yankee", "nato")) ++
    (61L to 90L).map(i => (i, "the rock jazz blues rock jazz", "music")) ++
    (91L to 96L).map(i => (i, "the apple banana apple banana apple", "mixed"))
  ).toDF("doc_id", "text", "source")

  private def confusion(buckets: Int = 64) =
    Classifier.confusionMatrix(docs, "doc_id", "text", "source", buckets)

  test("separable classes classify to themselves; mixed confuses to fruit") {
    val m = confusion().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_docs"))
      .toMap
    assert(m(("fruit", "fruit")) === 30L)
    assert(m(("nato", "nato")) === 30L)
    assert(m(("music", "music")) === 30L)
    // mixed docs share fruit's exact token stream but fruit has 5x the
    // prior mass and denser counts — they classify as fruit
    assert(m(("mixed", "fruit")) === 6L)
    assert(!m.contains(("mixed", "mixed")))
  }

  test("classify is partition-independent (integer micro-nat scores)") {
    val (counts, docCounts) =
      Classifier.classCounts(docs, "doc_id", "text", "source", 64)
    val model = Classifier.modelFromCounts(spark, counts, docCounts, 64)
    val a = Classifier.classify(docs, "doc_id", "text", "source", model, 64)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSet
    val b = Classifier.classify(docs.repartition(7), "doc_id", "text",
        "source", model, 64)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSet
    assert(a === b)
  }

  test("argmax ties break to the lexicographically lowest class") {
    // Two classes with IDENTICAL token streams and equal doc counts:
    // every cell of the model matches, so every score ties and every
    // doc must predict the lexicographically lowest of the two.
    val tied = (
      (1L to 10L).map(i => (i, "alpha beta gamma", "zeta")) ++
      (11L to 20L).map(i => (i, "alpha beta gamma", "eta"))
    ).toDF("doc_id", "text", "source")
    val m = Classifier.confusionMatrix(tied, "doc_id", "text", "source", 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("zeta", "eta")) === 10L)
    assert(m(("eta", "eta")) === 10L)
  }

  test("docs without canonical tokens emit nothing; model stays dense") {
    val withEmpty = docs.unionByName(
      Seq((999L, "  --  ", "fruit")).toDF("doc_id", "text", "source"))
    val total = Classifier.confusionMatrix(
        withEmpty, "doc_id", "text", "source", 64)
      .agg(sum("n_docs")).head.getLong(0)
    assert(total === 96L)
    // dense model: every (class, bucket) cell present, seen or not
    val (counts, docCounts) =
      Classifier.classCounts(docs, "doc_id", "text", "source", 64)
    assert(Classifier.modelFromCounts(spark, counts, docCounts, 64)
      .count() === 4L * 64L)
  }

  test("model probe broadcasts; no corpus-scale exchange on the model side") {
    val plan = confusion().queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"model join should broadcast the dense S*B table:\n$plan")
  }

  test("calibration: bands partition the docs, counts and ppm are exact") {
    val model = Classifier.trainModel(docs, "doc_id", "text", "source", 64)
    val cal = Classifier.calibration(docs, "doc_id", "text", "source",
      model, buckets = 64, bandMicro = 200000L, maxBand = 9).collect()
    // every evidence-bearing doc lands in exactly one band
    assert(cal.map(_.getAs[Long]("n_docs")).sum == 96L)
    cal.foreach { r =>
      val (n, c) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_correct"))
      assert(c <= n)
      assert(r.getAs[Long]("accuracy_ppm") == 1000000L * c / n)
      val band = r.getAs[Long]("band")
      val mean = r.getAs[Long]("mean_margin_micro")
      assert(band == 9L || (mean >= band * 200000L && mean < (band + 1) * 200000L),
        s"band $band mean margin $mean outside its band")
    }
    // exactly the 90 separable docs are correct overall (the 6 mixed
    // docs predict fruit — wrong by construction, whatever their band)
    assert(cal.map(_.getAs[Long]("n_correct")).sum == 90L)
  }

  test("calibration is partition-independent") {
    val model = Classifier.trainModel(docs, "doc_id", "text", "source", 64)
    val a = Classifier.calibration(docs, "doc_id", "text", "source",
      model, 64).collect().toSet
    val b = Classifier.calibration(docs.repartition(5), "doc_id", "text",
      "source", model, 64).collect().toSet
    assert(a == b)
  }

  test("logisticRegression separates a planted vocabulary; bias row present") {
    val lr = Seq.tabulate(40) { i =>
      if (i % 2 == 0) (i.toLong, 1, s"shiny great excellent prose item$i")
      else (i.toLong, 0, s"junk spam garbage noise item$i")
    }.toDF("doc_id", "y", "text")
    val w = Classifier.logisticRegression(lr, "doc_id", "text", col("y"),
        buckets = 64, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.size === 65 && w.contains(-1L))
    def bucketOf(tok: String): Long = spark.sql(
      s"SELECT CAST(conv(substring(md5('$tok'), 1, 8), 16, 10) AS BIGINT) % 64")
      .head().getLong(0)
    // positive-class tokens train positive weights, negative negative
    for (t <- Seq("shiny", "great", "excellent"))
      assert(w(bucketOf(t)) > 0L, s"'$t' weight ${w(bucketOf(t))}")
    for (t <- Seq("junk", "spam", "garbage"))
      assert(w(bucketOf(t)) < 0L, s"'$t' weight ${w(bucketOf(t))}")
  }

  test("logisticRegression training is partition-independent (integer gradients)") {
    val lr = Seq.tabulate(30) { i =>
      (i.toLong, i % 2, s"token$i alpha beta ${if (i % 2 == 0) "pos" else "neg"}")
    }.toDF("doc_id", "y", "text")
    val a = Classifier.logisticRegression(lr, "doc_id", "text", col("y"),
      buckets = 32, rounds = 3).collect().toSet
    val b = Classifier.logisticRegression(lr.repartition(7), "doc_id", "text",
      col("y"), buckets = 32, rounds = 3).collect().toSet
    assert(a === b)
  }

  test("logisticScore: verdict rides the integer score; featureless docs score bias") {
    val lr = Seq.tabulate(40) { i =>
      if (i % 2 == 0) (i.toLong, 1, s"shiny great excellent prose item$i")
      else (i.toLong, 0, s"junk spam garbage noise item$i")
    }.toDF("doc_id", "y", "text")
    val w = Classifier.logisticRegression(lr, "doc_id", "text", col("y"),
      buckets = 64, rounds = 2)
    val toScore = lr.select(col("doc_id"), col("text"))
      .unionByName(Seq((999L, "   ")).toDF("doc_id", "text"))
    val got = Classifier.logisticScore(toScore, "doc_id", "text", w, 64)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // the training rows separate: positives keep, negatives drop
    for (i <- 0 until 40) {
      val keep = got(i.toLong)._3
      assert(keep === (i % 2 == 0), s"doc $i keep=$keep")
      assert(got(i.toLong)._3 === (got(i.toLong)._1 >= 0L),
        "verdict must equal the integer-score sign")
    }
    // the blank doc scores exactly the bias
    val bias = w.where(col("b") === -1L).head().getLong(1)
    assert(got(999L)._1 === bias)
  }

  test("logisticScore fails loudly on a model without a bias row") {
    val docs = Seq((1L, "some text")).toDF("doc_id", "text")
    val noBias = Seq((0L, 5L), (1L, -3L)).toDF("b", "w_micro")
    val e = intercept[IllegalArgumentException] {
      Classifier.logisticScore(docs, "doc_id", "text", noBias, 64)
    }
    assert(e.getMessage.contains("bias row"))
  }

  test("logisticRegression round-1 weights from zero init are closed-form") {
    // w = 0 -> sigma = 0.5 exactly -> resid = +-500000; w1[b] =
    // floorDiv(500000 * (n_pos_b - n_neg_b), n)
    // buckets mod 16: up=12, down=10, left=14, north=7 — no collisions
    val lr = Seq(
      (1L, 1, "up left"), (2L, 1, "up north"), (3L, 0, "down left")
    ).toDF("doc_id", "y", "text")
    val w = Classifier.logisticRegression(lr, "doc_id", "text", col("y"),
        buckets = 16, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def bucketOf(tok: String): Long = spark.sql(
      s"SELECT CAST(conv(substring(md5('$tok'), 1, 8), 16, 10) AS BIGINT) % 16")
      .head().getLong(0)
    assert(w(bucketOf("up")) === Math.floorDiv(500000L * 2, 3))
    assert(w(bucketOf("down")) === Math.floorDiv(-500000L, 3))
    assert(w(-1L) === Math.floorDiv(500000L * (2 - 1), 3))
  }
}
