package graft.curate

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 400L)
    .map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "zh",
      5L + i % 17))
    .toDF("id", "lang", "toks")

  test("hashSample is deterministic and partition-independent") {
    val a = Curation.hashSample(docs, "id", 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Curation.hashSample(docs.repartition(7), "id", 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    // roughly the requested rate (md5 is uniform; 400 rows, loose bound)
    assert(a.size > 400 * 0.15 && a.size < 400 * 0.45, a.size)
  }

  test("hashSample rates are monotone nested: sample(0.2) subset of sample(0.5)") {
    val small = Curation.hashSample(docs, "id", 0.2)
      .select("id").collect().map(_.getLong(0)).toSet
    val big = Curation.hashSample(docs, "id", 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
  }

  test("stratifiedSample: rate 1 keeps all, rate 0 keeps none, default applies") {
    val out = Curation.stratifiedSample(docs, "id", "lang",
      Map("de" -> 1.0, "zh" -> 0.0), defaultRate = 0.5)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("de") === totals("de"))
    assert(!byLang.contains("zh"))
    val enKept = byLang.getOrElse("en", 0L).toDouble / totals("en")
    assert(enKept > 0.25 && enKept < 0.75, enKept)
  }

  test("mixtureRates: targets normalize, caps report deficit, absent strata drop") {
    // en: 134 docs, de: 134, zh: 132 (toks 5..21 cycling) — exact masses
    val avail = docs.groupBy("lang").agg(sum("toks")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // weights normalize 4:1 → 0.8/0.2; budget 2·avail(de) makes the de
    // target 1.6·avail (capped, deficit) while en subsamples at ~0.4
    val budget = avail("de") * 2
    val out = Curation.mixtureRates(docs, "lang", "toks",
        Map("de" -> 4.0, "en" -> 1.0), budget)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(!out.contains("zh"), "untargeted stratum must be absent")
    val (deAvail, deTarget, deRate, deDeficit) = out("de")
    assert(deAvail === avail("de"))
    assert(deTarget === budget * 0.8)
    assert(deRate === 1.0, "undersupplied stratum caps at 1")
    assert(deDeficit === budget * 0.8 - avail("de"))
    val (_, _, enRate, enDeficit) = out("en")
    assert(enRate === (budget * 0.2) / avail("en") && enRate < 1.0)
    assert(enDeficit === 0.0)
  }

  test("mixtureSample: capped stratum keeps every row; sampling is by-value") {
    val avail = docs.groupBy("lang").agg(sum("toks")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = avail("de") * 2
    val targets = Map("de" -> 4.0, "en" -> 1.0)
    val out = Curation.mixtureSample(docs, "id", "lang", "toks",
      targets, budget)
    val kept = out.select("id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(kept.count(_._2 == "de") === docs.where($"lang" === "de").count(),
      "rate-1 stratum keeps all rows")
    assert(!kept.exists(_._2 == "zh"))
    // partition-independent: identical selection after repartition
    val again = Curation.mixtureSample(docs.repartition(13), "id", "lang",
        "toks", targets, budget)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again === kept.map(_._1).toSet)
    // en keeps roughly rate · |en| (uniform md5, loose bound)
    val enRate = (budget * 0.2) / avail("en")
    val enKept = kept.count(_._2 == "en").toDouble /
      docs.where($"lang" === "en").count()
    assert(math.abs(enKept - enRate) < 0.25, s"enKept $enKept vs rate $enRate")
  }

  test("sampleFixedK equals the naive single-window top-k and is exact-size") {
    val got = Curation.sampleFixedK(docs, "id", "lang", k = 7)
      .select("id", "lang", "sample_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    // naive reference: one global window per stratum
    val w = Window.partitionBy($"lang").orderBy($"_hk", $"id")
    val want = docs
      .withColumn("_hk", md5(concat($"id".cast("string"), lit("graft"))))
      .withColumn("sample_rank", row_number().over(w))
      .where($"sample_rank" <= 7)
      .select("id", "lang", "sample_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got === want)
    // every stratum has > 7 rows, so each contributes exactly k
    assert(got.size === 3 * 7)
    // partition-layout independence
    val re = Curation.sampleFixedK(docs.repartition(11), "id", "lang", k = 7)
      .select("id", "lang", "sample_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(re === got)
  }

  test("sampleWeightedK equals the naive priority window and favors weight") {
    val got = Curation.sampleWeightedK(docs, "id", "lang", "toks", k = 9)
      .select("id", "lang", "sample_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    // naive reference: one global priority window per stratum
    val u = (conv(substring(md5(concat($"id".cast("string"), lit("graft"))), 1, 8), 16, 10)
      .cast("long") + 1L).cast("double") / 4294967296.0
    val w = Window.partitionBy($"lang").orderBy($"_pri".desc, $"id")
    val want = docs
      .withColumn("_pri", $"toks".cast("double") / u)
      .withColumn("sample_rank", row_number().over(w))
      .where($"sample_rank" <= 9)
      .select("id", "lang", "sample_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got === want)
    assert(got.size === 3 * 9)
    // weighting bites: winners' mean weight exceeds the population mean
    val winners = Curation.sampleWeightedK(docs, "id", "lang", "toks", k = 9)
      .agg(avg($"toks")).head().getDouble(0)
    val popMean = docs.agg(avg($"toks")).head().getDouble(0)
    assert(winners > popMean, s"winners mean $winners <= population $popMean")
  }

  test("sampleWeightedK drops non-positive weights") {
    val tiny = Seq((1L, "en", 5L), (2L, "en", 0L), (3L, "en", -4L))
      .toDF("id", "lang", "toks")
    val kept = Curation.sampleWeightedK(tiny, "id", "lang", "toks", k = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L))
  }

  test("sampleFixedK clips to stratum size when k exceeds it") {
    val tiny = Seq((1L, "en"), (2L, "en"), (3L, "de")).toDF("id", "lang")
    val out = Curation.sampleFixedK(tiny, "id", "lang", k = 10)
    assert(out.count() === 3)
    val ranks = out.select("lang", "sample_rank").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(ranks === Set(("en", 1), ("en", 2), ("de", 1)))
  }

  test("tokenBudget equals the naive single-window prefix semantics") {
    val budgets = Map("en" -> 300L, "de" -> 150L) // zh unlisted -> dropped
    val got = Curation.tokenBudget(docs, "id", "lang", "toks", budgets)
      .select("id").collect().map(_.getLong(0)).toSet
    // naive reference: one global window per stratum
    val w = Window.partitionBy($"lang").orderBy($"_hk", $"id")
    val want = docs
      .where($"lang".isin("en", "de"))
      .withColumn("_hk", md5(concat($"id".cast("string"), lit("graft"))))
      .withColumn("running", sum($"toks").over(w))
      .where($"running" <= when($"lang" === "en", 300L).otherwise(150L))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("packSequences lays docs end-to-end: offsets chain, bins cut at ctxLen") {
    val packed = Curation.packSequences(docs, "id", "lang", "toks", ctxLen = 64)
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("id"),
        r.getAs[Long]("toks"), r.getAs[Long]("bin_id"),
        r.getAs[Long]("bin_offset")))
    assert(packed.length === 400)
    // reconstruct each stratum's concatenation order and check the
    // global start positions chain with no gaps or overlaps
    for ((_, rows) <- packed.groupBy(_._1)) {
      val byStart = rows.sortBy(r => r._4 * 64 + r._5)
      var pos = 0L
      for ((_, _, toks, bin, off) <- byStart) {
        assert(bin === pos / 64)
        assert(off === pos % 64)
        pos += toks
      }
    }
    // partition-independence: same layout after repartitioning
    val re = Curation.packSequences(docs.repartition(7), "id", "lang",
        "toks", ctxLen = 64)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("bin_id"),
        r.getAs[Long]("bin_offset"))).toSet
    assert(re === packed.map(r => (r._2, r._4, r._5)).toSet)
  }

  /** Reference blocked BFD in plain Scala: same declared semantic
    * (length desc, md5 asc, id asc; rank blocks; fullest-fitting bin,
    * ties to lowest bin id). */
  private def refBfd(rows: Seq[(Long, String, Long)], ctx: Long,
      blockDocs: Int): Map[Long, (String, Long, Long, Long, Long, Long)] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    rows.groupBy(_._2).flatMap { case (g, rs) =>
      val ordered = rs
        .map { case (id, _, n) => (id, math.min(n, ctx)) }
        .sortBy { case (id, n) => (-n, md5hex(s"${id}graft-bfd"), id) }
      ordered.grouped(blockDocs).zipWithIndex.flatMap { case (block, blk) =>
        val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
        block.map { case (id, n) =>
          val fitting = loads.zipWithIndex.filter(_._1 + n <= ctx)
          val (bin, off) =
            if (fitting.isEmpty) { loads += n; (loads.size - 1, 0L) }
            else {
              val bestLoad = fitting.map(_._1).max
              val i = fitting.find(_._1 == bestLoad).get._2
              val o = loads(i); loads(i) += n; (i, o)
            }
          id -> (g, blk.toLong, bin.toLong, off)
        }.map { case (id, (gg, blk2, bin, off)) =>
          id -> (gg, 0L, blk2, bin, off, loads(bin.toInt))
        }
      }
    }.map { case (id, (g, _, blk, bin, off, load)) =>
      id -> (g, math.min(rows.find(_._1 == id).get._3, ctx), blk, bin,
        off, load)
    }
  }

  test("packBinsBfd matches a plain-Scala reference BFD and is partition-independent") {
    val rows = (1L to 400L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "zh",
        5L + (i * 13) % 90))
    val df = rows.toDF("id", "lang", "toks")
    val got = Curation.packBinsBfd(df, "id", "lang", "toks",
        ctxLen = 128L, blockDocs = 64)
      .collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[String]("lang"),
        r.getAs[Long]("n_eff"), r.getAs[Long]("block"),
        r.getAs[Long]("bin"), r.getAs[Long]("bin_offset"),
        r.getAs[Long]("bin_load"))).toMap
    val want = refBfd(rows, 128L, 64)
    assert(got.size === 400)
    assert(got === want)
    // bins never overflow, offsets sit inside the bin
    got.values.foreach { case (_, n, _, _, off, load) =>
      assert(load <= 128L && off + n <= load)
    }
    // partition-independence
    val re = Curation.packBinsBfd(df.repartition(7), "id", "lang",
        "toks", ctxLen = 128L, blockDocs = 64)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("block"),
        r.getAs[Long]("bin"), r.getAs[Long]("bin_offset"))).toSet
    assert(re === got.map { case (id, (_, _, blk, bin, off, _)) =>
      (id, blk, bin, off) }.toSet)
  }

  test("packBinsBfd wastes less padding than whole-doc arrival packing") {
    val rows = (1L to 300L).map(i => (i, "en", 40L + (i * 7) % 300))
    val df = rows.toDF("id", "lang", "toks")
    val packed = Curation.packBinsBfd(df, "id", "lang", "toks",
      ctxLen = 512L, blockDocs = 256)
    val bfdBins = packed.select("block", "bin").distinct().count()
    // naive whole-doc packing in id order: new bin when the next doc
    // would overflow
    var naive = 1L; var cur = 0L
    rows.map(r => math.min(r._3, 512L)).foreach { n =>
      if (cur + n > 512L) { naive += 1; cur = n } else cur += n
    }
    assert(bfdBins <= naive, s"BFD $bfdBins bins vs naive $naive")
    // oversize docs clamp (declared truncation) and occupy a whole bin
    val big = Seq((1L, "en", 9999L), (2L, "en", 10L)).toDF("id", "lang", "toks")
    val bigPacked = Curation.packBinsBfd(big, "id", "lang", "toks",
        ctxLen = 512L, blockDocs = 256)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_eff"), r.getAs[Long]("bin"))).toMap
    assert(bigPacked(1L)._1 === 512L)
  }

  test("uniform tokenBudget overload equals the Map form over all present strata") {
    val strata = docs.select("lang").distinct()
      .collect().map(_.getString(0))
    val viaMap = Curation.tokenBudget(docs, "id", "lang", "toks",
        strata.map(_ -> 200L).toMap)
      .select("id").collect().map(_.getLong(0)).toSet
    val uniform = Curation.tokenBudget(docs, "id", "lang", "toks", 200L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(uniform === viaMap)
    assert(uniform.nonEmpty)
  }

  test("tokenBudget totals respect each stratum's budget") {
    val budgets = Map("en" -> 300L, "de" -> 150L, "zh" -> 5L)
    val out = Curation.tokenBudget(docs, "id", "lang", "toks", budgets)
    val sums = out.groupBy("lang").agg(sum("toks").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums.getOrElse("en", 0L) <= 300L)
    assert(sums.getOrElse("de", 0L) <= 150L)
    assert(sums.getOrElse("zh", 0L) <= 5L)
  }

  test("leakageSafeSplit: cluster members share one split, singletons default to own id") {
    val df = (0L until 400L).toDF("id")
    // clusters: {0..9} -> comp 0, {100..104} -> comp 100
    val clusters = ((0L until 10L).map(i => (i, 0L))
      ++ (100L until 105L).map(i => (i, 100L))).toDF("id", "comp")
    val out = Curation.leakageSafeSplit(df, "id", clusters,
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[String]("split"))).toMap
    // every cluster member inherits the cluster's single split
    assert((0L until 10L).map(out(_)).toSet.size === 1)
    assert((100L until 105L).map(out(_)).toSet.size === 1)
    assert(out(3L)._1 === 0L && out(103L)._1 === 100L)
    // singletons: own id as cluster, same assignment as plain assignSplit
    val plain = Curation.assignSplit((200L until 400L).toDF("id"), "id",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("split"))
      .toMap
    for (i <- 200L until 400L) {
      assert(out(i)._1 === i)
      assert(out(i)._2 === plain(i))
    }
    // total partition: every row assigned
    assert(out.size === 400)
  }

  test("assignSplit: total partition, deterministic, roughly proportional") {
    val df = (0L until 1000L).toDF("id")
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val counts = Curation.assignSplit(df, "id", splits)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 1000L)          // nothing dropped
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("val") < 180)
    assert(counts("test") > 50 && counts("test") < 180)
    // deterministic: repartitioned input assigns identically
    val a = Curation.assignSplit(df, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Curation.assignSplit(df.repartition(7), "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
    intercept[IllegalArgumentException] {
      Curation.assignSplit(df, "id", Seq(("a", 0.5), ("b", 0.4)))
    }
  }

  test("chunkSpans: overlapping windows chain, last chunk clips, empty skipped") {
    val df = Seq((1L, 70L), (2L, 10L), (3L, 0L)).toDF("id", "toks")
    val got = Curation.chunkSpans(df, "id", "toks", chunkLen = 32, overlap = 8)
      .orderBy("id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, 0L, 0L, 32L, 32L),   // starts step 24: 0, 24, 48
      (1L, 1L, 24L, 56L, 32L),
      (1L, 2L, 48L, 70L, 22L),  // clipped to doc end
      (2L, 0L, 0L, 10L, 10L)))  // short doc -> one clipped chunk; doc 3 none
  }

  test("quantileCutoff: exact interpolated percentiles and band keep count") {
    // stratum a: values 1..5 -> p25 = 2.0, p50 = 3.0, p90 = 4.6;
    // band [2.0, 4.6] keeps {2,3,4} = 3 rows
    val df = ((1 to 5).map(v => ("a", v.toDouble)) ++
      Seq(("b", 10.0), ("b", 20.0))).toDF("src", "v")
    val got = Curation.quantileCutoff(df, "src", "v", 0.25, 0.5, 0.9)
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      ("a", 2.0, 3.0, 4.6, 5L, 3L),
      // stratum b: p25 = 12.5, p50 = 15.0, p90 = 19.0 -> band keeps none
      // of {10, 20}? 10 < 12.5, 20 > 19.0 -> 0
      ("b", 12.5, 15.0, 19.0, 2L, 0L)))
  }

  test("quantileCutoff approx tier tracks exact within the GK rank bound") {
    // the 100 TB tier: approx_percentile must not buffer a stratum, and
    // its cutoffs must sit within accuracy's rank-error bound of exact.
    // Skewed stratum: 900 small values + a heavy tail of large ones.
    val vals = (1 to 900).map(_.toDouble) ++
      (1 to 100).map(i => 10000.0 + i * 1000.0)
    val df = vals.map(("a", _)).toDF("src", "v")
    val exact = Curation.quantileCutoff(df, "src", "v", 0.25, 0.5, 0.9)
      .select("p_lo", "p_mid", "p_hi").head()
    val approx = Curation
      .quantileCutoff(df, "src", "v", 0.25, 0.5, 0.9,
        exact = false, accuracy = 10000)
      .select("p_lo", "p_mid", "p_hi").head()
    // n = 1000, accuracy = 10000 -> rank error <= n/accuracy < 1 rank;
    // approx picks an actual sample value, exact interpolates between
    // neighbors, so they may differ by at most one inter-value step
    val sorted = vals.sorted
    for (i <- 0 until 3) {
      val e = exact.getDouble(i)
      val a = approx.getDouble(i)
      val idx = sorted.indexWhere(_ >= e - 1e-6)
      val lo = sorted(math.max(idx - 1, 0))
      val hi = sorted(math.min(idx + 1, sorted.size - 1))
      assert(a >= lo && a <= hi,
        s"approx cutoff $a outside [$lo, $hi] around exact $e")
    }
    // same output schema and stratum bookkeeping on both tiers
    val aRow = Curation.quantileCutoff(df, "src", "v", 0.25, 0.5, 0.9,
      exact = false).head()
    assert(aRow.length === 6)
  }

  test("temperatureMixture: weights are sqrt-flattened shares, exact and partition-independent") {
    // strata token masses 100 / 400 / 2500: natural shares 1/30, 4/30,
    // 25/30 -> sqrt weights 10/80, 20/80, 50/80 (flattened toward
    // uniform: small stratum 3.75x upsampled relative to share)
    val rows =
      (1L to 10L).map(i => (i, "a", 10L)) ++
        (11L to 30L).map(i => (i, "b", 20L)) ++
        (31L to 80L).map(i => (i, "c", 50L))
    val df = rows.toDF("id", "src", "toks")
    val out = Curation.temperatureMixture(df, "id", "src", "toks", 800L)
    val w = out.select("src", "weight_ppm", "sample_rate").distinct()
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(w("a")._1 === 125000L)
    assert(w("b")._1 === 250000L)
    assert(w("c")._1 === 625000L)
    // rates: budget.w/avail = 800*.125/100 = 1 (cap), 800*.25/400 = .5,
    // 800*.625/2500 = .2
    assert(w("a")._2 === 1.0)
    assert(math.abs(w("b")._2 - 0.5) < 1e-9)
    assert(math.abs(w("c")._2 - 0.2) < 1e-9)
    // capped stratum keeps every row; selection is by value
    val kept = out.select("id").collect().map(_.getLong(0)).toSet
    assert((1L to 10L).forall(kept))
    val again = Curation
      .temperatureMixture(df.repartition(7), "id", "src", "toks", 800L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again === kept)
  }

  test("epochShuffle: dense per-shard positions, naive-window-identical, partition-independent") {
    val ids = (1L to 500L).toDF("id")
    val out = Curation.epochShuffle(ids, "id", shards = 4, epoch = 2)
      .select("id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.length === 500)
    // positions are a dense 0..n-1 enumeration inside each shard
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq)
    }
    // equals the naive single-window formulation
    val naive = ids
      .withColumn("_m", md5(concat($"id".cast("string"), lit("graft-epoch-2"))))
      .withColumn("shard",
        pmod(conv(substring($"_m", 1, 8), 16, 10).cast("long"), lit(4L)).cast("int"))
      .withColumn("shard_pos",
        row_number().over(Window.partitionBy($"shard").orderBy($"_m", $"id"))
          .cast("long") - 1L)
      .select("id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(out.toSet === naive)
    // partition-independent
    val again = Curation.epochShuffle(ids.repartition(13), "id", 4, 2)
      .select("id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(again === out.toSet)
  }

  test("epochShuffle: different epochs permute independently") {
    val ids = (1L to 300L).toDF("id")
    def order(epoch: Int): Seq[Long] =
      Curation.epochShuffle(ids, "id", shards = 1, epoch = epoch)
        .orderBy("shard_pos").select("id").collect().map(_.getLong(0)).toSeq
    val e1 = order(1)
    val e2 = order(2)
    assert(e1.toSet === e2.toSet, "same corpus, both epochs total")
    assert(e1 !== e2, "epochs must not repeat the permutation")
    // deterministic: re-deriving epoch 1 gives the identical sequence
    assert(order(1) === e1)
  }

  test("tertileBuckets: boundaries partition each stratum head/middle/tail") {
    // stratum a: values 1..9 -> q1/3 = 3.666667, q2/3 = 6.333333
    // head {1,2,3}, middle {4,5,6}, tail {7,8,9}
    val df = ((1 to 9).map(v => ("a", v.toLong)) ++
      Seq(("b", 100L), ("b", 200L), ("b", 300L))).toDF("src", "v")
    val got = Curation.tertileBuckets(df, "src", "v")
      .select("src", "v", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    assert((1 to 3).forall(v => got(("a", v.toLong)) == "head"))
    assert((4 to 6).forall(v => got(("a", v.toLong)) == "middle"))
    assert((7 to 9).forall(v => got(("a", v.toLong)) == "tail"))
    assert(got(("b", 100L)) === "head" && got(("b", 300L)) === "tail")
    // approx tier: same schema, buckets still a total partition
    val approx = Curation.tertileBuckets(df, "src", "v", exact = false)
      .groupBy("bucket").count().collect().map(_.getLong(1)).sum
    assert(approx === 12L)
  }

  test("shardManifest: XOR fingerprint is order-independent and flips on any content change") {
    val docs = (1L to 200L).map(i => (i, s"content of doc $i", 3L))
      .toDF("id", "text", "toks")
    val base = Curation.shardManifest(docs, "id", "text", "toks", 4, 1)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(base.keySet === Set(0, 1, 2, 3))
    assert(base.values.map(_._1).sum === 200L)
    // partitioning cannot change any field
    val again = Curation.shardManifest(docs.repartition(11), "id", "text",
        "toks", 4, 1)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(again === base)
    // mutate ONE doc's text: exactly that doc's shard fingerprint flips,
    // counts and token sums unchanged
    val mutated = docs.withColumn("text",
      when($"id" === 42L, lit("tampered")).otherwise($"text"))
    val tampered = Curation.shardManifest(mutated, "id", "text", "toks", 4, 1)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val changed = (0 to 3).filter(s => tampered(s)._3 != base(s)._3)
    assert(changed.size === 1, s"exactly one shard fingerprint must flip: $changed")
    assert((0 to 3).forall(s => tampered(s)._1 == base(s)._1 &&
      tampered(s)._2 == base(s)._2))
  }

  test("shardManifest shards agree with epochShuffle's assignment") {
    val docs = (1L to 100L).map(i => (i, s"t$i", 1L)).toDF("id", "text", "toks")
    val fromShuffle = Curation.epochShuffle(docs, "id", 4, 7)
      .groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val fromManifest = Curation.shardManifest(docs, "id", "text", "toks", 4, 7)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(fromManifest === fromShuffle)
  }

  test("temperatureMixture samples are nested across budgets (monotone keep sets)") {
    // rate = min(1, budget*w/avail) is monotone in budget and the
    // Bernoulli threshold compares the SAME per-id hash, so a smaller
    // budget's keep set must be a subset of a larger one's
    val rows = (1L to 400L).map { i =>
      (i, if (i % 4 == 0) "a" else if (i % 2 == 0) "b" else "c", 5L + i % 7)
    }
    val df = rows.toDF("id", "src", "toks")
    def kept(budget: Long): Set[Long] =
      Curation.temperatureMixture(df, "id", "src", "toks", budget)
        .select("id").collect().map(_.getLong(0)).toSet
    val small = kept(300L)
    val big = kept(900L)
    assert(small.subsetOf(big), s"${(small -- big).size} rows lost by growing the budget")
    assert(small.size < big.size)
  }

  test("temperatureMixture flattens LESS than uniform and MORE than natural") {
    // with alpha = 0.5 every stratum's weight sits strictly between its
    // natural share and the uniform 1/k (for non-degenerate masses)
    val rows = (1L to 300L).map { i =>
      val s = if (i <= 10) "small" else if (i <= 60) "mid" else "big"
      (i, s, 10L)
    }
    val df = rows.toDF("id", "src", "toks")
    val out = Curation.temperatureMixture(df, "id", "src", "toks", 100000L)
      .select("src", "weight_ppm").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val masses = Map("small" -> 100.0, "mid" -> 500.0, "big" -> 2400.0)
    val n = masses.values.sum
    masses.foreach { case (s, m) =>
      val natural = m / n * 1e6
      val uniform = 1e6 / 3
      val lo = math.min(natural, uniform)
      val hi = math.max(natural, uniform)
      assert(out(s) > lo - 1 && out(s) < hi + 1,
        s"$s weight ${out(s)} outside ($lo, $hi)")
    }
  }

  test("sampleQuantileProfile: k >= stratum collapses to exact quantiles") {
    val df = (1L to 9L).map(i => (i, "s", i * 10L))
      .toDF("id", "src", "v")
    val Array(row) = Curation.sampleQuantileProfile(
      df, "id", "src", "v", k = 100, loP = 0.0, midP = 0.5, hiP = 1.0)
      .collect()
    assert(row.getAs[Long]("n_rows") === 9L)
    assert(row.getAs[Long]("n_sampled") === 9L)
    assert(row.getAs[Double]("p_lo") === 10.0)   // min
    assert(row.getAs[Double]("p_mid") === 50.0)  // exact median
    assert(row.getAs[Double]("p_hi") === 90.0)   // max
  }

  test("sampleQuantileProfile: undersampled stratum reports n_sampled = k " +
      "and quantiles of the deterministic sample") {
    val df = (1L to 50L).map(i => (i, "s", i)).toDF("id", "src", "v")
    val Array(row) = Curation.sampleQuantileProfile(
      df, "id", "src", "v", k = 8, loP = 0.1, midP = 0.5, hiP = 0.9,
      salt = "t")
    .collect()
    assert(row.getAs[Long]("n_rows") === 50L)
    assert(row.getAs[Long]("n_sampled") === 8L)
    // the sample is the md5 bottom-8 — recompute it and its median
    val sampled = Curation.sampleFixedK(df, "id", "src", 8, salt = "t")
      .collect().map(_.getAs[Long]("v")).sorted
    val exp = (sampled(3) + sampled(4)) / 2.0
    assert(row.getAs[Double]("p_mid") === exp)
    // rerun is bit-identical (determinism by value, not by partitioning)
    val again = Curation.sampleQuantileProfile(
      df.repartition(7), "id", "src", "v", k = 8, loP = 0.1, midP = 0.5,
      hiP = 0.9, salt = "t").collect()
    assert(again.map(_.toSeq).toSeq === Seq(row.toSeq))
  }
}
