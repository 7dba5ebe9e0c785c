package graft

/** The approximate (no-oracle) queries plant an identical pair
  * (ids −2/−1) into their input; identical inputs are deterministically
  * co-bucketed by MinHash/SimHash/LSH/IVF, so `planted_ok` must be true
  * on every row and the output can never be empty — the affirmative
  * signal the driver's rows-only gate reads. */
class PlantedPairSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val approximate = Seq("q21_dedup_minhash", "q22_dedup_simhash",
    "q25_dedup_embedding_lsh", "q31_ann_lsh", "q32_ann_ivf",
    "q51_multimodal_frame_dedup", "q54_cluster_collapse", "q66_ann_pq",
    "q85_semantic_dedup", "q96_ann_sq", "q107_compress_ratio",
    "q119_knn_graph", "q123_contrastive_triples", "q126_semantic_clusters",
    "q130_curation_pipeline", "q145_image_dhash", "q147_image_collapse",
    "q149_audio_fingerprint", "q150_video_frame_dedup", "q151_gif_dhash",
    "q152_jpeg_dhash")

  for (name <- approximate) {
    test(s"$name recovers the planted identical pair") {
      val out = SparkEntry.queries(name)(spark, sfDir)
      val rows = out.collect()
      assert(rows.nonEmpty, s"$name output empty despite planted pair")
      assert(rows.forall(_.getAs[Boolean]("planted_ok")),
        s"$name lost the planted pair (guaranteed-recall bug)")
      // beyond the recall-1 planted pair: measured recall against the
      // exact probe-block answer must clear the query's declared floor
      // (deterministic data + seeds -> a constant per scale factor)
      if (out.columns.contains("recall_ok")) {
        val measured = rows.head.getAs[Double]("measured_recall")
        assert(rows.forall(_.getAs[Boolean]("recall_ok")),
          s"$name measured recall $measured fell below its declared floor")
      }
    }
  }

  test("q150 planted identical videos report with ALL 8 frames") {
    import org.apache.spark.sql.functions.col
    // identical payloads hash identically per frame, so the planted
    // pair must clear the vote with 8/8 — the documented claim, which
    // the in-query planted_ok gate also pins (n_frames = 8, not ≥ 6)
    val r = SparkEntry.queries("q150_video_frame_dedup")(spark, sfDir)
      .where(col("id_a") === -2L && col("id_b") === -1L)
      .collect()
    assert(r.length === 1, "planted video pair missing or duplicated")
    assert(r.head.getAs[Long]("n_frames") === 8L,
      s"planted pair voted with ${r.head.getAs[Long]("n_frames")}/8 frames")
  }
}
