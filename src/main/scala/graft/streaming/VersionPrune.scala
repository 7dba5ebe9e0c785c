package graft.streaming

import org.apache.spark.sql.SparkSession

/** Retention for the versioned SNAPSHOT stores ([[StreamingRollup]],
  * [[StreamingHeavyHitters]], [[IncrementalPipeline]]'s dim store) —
  * the counterpart of [[StoreCompaction]], which serves the per-batch
  * APPEND stores. Every batch of a snapshot store writes a FULL new
  * `v<batchId>` directory and readers only consume the latest, so a
  * long-lived stream accumulates dead history until listing and disk
  * — not data — dominate.
  *
  * Replay safety sets the floor: a batch replayed after a crash
  * rebuilds from versions strictly BELOW its id
  * ([[IncrementalPipeline.readLatestDim]]'s contract), so the newest
  * version's PREDECESSOR must survive pruning until the newest
  * batch's checkpoint commit is certain — `keep = 2` (the default)
  * retains exactly that pair. Crash safety of the prune itself:
  * deletion runs oldest-first and never touches the retained set, so
  * an interrupted prune leaves a store every reader and replay still
  * accepts, and a re-run converges.
  */
object VersionPrune {

  /** Delete all but the newest `keep` versions. Returns the pruned
    * version ids (oldest first). No-op on a missing store. */
  def keepLatest(
      spark: SparkSession,
      storePath: String,
      keep: Int = 2): Seq[Long] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val base = new org.apache.hadoop.fs.Path(storePath)
    // Resolve the filesystem OF THE STORE PATH, not the default FS —
    // a store on a non-default scheme (s3a:// with a local default)
    // would otherwise "not exist" and never be pruned.
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Seq.empty
    val versions = fs.listStatus(base).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toLong)
      .sorted
    val doomed = versions.dropRight(keep)
    doomed.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$storePath/v$v"), true)
    }
    doomed.toSeq
  }
}
