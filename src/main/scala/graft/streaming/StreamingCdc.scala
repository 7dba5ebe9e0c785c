package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.etl.Cdc

/** Streaming CDC state maintenance — the streaming tier of
  * [[graft.etl.Cdc]] (q92's operator), and the shape of every
  * Debezium→lakehouse pipeline: each micro-batch of change records
  * (upserts + delete tombstones) folds into the keyed state table with
  * `Cdc.applyLog`, so the serving view stays current at
  * O(|batch| + |state|) per trigger.
  *
  * Because `applyLog` retains tombstones, application COMPOSES across
  * any batch boundary (a later batch carrying an older update cannot
  * resurrect a deleted key) — micro-batch slicing cannot change the
  * final state, which is exactly the property a replayed/rewound
  * stream needs. Versioned store + batch-id gating give replay
  * idempotence (same contract as [[StreamingRollup]] /
  * [[IncrementalPipeline.readLatestDim]]).
  */
object StreamingCdc {

  /** The per-batch kernel `start` wires into foreachBatch: read the
    * pre-batch state (versions < batchId — replay-safe), merge, write
    * v$batchId. Pure DataFrame logic, unit-testable without a
    * streaming context. */
  def runBatch(
      batch: DataFrame,
      batchId: Long,
      key: String,
      tsCol: String,
      tieCol: String,
      opCol: String,
      storePath: String): Unit = {
    val spark = batch.sparkSession
    val empty = batch.where(org.apache.spark.sql.functions.lit(false))
    val old = IncrementalPipeline.readLatestDim(
      spark, storePath, empty, beforeVersion = batchId)
    Cdc.applyLog(old, batch, key, tsCol, tieCol, opCol)
      .write.mode("overwrite").parquet(s"$storePath/v$batchId")
  }

  /** Wire a streaming change-record source into CDC maintenance. Query
    * the serving view with `Cdc.current(spark.read.parquet(latest),
    * opCol)`; compact tombstones offline with `Cdc.compact` once the
    * replication-lateness horizon passes. */
  def start(
      stream: DataFrame,
      key: String,
      tsCol: String,
      tieCol: String,
      opCol: String,
      storePath: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        runBatch(batch, batchId, key, tsCol, tieCol, opCol, storePath)
      }
      .start()
}
