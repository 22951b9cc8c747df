package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sources.VersionedTable

/** Streaming CDC into a [[graft.sources.VersionedTable]]: every
  * micro-batch MERGEs (upsert by key) as one table version, carrying a
  * transaction id derived from (queryName, batchId).  Structured
  * Streaming's at-least-once `foreachBatch` redelivery — a batch
  * replayed after a crash-before-checkpoint, or a restart from an older
  * checkpoint — hits the table's txn ledger and returns the version the
  * batch already committed, so the TABLE is exactly-once even though
  * the STREAM is not: the standard idempotent-sink construction
  * (Delta's txnAppId/txnVersion), here on the engine's own format.
  *
  * Scale: each micro-batch commit is the copy-on-write merge — one
  * find-touched semi-join against the broadcast batch keys, a rewrite
  * of only the touched files, one manifest write.  Steady-state
  * streaming upsert cost is proportional to the batch's key spread
  * over files, not to table size; table history grows one manifest per
  * batch (vacuum reclaims superseded data files on whatever horizon
  * the deployment keeps for time travel).
  */
object VersionedSink {

  /** Start the upsert stream.  The first batch on a fresh root loads
    * the table (merge needs a parent snapshot); every later batch
    * merges.  Batch txn ids are `queryName#batchId`.
    *
    * DUPLICATE-KEY CONTRACT (inherited from [[VersionedTable.merge]]):
    * a micro-batch must carry at most one row per `idCol` — true by
    * construction for streaming aggregations in update mode, where each
    * batch emits one changed row per key.  A raw CDC event stream can
    * carry several events per key per batch; pass `orderCol` (the event
    * sequence / timestamp column) and the merge resolves keep-last
    * deterministically.  Without `orderCol`, a duplicate-key batch
    * FAILS the batch (and the query) rather than silently committing a
    * table with two rows for one key. */
  def upsertStream(df: DataFrame, root: String, idCol: String,
      numFiles: Int, checkpoint: String, queryName: String,
      orderCol: Option[String] = None)
      : StreamingQuery =
    df.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val txn = Some(s"$queryName#$batchId")
        if (!batch.isEmpty) {
          if (VersionedTable.latestVersion(s, root).isEmpty)
            // the load path must honor the same one-row-per-key
            // contract as merge: dedupe (or assert) the first batch too
            VersionedTable.append(s, root,
              VersionedTable.dedupeKeepLast(batch, idCol, orderCol),
              idCol, numFiles, op = "load", txnId = txn)
          else
            VersionedTable.merge(s, root, batch, idCol, numFiles,
              txnId = txn, orderCol = orderCol)
        }
        ()
      }
      .start()
}
