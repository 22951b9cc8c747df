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

  /** Apply a CDC EVENT stream — rows tagged `_change_type` in
    * {insert, update_postimage, update_preimage, delete} — to the
    * table, exactly-once: the generalization of [[upsertStream]] to
    * streams that also carry deletes (a Debezium-shaped feed, another
    * table's change feed, any upstream emitting row-level ops).
    *
    * Per micro-batch: `update_preimage` rows are dropped first (they
    * echo OLD state and must never win a keep-last race against their
    * own postimage); with `orderCol` the remaining events resolve
    * keep-last PER KEY ACROSS CHANGE TYPES — a key whose latest event
    * is a delete deletes, anything else upserts — so one batch may
    * carry a key's whole insert→update→delete life and land on the
    * right end state.  Without `orderCol` a key may appear at most
    * once per batch (loud failure otherwise, like [[upsertStream]]).
    * Upserts MERGE; deletes apply MERGE-ON-READ by default
    * ([[VersionedTable.deleteMoR]] — a steady delete trickle must not
    * rewrite files per batch; schedule [[VersionedTable.purgeDeletes]]
    * as maintenance), copy-on-write with `morDeletes = false`.  The
    * batch's merge and delete carry distinct batch-derived txn ids,
    * so crash-replay re-applies NEITHER half.
    *
    * Scale: delete keys stay a DISTRIBUTED DataFrame end to end
    * ([[VersionedTable.deleteMoRKeys]] / [[VersionedTable.deleteKeys]])
    * — a bulk-delete micro-batch (a replayed purge, a retention
    * sweep's tombstone flood) must never materialize its key set on
    * the driver or as an `isin` literal expression.  The batch is
    * persisted and ONE count-by-type action gates both halves. */
  def applyCdcStream(df: DataFrame, root: String, idCol: String,
      numFiles: Int, checkpoint: String, queryName: String,
      orderCol: Option[String] = None, morDeletes: Boolean = true)
      : StreamingQuery =
    df.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyCdcBatch(batch, root, idCol, numFiles,
          s"$queryName#$batchId", orderCol, morDeletes)
      }
      .start()

  /** One CDC micro-batch's apply — the body shared by
    * [[applyCdcStream]] and the graft-table connector sink's
    * `cdc=true` mode.  `txnPrefix` must be unique per (query, batch):
    * the merge and delete halves commit under `<prefix>#m` /
    * `<prefix>#d`, so crash-replay re-applies neither. */
  def applyCdcBatch(batch: DataFrame, root: String, idCol: String,
      numFiles: Int, txnPrefix: String,
      orderCol: Option[String], morDeletes: Boolean): Unit = {
    import org.apache.spark.sql.functions._
    val s = batch.sparkSession
    val events = batch
      .filter(col("_change_type") =!= "update_preimage")
    val winners = VersionedTable
      .dedupeKeepLast(events, idCol, orderCol).persist()
    try {
      // ONE action over the persisted winners gates both halves —
      // a separate `isEmpty` probe would be an extra Spark job per
      // micro-batch at high commit rates
      val typeCounts = winners.groupBy(col("_change_type")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val nUpserts =
        typeCounts.filterNot(_._1 == "delete").values.sum
      if (nUpserts > 0L) {
        // _commit_version is CDF BOOKKEEPING (present when the feed
        // came from a readChangeFeed stream): it orders keep-last
        // dedupe above, but must never merge into the replica's
        // schema — drop it with the change-type tag
        val upserts = winners
          .filter(col("_change_type") =!= "delete")
          .drop("_change_type", "_commit_version")
        if (VersionedTable.latestVersion(s, root).isEmpty)
          VersionedTable.append(s, root, upserts, idCol, numFiles,
            op = "load", txnId = Some(s"$txnPrefix#m"))
        else
          VersionedTable.merge(s, root, upserts, idCol, numFiles,
            txnId = Some(s"$txnPrefix#m"))
      }
      // delete keys stay a DISTRIBUTED frame — see the object doc
      if (typeCounts.getOrElse("delete", 0L) > 0L &&
        VersionedTable.latestVersion(s, root).isDefined) {
        val deleteKeys = winners
          .filter(col("_change_type") === "delete")
          .select(col(idCol))
        if (morDeletes)
          VersionedTable.deleteMoRKeys(s, root, deleteKeys, idCol,
            txnId = Some(s"$txnPrefix#d"))
        else
          VersionedTable.deleteKeys(s, root, deleteKeys, idCol,
            numFiles, txnId = Some(s"$txnPrefix#d"))
      }
      ()
    } finally { winners.unpersist(); () }
  }
}
