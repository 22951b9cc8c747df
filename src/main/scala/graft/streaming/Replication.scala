package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sources.VersionedTable

/** One-call CONTINUOUS TABLE REPLICATION: follow a source
  * [[graft.sources.VersionedTable]]'s commit log and apply every
  * version's paired change feed to a target table, exactly-once —
  * the composition [[VersionedSource.followChanges]] + txn-ledgered
  * MERGE/DELETE, packaged so a mirror is one call instead of a
  * hand-rolled foreachBatch.  This is the cross-region /
  * cross-environment corpus-mirroring construction a 100 TB
  * deployment runs: only each commit's feed ever moves over the wire,
  * never the table.
  *
  * Apply semantics per version, from the PAIRED feed (idCol pairing,
  * see [[VersionedTable.changeFeed]]):
  *
  *  - `insert` and `update_postimage` rows MERGE into the target
  *    (update preimages need no separate handling — their keys are
  *    re-asserted by the postimage upsert);
  *  - `delete` rows delete by key — merge-on-read by default
  *    ([[VersionedTable.deleteMoR]]: a mirror absorbing a steady
  *    delete stream must not pay a file rewrite per replicated
  *    commit; schedule [[VersionedTable.purgeDeletes]] on the mirror
  *    like on any MoR table), copy-on-write with `morDeletes=false`;
  *  - a `_bootstrap = true` feed (fresh follower on a vacuumed
  *    source) is a full-snapshot insert load — the same upsert path
  *    absorbs it.
  *
  * Exactly-once: follower delivery is at-least-once under crash
  * replay, so each version's merge and delete carry version-derived
  * txn ids — a replayed feed hits the target's txn ledger and
  * no-ops.  Delete keys pass through the driver (`collect`) to form
  * the delete predicate: bounded by one COMMIT's deleted keys, the
  * same commit-sized ceiling as the feed itself, never table-scale.
  *
  * The source's vacuum retention must exceed the mirror's maximum
  * lag — [[VersionedSource.followChanges]]'s failOnDataLoss contract
  * (default: throw) governs what happens when it does not. */
object Replication {

  def replicate(s: SparkSession, srcRoot: String, dstRoot: String,
      checkpoint: String, queryName: String, idCol: String,
      numFiles: Int = 2, morDeletes: Boolean = true,
      failOnDataLoss: Boolean = true): StreamingQuery =
    VersionedSource.followChanges(s, srcRoot, checkpoint, queryName,
      failOnDataLoss, idCol = Some(idCol)) { (feed, v) =>
      applyFeed(s, feed, v, dstRoot, idCol, numFiles, morDeletes)
    }

  /** Apply ONE version's paired feed to `dstRoot` (exposed for batch
    * catch-up and tests; [[replicate]] is this per followed version). */
  private[graft] def applyFeed(s: SparkSession, feed: DataFrame, v: Int,
      dstRoot: String, idCol: String, numFiles: Int,
      morDeletes: Boolean): Unit = {
    val f = feed.drop("_bootstrap").persist()
    try {
      val upserts = f
        .filter(col("_change_type").isin("insert", "update_postimage"))
        .drop("_change_type")
      if (!upserts.isEmpty) {
        if (VersionedTable.latestVersion(s, dstRoot).isEmpty)
          VersionedTable.append(s, dstRoot, upserts, idCol, numFiles,
            op = "load", txnId = Some(s"repl#$v#m"))
        else
          VersionedTable.merge(s, dstRoot, upserts, idCol, numFiles,
            txnId = Some(s"repl#$v#m"))
      }
      // paired feed: update halves are typed, so 'delete' rows are
      // exactly the keys that must go — commit-sized driver state
      val deleteKeys = f.filter(col("_change_type") === "delete")
        .select(col(idCol)).distinct()
        .collect().map(_.get(0))
      if (deleteKeys.nonEmpty) {
        val cond = col(idCol).isin(deleteKeys.toIndexedSeq: _*)
        if (morDeletes)
          VersionedTable.deleteMoR(s, dstRoot, cond, idCol,
            txnId = Some(s"repl#$v#d"))
        else
          VersionedTable.delete(s, dstRoot, cond, idCol, numFiles,
            txnId = Some(s"repl#$v#d"))
      }
      ()
    } finally { f.unpersist(); () }
  }
}
