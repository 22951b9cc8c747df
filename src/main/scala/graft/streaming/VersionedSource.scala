package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sources.VersionedTable

/** Streaming CONSUMPTION of a [[graft.sources.VersionedTable]]: follow
  * the table's commit log as a stream and hand every committed version's
  * row-level change feed to a processor — the read-side dual of
  * [[VersionedSink]] (which streams INTO the table), and the engine's
  * answer to Delta's streaming source / `readChangeFeed`.
  *
  * Built from Spark primitives, no custom connector: the `_versions/`
  * directory is an append-only stream of one-JSON-object manifest files,
  * which is EXACTLY the contract of Structured Streaming's file source —
  * so the follower is `readStream.json(_versions)` (each new manifest
  * becomes one event; the file-source checkpoint remembers which
  * manifests were delivered across restarts) plus a `foreachBatch` that
  * resolves each new version to [[VersionedTable.changeFeed]].  The
  * ledger sidecar (`_txns.json`) and in-flight temp files are invisible
  * by the file source's own hidden-file rule (`_`/`.` prefixes).
  *
  * Delivery is per-version and in order within a batch; `foreachBatch`
  * is at-least-once under crash-replay, so `process` receives the
  * VERSION NUMBER alongside the feed — an idempotent downstream (e.g. a
  * [[VersionedSink]]-style txn ledger keyed on it) makes the pipeline
  * exactly-once end to end, the standard construction.
  *
  * Scale: the stream's events are manifests (KBs), never data; each
  * version's feed reads only the files its commit touched (multiset
  * cancellation, see [[VersionedTable.diff]]).  A 100 TB table commits
  * a few files per micro-batch upstream, and the follower's per-version
  * cost is proportional to exactly those files.  Caveat shared with
  * every log-following source: table VACUUM retention must exceed the
  * follower's maximum lag, or a feed for a reclaimed version throws. */
object VersionedSource {

  /** Start following `root`'s commits.  `process(feed, version)` runs
    * once per committed version (at-least-once under crash replay):
    * version 1 arrives as a pure-insert feed of the initial load; every
    * later version as its insert/delete change feed vs its parent. */
  def followChanges(s: SparkSession, root: String, checkpoint: String,
      queryName: String)(process: (DataFrame, Int) => Unit)
      : StreamingQuery =
    s.readStream
      .schema("version INT, op STRING")
      .json(s"$root/_versions")
      .writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // ascending: a batch can carry several commits; downstream sees
        // them in commit order exactly as a catch-up replay would
        val vs = batch.select(col("version")).collect()
          .map(_.getInt(0)).sorted
        // surviving manifests listed once per batch: a version whose
        // PARENT manifest no longer exists (v1, or the earliest
        // survivor after a vacuum) bootstraps as a full-snapshot
        // insert feed — a follower started fresh on a vacuumed table
        // must not try to diff against a reclaimed manifest (and an
        // insert-feed bootstrap stays convergent for upsert-applying
        // consumers; only a parent vacuumed away MID-stream degrades
        // that one feed's deletes, the documented retention caveat)
        val live = VersionedTable.versions(s, root).toSet
        vs.foreach { v =>
          val feed =
            if (!live.contains(v - 1))
              VersionedTable.read(s, root, Some(v))
                .withColumn("_change_type", lit("insert"))
            else VersionedTable.changeFeed(s, root, v - 1, v)
          process(feed, v)
        }
        ()
      }
      .start()
}
