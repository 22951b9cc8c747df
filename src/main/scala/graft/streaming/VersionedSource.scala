package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
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
  * FEED SCHEMA: the table's columns plus `_change_type` ('insert' /
  * 'delete', or the update pre/post images when `idCol` is given) and
  * `_bootstrap` (boolean).  `_bootstrap = true` marks a feed that is a
  * FULL-SNAPSHOT insert dump rather than a true diff — it happens
  * exactly once, for a follower starting fresh on a table whose older
  * history was vacuumed before the follower existed (there is nothing
  * to diff against, and nothing was missed: the snapshot IS the
  * follower's complete starting state).  Consumers drop both columns
  * before applying rows.
  *
  * DATA-LOSS CONTRACT: if vacuum reclaims a version's parent manifest
  * while the follower is MID-stream (its lag exceeded the table's
  * retention), that version's true diff is unrecoverable — its deletes
  * are gone.  With `failOnDataLoss = true` (the default, matching
  * Delta's streaming source) the follower THROWS rather than silently
  * shipping a wrong feed; the operator either re-bootstraps the
  * downstream with a fresh checkpoint or opts out.  With
  * `failOnDataLoss = false` the affected version degrades to a
  * full-snapshot insert feed tagged `_bootstrap = true` — convergent
  * for upsert-appliers that also reconcile deletes (or that tolerate
  * ghost rows until the next compaction), silently wrong for
  * append-only consumers, which is why opting out is explicit.
  * The fresh-start bootstrap described above is NOT data loss and
  * never throws: nothing that follower was owed has been reclaimed.
  *
  * Scale: the stream's events are manifests (KBs), never data; each
  * version's feed reads only the files its commit touched (multiset
  * cancellation, see [[VersionedTable.diff]]).  A 100 TB table commits
  * a few files per micro-batch upstream, and the follower's per-version
  * cost is proportional to exactly those files.  Retention discipline
  * still applies: table VACUUM retention must exceed the follower's
  * maximum lag, or the data-loss path above triggers. */
object VersionedSource {

  /** Durable high-water mark of delivered versions, sidecar to the
    * follower's checkpoint: the file source's own checkpoint knows
    * which MANIFESTS were read but cannot be queried from inside
    * foreachBatch, and distinguishing "fresh follower" from "mid-stream
    * parent loss" needs exactly one integer — the highest version this
    * checkpoint ever delivered.  Written AFTER process() returns, so
    * under crash-replay it is a floor, never ahead of the downstream. */
  private def progressPath(checkpoint: String): Path =
    new Path(checkpoint, "_graft_max_delivered")

  /** Delivered high-water mark: the sidecar when present and
    * parseable.  When it is MISSING or torn, infer from the checkpoint
    * itself: a checkpoint whose `commits/` dir already holds completed
    * file-source batches belonged to a live follower (created before
    * this sidecar existed, or a torn write on an object store) — it
    * must read as MID-STREAM (-1 = "delivered something, exact version
    * unknown"), never as a fresh start, because a fresh-start misread
    * on a vacuumed parent would silently ship a `_bootstrap=true`
    * full-snapshot feed past `failOnDataLoss = true`.  `commits/` (not
    * `offsets/`) is the right witness: the file source WALs an offset
    * BEFORE foreachBatch runs, so batch 0 of a genuinely fresh
    * follower already has an offsets entry, while a commit lands only
    * AFTER a batch completed — i.e. after something was delivered.
    * A torn/empty sidecar read parses as None and falls into the same
    * inference (at-least-once delivery makes the -1 floor safe). */
  private def readProgress(fs: FileSystem, checkpoint: String): Int = {
    val p = progressPath(checkpoint)
    val parsed: Option[Int] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val txt = try new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
        finally in.close()
        scala.util.Try(txt.toInt).toOption
      }
    parsed.getOrElse {
      val commits = new Path(checkpoint, "commits")
      val anyCompleted = fs.exists(commits) &&
        fs.listStatus(commits).exists(st =>
          st.getPath.getName.nonEmpty &&
            st.getPath.getName.forall(_.isDigit))
      if (anyCompleted) -1 else 0
    }
  }

  private def writeProgress(fs: FileSystem, checkpoint: String,
      v: Int): Unit = {
    // tiny single-int file: plain overwrite-create is atomic enough on
    // local/HDFS for a monotonic floor (a torn read re-bootstraps a
    // replay decision, never loses data)
    val out = fs.create(progressPath(checkpoint), true)
    out.write(v.toString.getBytes("UTF-8"))
    out.close()
  }

  /** Start following `root`'s commits.  `process(feed, version)` runs
    * once per committed version (at-least-once under crash replay):
    * version 1 arrives as a pure-insert feed of the initial load; every
    * later version as its insert/delete change feed vs its parent
    * (update pre/post images when `idCol` is given — see
    * [[VersionedTable.changeFeed]]).  See the object doc for the feed
    * schema and the `failOnDataLoss` contract.
    *
    * `maxVersionsPerTrigger` rate-limits catch-up: a follower starting
    * (or restarting) far behind a busy table would otherwise get its
    * ENTIRE backlog in one micro-batch — one giant transaction
    * downstream, one retry unit under failure, unbounded peak memory
    * for the batch's union of touched files.  Bounding versions per
    * trigger makes catch-up incremental and each batch's cost
    * proportional to a few commits' touched files — Delta's
    * `maxFilesPerTrigger` contract, and since this follower's stream
    * events ARE manifest files (one per version), it maps verbatim
    * onto the file source's native option: the limit is enforced by
    * Spark's offset tracking, checkpoint-exact across restarts, not by
    * application code. */
  def followChanges(s: SparkSession, root: String, checkpoint: String,
      queryName: String, failOnDataLoss: Boolean = true,
      idCol: Option[String] = None,
      maxVersionsPerTrigger: Option[Int] = None)
      (process: (DataFrame, Int) => Unit)
      : StreamingQuery =
    s.readStream
      .schema("version INT, op STRING")
      .options(maxVersionsPerTrigger
        .map(n => Map("maxFilesPerTrigger" -> n.toString))
        .getOrElse(Map.empty))
      .json(s"$root/_versions")
      .writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // ascending: a batch can carry several commits; downstream sees
        // them in commit order exactly as a catch-up replay would
        val vs = batch.select(col("version")).collect()
          .map(_.getInt(0)).sorted
        val fs = FileSystem.get(new Path(checkpoint).toUri,
          s.sparkContext.hadoopConfiguration)
        // surviving manifests listed once per batch; the delivered
        // high-water mark decides whether a missing parent is a
        // fresh-start bootstrap (nothing delivered yet, v is the
        // earliest survivor) or mid-stream loss (we had delivered past
        // it — the diff we owe downstream is unrecoverable)
        val live = VersionedTable.versions(s, root).toSet
        var maxDelivered = readProgress(fs, checkpoint)
        vs.foreach { v =>
          val feed =
            if (v == 1)
              // the initial load: its full snapshot IS its true feed
              VersionedTable.read(s, root, Some(v))
                .withColumn("_change_type", lit("insert"))
                .withColumn("_bootstrap", lit(false))
            else if (live.contains(v - 1))
              VersionedTable.changeFeed(s, root, v - 1, v, idCol)
                .withColumn("_bootstrap", lit(false))
            else if (maxDelivered == 0 && live.nonEmpty && v == live.min)
              // fresh follower on a vacuumed table: bootstrap from the
              // earliest survivor — complete, nothing was missed
              VersionedTable.read(s, root, Some(v))
                .withColumn("_change_type", lit("insert"))
                .withColumn("_bootstrap", lit(true))
            else if (failOnDataLoss)
              throw new IllegalStateException(
                s"change-feed data loss following $root: version " +
                  s"v${v - 1}'s manifest was reclaimed by vacuum while " +
                  "this follower (delivered through " +
                  (if (maxDelivered < 0)
                    "an unknown version — pre-upgrade checkpoint"
                  else s"v$maxDelivered") +
                  s") was mid-stream, so v$v's true diff — including its " +
                  "deletes — is unrecoverable. Raise the table's vacuum " +
                  "retention above the follower's lag; recover by " +
                  "re-bootstrapping downstream with a fresh checkpoint, " +
                  "or opt into a full-snapshot insert feed tagged " +
                  "_bootstrap=true with failOnDataLoss=false.")
            else
              VersionedTable.read(s, root, Some(v))
                .withColumn("_change_type", lit("insert"))
                .withColumn("_bootstrap", lit(true))
          process(feed, v)
          if (v > maxDelivered) {
            maxDelivered = v
            writeProgress(fs, checkpoint, v)
          }
        }
        ()
      }
      .start()
}
