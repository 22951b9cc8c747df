package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** The pull-based graft-table STREAMING SOURCE
  * (`spark.readStream.format("graft-table")`): offset = version
  * contract, append-mode added-files-only feeds, the
  * data-changing-commit guard and its two opt-outs, CDF mode parity
  * with the library `changes()`, rate-limited catch-up, and
  * exactly-once restart. */
class GraftStreamSourceSpec extends SparkSpec {

  private def freshRoot(kind: String): String =
    Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_gssspec_${kind}_" +
        s"${spark.sparkContext.applicationId}")

  private def docs(r: Range) = {
    import spark.implicits._
    r.map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
  }

  test("CDF stream delivers exactly the library CHANGES window, " +
    "tagged per commit, through the standard readStream surface") {
    val root = freshRoot("cdf")
    val ckpt = freshRoot("cdfckpt")
    VersionedTable.append(spark, root, docs(0 until 40), "doc_id", 2)
    VersionedTable.delete(spark, root, col("doc_id") < 3, "doc_id", 2)
    VersionedTable.update(spark, root, col("doc_id") === 10,
      Map("text" -> lit("changed")), "doc_id", 2)
    val q = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true")
      .load(root)
      .writeStream.format("memory").queryName("gss_cdf")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("gss_cdf")
      .orderBy("_commit_version", "_change_type", "doc_id").collect()
    val want = VersionedTable.changes(spark, root, 1, 3, Some("doc_id"))
      .select(col("doc_id"), col("text"), col("_change_type"),
        col("_commit_version"))
      .orderBy("_commit_version", "_change_type", "doc_id").collect()
    assert(got === want)
    // idCol defaulted from table.key: the update commit paired
    assert(got.count(_.getAs[String]("_change_type")
      .startsWith("update_")) === 2)
  }

  test("append mode: each append streams only its added files; " +
    "row-preserving maintenance streams nothing; a delete commit " +
    "fails loudly and ignoreChanges opts into added-side delivery") {
    val root = freshRoot("app")
    val ckpt = freshRoot("appckpt")
    VersionedTable.append(spark, root, docs(0 until 10), "doc_id", 2)
    VersionedTable.append(spark, root, docs(10 until 20), "doc_id", 2)
    VersionedTable.optimize(spark, root, 1000L, "doc_id", 1)
    val q = spark.readStream.format("graft-table").load(root)
      .writeStream.format("memory").queryName("gss_app")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    // v1 snapshot + v2 appended rows, each exactly once; the optimize
    // commit (which rewrote everything) contributed zero rows
    assert(spark.table("gss_app").count() === 20)
    assert(spark.table("gss_app").select("doc_id").distinct()
      .count() === 20)
    // a data-changing commit breaks an append-mode stream loudly
    // (fresh checkpoint: the memory sink cannot recover one, and the
    // guard fires on the commit either way)
    VersionedTable.delete(spark, root, col("doc_id") < 2, "doc_id", 1)
    val q2 = spark.readStream.format("graft-table").load(root)
      .writeStream.format("memory").queryName("gss_app2")
      .option("checkpointLocation", freshRoot("appckpt2"))
      .start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(ex.getMessage.contains("append-mode") ||
      Option(ex.getCause).exists(_.getMessage.contains("append-mode")))
    // ignoreChanges: the delete commit ships its added side (nothing —
    // pure delete adds no rows) and the stream proceeds
    val ckpt3 = freshRoot("appckpt3")
    val q3 = spark.readStream.format("graft-table")
      .option("ignoreChanges", "true").load(root)
      .writeStream.format("memory").queryName("gss_app3")
      .option("checkpointLocation", ckpt3)
      .start()
    try q3.processAllAvailable() finally q3.stop()
    // fresh checkpoint: v1 full snapshot (18 live rows read as of v1?
    // no — v1 feed is the v1 SNAPSHOT, 10 rows) + v2 append (10) +
    // optimize (0) + delete (0 added rows)
    assert(spark.table("gss_app3").count() === 20)
  }

  test("maxVersionsPerTrigger bounds catch-up: a 3-version backlog " +
    "drains one version per micro-batch, rows exact") {
    val root = freshRoot("rate")
    val ckpt = freshRoot("rateckpt")
    VersionedTable.append(spark, root, docs(0 until 5), "doc_id", 1)
    VersionedTable.append(spark, root, docs(5 until 10), "doc_id", 1)
    VersionedTable.append(spark, root, docs(10 until 15), "doc_id", 1)
    val q = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "1")
      .load(root)
      .writeStream.format("memory").queryName("gss_rate")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    val byVersion = spark.table("gss_rate")
      .groupBy("_commit_version").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byVersion === Map(1 -> 5L, 2 -> 5L, 3 -> 5L))
  }

  test("restart from the checkpoint delivers only the versions " +
    "committed since — offsets are version numbers") {
    val root = freshRoot("restart")
    val ckpt = freshRoot("restartckpt")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    def run(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").load(root)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("_commit_version").distinct().collect()
            .foreach(r => seen.add(r.getInt(0)))
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    VersionedTable.append(spark, root, docs(0 until 8), "doc_id", 1)
    VersionedTable.append(spark, root, docs(8 until 16), "doc_id", 1)
    run()
    assert(seen.toArray.toSet === Set(1, 2))
    seen.clear()
    VersionedTable.append(spark, root, docs(16 until 24), "doc_id", 1)
    run()
    assert(seen.toArray.toSet === Set(3)) // 1 and 2 never re-deliver
  }

  test("pure-connector replication: readStream(readChangeFeed) -> " +
    "writeStream(cdc) mirrors inserts, updates and deletes " +
    "exactly-once across a restart") {
    val src = freshRoot("repsrc")
    val dst = freshRoot("repdst")
    val ckpt = freshRoot("repckpt")
    VersionedTable.append(spark, src, docs(0 until 30), "doc_id", 2)
    VersionedTable.update(spark, src, col("doc_id") === 7,
      Map("text" -> lit("v2")), "doc_id", 2)
    VersionedTable.delete(spark, src, col("doc_id") >= 25, "doc_id", 2)
    def replicateOnce(): Unit = {
      // NO rate limit and NO manual column hygiene: a catch-up batch
      // spans several commits of the same key (7 inserts in v1 then
      // updates in v2; 25.. insert in v1 then delete in v3), which the
      // cdc sink resolves keep-last by DEFAULTING orderCol to
      // _commit_version — and it drops the CDF bookkeeping columns
      // after dedupe, so the mirror keeps the source schema without
      // the stream having to know the feed's internals
      val q = spark.readStream.format("graft-table")
        .option("readChangeFeed", "true")
        .load(src)
        .writeStream.format("graft-table")
        .option("cdc", "true").option("keyCol", "doc_id")
        .option("checkpointLocation", ckpt)
        .start(dst)
      try q.processAllAvailable() finally q.stop()
    }
    replicateOnce()
    def readSorted(root: String) = VersionedTable.read(spark, root)
      .orderBy("doc_id").collect()
    assert(readSorted(dst) === readSorted(src))
    // more source commits, then resume from the same checkpoint
    VersionedTable.updateMoR(spark, src, col("doc_id") < 3,
      Map("text" -> lit("v4")), "doc_id")
    VersionedTable.append(spark, src, docs(100 until 110), "doc_id", 1)
    replicateOnce()
    assert(readSorted(dst) === readSorted(src))
    // convergence: replaying the whole feed from a FRESH checkpoint
    // (new txn namespace — the ledger does NOT dedupe this) against
    // the same mirror re-applies every batch yet lands on identical
    // content: upserts and deletes are content-idempotent, so even a
    // full re-bootstrap of the replication job cannot duplicate rows
    val before = readSorted(dst)
    val q2 = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "1")
      .load(src)
      .drop("_commit_version")
      .writeStream.format("graft-table")
      .option("cdc", "true").option("keyCol", "doc_id")
      .option("checkpointLocation", freshRoot("repckpt2"))
      .start(dst)
    try q2.processAllAvailable() finally q2.stop()
    assert(readSorted(dst) === before)
  }

  test("ignoreDeletes skips delete-only commits (MoR masks, no new " +
    "paths) but a copy-on-write delete still fails loudly") {
    val root = freshRoot("igdel")
    VersionedTable.append(spark, root, docs(0 until 20), "doc_id", 2)
    VersionedTable.deleteMoR(spark, root, col("doc_id") < 2, "doc_id")
    VersionedTable.append(spark, root, docs(20 until 30), "doc_id", 1)
    val q = spark.readStream.format("graft-table")
      .option("ignoreDeletes", "true").load(root)
      .writeStream.format("memory").queryName("gss_igdel")
      .option("checkpointLocation", freshRoot("igdelckpt"))
      .start()
    try q.processAllAvailable() finally q.stop()
    // v1 snapshot (20) + v2 MoR delete (skipped) + v3 append (10)
    assert(spark.table("gss_igdel").count() === 30)
    // CoW delete rewrites survivors into NEW files: not delete-only
    VersionedTable.delete(spark, root, col("doc_id") === 5, "doc_id", 1)
    val q2 = spark.readStream.format("graft-table")
      .option("ignoreDeletes", "true").load(root)
      .writeStream.format("memory").queryName("gss_igdel2")
      .option("checkpointLocation", freshRoot("igdelckpt2"))
      .start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(ex.getMessage.contains("append-mode") ||
      Option(ex.getCause).exists(_.getMessage.contains("append-mode")))
  }

  test("startingTimestamp opens the stream at the first commit at or " +
    "after the probe") {
    val root = freshRoot("ts")
    VersionedTable.append(spark, root, docs(0 until 5), "doc_id", 1)
    VersionedTable.append(spark, root, docs(5 until 12), "doc_id", 1)
    val t2 = VersionedTable.snapshot(spark, root, 2).tsMillis
    val q = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true")
      .option("startingTimestamp", t2.toString)
      .load(root)
      .writeStream.format("memory").queryName("gss_ts")
      .option("checkpointLocation", freshRoot("tsckpt"))
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("gss_ts")
    assert(got.count() === 7) // only v2's feed
    assert(got.select("_commit_version").distinct().head().getInt(0) === 2)
  }

  test("startingVersion=latest streams only commits made AFTER the " +
    "query starts — the head never replays") {
    val root = freshRoot("latest")
    VersionedTable.append(spark, root, docs(0 until 50), "doc_id", 2)
    VersionedTable.append(spark, root, docs(50 until 60), "doc_id", 1)
    val q = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true")
      .option("startingVersion", "latest")
      .load(root)
      .writeStream.format("memory").queryName("gss_latest")
      .option("checkpointLocation", freshRoot("latestckpt"))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("gss_latest").count() === 0) // nothing replays
      VersionedTable.append(spark, root, docs(60 until 65), "doc_id", 1)
      q.processAllAvailable()
      assert(spark.table("gss_latest").count() === 5) // only the new commit
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog and terminates — the " +
    "scheduled-batch-job shape for CDC consumers") {
    val root = freshRoot("avnow")
    VersionedTable.append(spark, root, docs(0 until 6), "doc_id", 1)
    VersionedTable.append(spark, root, docs(6 until 10), "doc_id", 1)
    val q = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true")
      .load(root)
      .writeStream.format("memory").queryName("gss_avnow")
      .option("checkpointLocation", freshRoot("avnowckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000),
      "AvailableNow query did not terminate")
    assert(spark.table("gss_avnow").count() === 10)
  }

  test("source schema derives from the manifest; user schemas and " +
    "missing tables are rejected") {
    val root = freshRoot("schema")
    VersionedTable.append(spark, root, docs(0 until 4), "doc_id", 1)
    val sch = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true").load(root).schema
    assert(sch.fieldNames.toSeq ===
      Seq("doc_id", "text", "_change_type", "_commit_version"))
    intercept[IllegalStateException] {
      spark.readStream.format("graft-table")
        .load(freshRoot("nope")).schema
    }
  }
}
