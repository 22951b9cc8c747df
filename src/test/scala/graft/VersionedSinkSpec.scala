package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable
import graft.streaming.VersionedSink

/** Exactly-once streaming upsert into the versioned table: batches
  * become versions, redelivered batches are no-ops via the txn ledger,
  * and a checkpoint restart continues the version chain without
  * double-applying.  Driven through a replayable file source
  * (MemoryStream cannot recover across restarts by design). */
class VersionedSinkSpec extends SparkSpec {

  test("micro-batches commit as versions; replays and restarts apply once") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_vsink").toString
    val src = s"$dir/src"; val chk = s"$dir/chk"; val root = s"$dir/table"
    new java.io.File(src).mkdirs()

    def start() = VersionedSink.upsertStream(
      spark.readStream.schema("doc_id LONG, text STRING").parquet(src),
      root, "doc_id", 2, chk, "vsink")

    // epoch 1: initial load
    (0L until 10L).map(i => (i, s"t$i")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src)
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    assert(VersionedTable.read(spark, root).count() === 10)
    val vAfter1 = VersionedTable.latestVersion(spark, root).get

    // epoch 2 (after restart): overlapping keys upsert, new keys insert
    (5L until 15L).map(i => (i, s"u$i")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val head = VersionedTable.read(spark, root)
    assert(head.count() === 15)
    assert(head.filter(col("text").startsWith("u")).count() === 10)
    assert(head.filter(col("doc_id") === 7L).select(col("text"))
      .head.getString(0) === "u7")
    val vAfter2 = VersionedTable.latestVersion(spark, root).get
    assert(vAfter2 > vAfter1)

    // a redelivered batch (same txn id) must return the committed
    // version, not apply again
    val headTxn = VersionedTable.snapshot(spark, root, vAfter2).txnId.get
    val replayed = VersionedTable.merge(spark, root,
      (5L until 15L).map(i => (i, s"REPLAY$i")).toDF("doc_id", "text"),
      "doc_id", 2, txnId = Some(headTxn))
    // version chain unchanged and the replay's payload NOT applied
    assert(replayed === vAfter2)
    assert(VersionedTable.latestVersion(spark, root).get === vAfter2)
    assert(VersionedTable.read(spark, root)
      .filter(col("text").startsWith("REPLAY")).count() === 0)
    assert(VersionedTable.read(spark, root).count() === 15)

    // every committed version carries its txn id in the ledger
    val txns = VersionedTable.versions(spark, root)
      .flatMap(v => VersionedTable.snapshot(spark, root, v).txnId)
    assert(txns.distinct.size === txns.size)
    assert(txns.forall(_.startsWith("vsink#")))
  }
}
