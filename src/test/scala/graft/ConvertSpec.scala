package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** CONVERT TO GRAFT: in-place adoption of a plain parquet directory —
  * zero copies, immediate stats/zone-map service, ordinary lifecycle
  * afterwards, fsck awareness of outside-data imports. */
class ConvertSpec extends SparkSpec {

  private def freshRoot(kind: String): String =
    Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_conv_${kind}_" +
        s"${spark.sparkContext.applicationId}")

  private def docs(r: Range) = {
    import spark.implicits._
    r.map(i => (i.toLong, s"text $i", (i % 7).toLong))
      .toDF("doc_id", "text", "score")
  }

  test("convert adopts the directory in place: no data under " +
    "root/data, reads match, zone maps and column stats prune, the " +
    "connector serves it, fsck is clean") {
    val dir = freshRoot("plainA")
    // range layout so the key zone map has something to prune on
    docs(0 until 200).repartitionByRange(4, col("doc_id"))
      .write.parquet(dir)
    val root = freshRoot("tblA")
    assert(VersionedTable.convert(spark, root, dir, "doc_id") === 1)
    val snap = VersionedTable.snapshot(spark, root, 1)
    assert(snap.op === "convert")
    assert(snap.files.size === 4)
    assert(snap.files.forall(f => !f.path.contains("/data/")))
    assert(snap.files.forall(_.bytes > 0L))
    assert(VersionedTable.read(spark, root).orderBy("doc_id").collect()
      === docs(0 until 200).orderBy("doc_id").collect())
    // key zone map recorded at convert time prunes a sliced read
    assert(VersionedTable.prunedFiles(spark, root, 1, 0L, 10L).size < 4)
    // non-key long stats recorded too
    assert(snap.files.forall(_.stats.contains("score")))
    // the connector reads the converted table directly
    assert(spark.read.format("graft-table").load(root).count() === 200)
    assert(VersionedTable.fsck(spark, root).clean)
  }

  test("life after convert is ordinary: append, DML, time travel; " +
    "cluster rewrites migrate rows into engine-managed files") {
    val dir = freshRoot("plainB")
    docs(0 until 100).repartitionByRange(2, col("doc_id"))
      .write.parquet(dir)
    val root = freshRoot("tblB")
    VersionedTable.convert(spark, root, dir, "doc_id")
    VersionedTable.append(spark, root, docs(100 until 120), "doc_id", 1)
    VersionedTable.update(spark, root, col("doc_id") === 5,
      Map("text" -> lit("upd")), "doc_id", 1)
    VersionedTable.deleteMoR(spark, root, col("doc_id") === 7, "doc_id")
    val got = VersionedTable.read(spark, root)
    assert(got.count() === 119)
    assert(got.filter(col("doc_id") === 5).select("text")
      .head().getString(0) === "upd")
    // v1 still reads the pristine import
    assert(VersionedTable.read(spark, root, Some(1)).count() === 100)
    // a full re-cluster moves every row into root/data files
    VersionedTable.purgeDeletes(spark, root, "doc_id", 2)
    VersionedTable.optimizeClusterBy(spark, root, "doc_id", "doc_id", 2)
    val head = VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    assert(head.files.forall(_.path.contains("/data/")))
    assert(VersionedTable.read(spark, root).count() === 119)
  }

  test("convert refuses a root that already has commits and an empty " +
    "directory; in-place root == dir works") {
    val dir = freshRoot("plainC")
    docs(0 until 10).coalesce(1).write.parquet(dir)
    // true in-place adoption: the table root IS the directory
    VersionedTable.convert(spark, dir, dir, "doc_id")
    assert(VersionedTable.read(spark, dir).count() === 10)
    intercept[IllegalArgumentException] {
      VersionedTable.convert(spark, dir, dir, "doc_id")
    }
    assert(VersionedTable.fsck(spark, dir).clean)
  }
}
