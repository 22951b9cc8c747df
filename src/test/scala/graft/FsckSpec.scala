package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** FSCK: head-snapshot storage-integrity audit and repair — missing
  * data files, missing deletion-vector sidecars, head-only scope. */
class FsckSpec extends SparkSpec {

  private def freshRoot(kind: String): String =
    Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_fsck_${kind}_" +
        s"${spark.sparkContext.applicationId}")

  private def docs(r: Range) = {
    import spark.implicits._
    r.map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
  }

  private def fs(root: String) =
    org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
      spark.sparkContext.hadoopConfiguration)

  test("a clean table audits clean and repair is a version-preserving " +
    "no-op") {
    val root = freshRoot("clean")
    VersionedTable.append(spark, root, docs(0 until 40), "doc_id", 2)
    assert(VersionedTable.fsck(spark, root).clean)
    assert(VersionedTable.fsckRepair(spark, root) === 1)
    assert(VersionedTable.latestVersion(spark, root) === Some(1))
  }

  test("vacuum dry run names exactly the files the real pass then " +
    "reclaims, and deletes nothing itself") {
    val root = freshRoot("dryrun")
    VersionedTable.append(spark, root, docs(0 until 20), "doc_id", 2)
    VersionedTable.overwrite(spark, root, docs(20 until 30), "doc_id", 1)
    val planned = VersionedTable.vacuumDryRun(spark, root,
      keepFrom = 2, retainMs = 0L)
    // v1's two files are unreferenced by the kept head
    assert(planned.size === 2)
    // nothing was deleted: v1 still reads
    assert(VersionedTable.read(spark, root, Some(1)).count() === 20)
    VersionedTable.vacuum(spark, root, keepFrom = 2, retainMs = 0L)
    val fsys = fs(root)
    planned.foreach(p =>
      assert(!fsys.exists(new Path(p)), s"$p should be reclaimed"))
    assert(VersionedTable.read(spark, root).count() === 10)
  }

  test("the format gate: a manifest declaring a newer format.version " +
    "refuses to load; older versions stay time-travelable") {
    val root = freshRoot("fmt")
    VersionedTable.append(spark, root, docs(0 until 10), "doc_id", 1)
    val snap = VersionedTable.snapshot(spark, root, 1)
    assert(snap.props.get(VersionedTable.FormatVersionProp)
      === Some("1"))
    VersionedTable.setProperty(spark, root,
      VersionedTable.FormatVersionProp,
      (VersionedTable.SupportedFormatVersion + 1).toString)
    val ex = intercept[IllegalStateException] {
      VersionedTable.read(spark, root).count()
    }
    assert(ex.getMessage.contains("format.version"))
    // the pre-bump version still reads
    assert(VersionedTable.read(spark, root, Some(1)).count() === 10)
  }

  test("an externally deleted data file is reported and repair drops " +
    "exactly its entry; the rest of the table keeps serving") {
    val root = freshRoot("data")
    VersionedTable.append(spark, root, docs(0 until 40), "doc_id", 4)
    val victim = VersionedTable.snapshot(spark, root, 1).files.head
    fs(root).delete(new Path(victim.path), false)
    val report = VersionedTable.fsck(spark, root)
    assert(report.missingData === Seq(victim.path))
    assert(report.missingDv.isEmpty)
    val v2 = VersionedTable.fsckRepair(spark, root)
    assert(VersionedTable.snapshot(spark, root, v2).op === "fsck")
    assert(VersionedTable.fsck(spark, root).clean)
    val got = VersionedTable.read(spark, root)
    assert(got.count() === 30) // one quartile lost, loudly recorded
    // the victim's key range is exactly what is gone
    assert(got.filter(col("doc_id") >= 10).count() === 30)
  }

  test("a missing deletion-vector sidecar drops the masked file too — " +
    "serving it unmasked would resurrect deleted rows") {
    val root = freshRoot("dv")
    VersionedTable.append(spark, root, docs(0 until 40), "doc_id", 4)
    VersionedTable.deleteMoR(spark, root, col("doc_id") === 3, "doc_id")
    val snap = VersionedTable.snapshot(spark, root, 2)
    val dvPath = snap.files.flatMap(_.dv.map(_.path)).head
    fs(root).delete(new Path(dvPath), false)
    val report = VersionedTable.fsck(spark, root)
    assert(report.missingDv === Seq(dvPath))
    VersionedTable.fsckRepair(spark, root)
    val got = VersionedTable.read(spark, root)
    assert(VersionedTable.fsck(spark, root).clean)
    // the masked file held ids 0..9: all gone (not resurrected)
    assert(got.filter(col("doc_id") < 10).count() === 0)
    assert(got.count() === 30)
  }
}
