package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Laws of merge-on-read DELETE (deletion vectors) that the oracle's
  * row algebra can't see: zero data files rewritten on deleteMoR, the
  * per-(file, key) mask (a re-inserted key must NOT be re-masked),
  * materialization on rewrite/compaction/purge, diff identity across a
  * DV-only commit, and vacuum treating sidecars as referenced files. */
class DeletionVectorSpec extends SparkSpec {

  private def freshRoot(kind: String): String =
    Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_dvspec_${kind}_" +
        s"${spark.sparkContext.applicationId}")

  private def idsDf(ids: Seq[Int]) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
  }

  test("deleteMoR rewrites nothing: all data files carry by reference, " +
    "reads exclude the masked rows, snapshot.rows counts live only") {
    val root = freshRoot("mor")
    VersionedTable.append(spark, root, idsDf(0 until 100), "doc_id", 4)
    val before = VersionedTable.snapshot(spark, root, 1)
    VersionedTable.deleteMoR(spark, root,
      pmod(col("doc_id"), lit(10)) === 0, "doc_id")
    val after = VersionedTable.snapshot(spark, root, 2)
    // identical data file list — the whole point of merge-on-read
    assert(after.files.map(_.path).sorted === before.files.map(_.path).sorted)
    assert(after.op === "delete-mor")
    // every file held a multiple of 10, so every entry gained a DV
    assert(after.files.forall(_.dv.isDefined))
    assert(after.files.map(_.dv.get.rows).sum === 10)
    assert(after.rows === 90)
    val got = VersionedTable.read(spark, root)
    assert(got.count() === 90)
    assert(got.filter(pmod(col("doc_id"), lit(10)) === 0).count() === 0)
    // time travel: v1 still reads all 100
    assert(VersionedTable.read(spark, root, Some(1)).count() === 100)
  }

  test("the mask is per-file: a key deleted then re-inserted by merge " +
    "reads back exactly once (global key anti-join would erase it)") {
    val root = freshRoot("reinsert")
    VersionedTable.append(spark, root, idsDf(0 until 40), "doc_id", 2)
    VersionedTable.deleteMoR(spark, root, col("doc_id") === 5L, "doc_id")
    assert(VersionedTable.read(spark, root).count() === 39)
    // re-insert id 5 with new content: the old file still PHYSICALLY
    // holds the dead row 5; the new row lands in a fresh file
    val back = idsDf(Seq(5)).withColumn("text", lit("resurrected"))
    VersionedTable.merge(spark, root, back, "doc_id", 1)
    val rows = VersionedTable.read(spark, root)
      .filter(col("doc_id") === 5L).collect()
    assert(rows.length === 1, s"expected exactly one row 5, got ${rows.toSeq}")
    assert(rows.head.getAs[String]("text") === "resurrected")
    assert(VersionedTable.read(spark, root).count() === 40)
  }

  test("a second deleteMoR on the same file folds prior DV rows into " +
    "the new self-contained sidecar") {
    val root = freshRoot("fold")
    VersionedTable.append(spark, root, idsDf(0 until 30), "doc_id", 1)
    VersionedTable.deleteMoR(spark, root, col("doc_id") < 3L, "doc_id")
    VersionedTable.deleteMoR(spark, root,
      col("doc_id") >= 27L, "doc_id")
    val snap = VersionedTable.snapshot(spark, root, 3)
    assert(snap.files.size === 1)
    assert(snap.files.head.dv.get.rows === 6)
    assert(snap.rows === 24)
    assert(VersionedTable.read(spark, root).count() === 24)
    // self-contained: the HEAD's masking must survive even if the
    // first DV's sidecar were gone — prove by reading only the new
    // sidecar's rows (both deletion batches present)
    val dvRows = spark.read.parquet(snap.files.head.dv.get.path)
    assert(dvRows.count() === 6)
  }

  test("merge rewriting a DV-carrying file materializes its deletions") {
    val root = freshRoot("mat")
    VersionedTable.append(spark, root, idsDf(0 until 20), "doc_id", 1)
    VersionedTable.deleteMoR(spark, root, col("doc_id") < 5L, "doc_id")
    // an update touching the (single) file forces a rewrite
    val upd = idsDf(Seq(10)).withColumn("text", lit("updated"))
    VersionedTable.merge(spark, root, upd, "doc_id", 1)
    val snap = VersionedTable.snapshot(spark, root, 3)
    assert(snap.files.forall(_.dv.isEmpty),
      "rewrite must drop the DV (deletions materialized)")
    val got = VersionedTable.read(spark, root)
    assert(got.count() === 15)
    assert(got.filter(col("doc_id") < 5L).count() === 0)
    assert(got.filter(col("doc_id") === 10L).head()
      .getAs[String]("text") === "updated")
  }

  test("a masked key matching an upsert is an INSERT: merge does not " +
    "rewrite the file that merely holds the dead row") {
    val root = freshRoot("insnotrw")
    VersionedTable.append(spark, root, idsDf(0 until 40), "doc_id", 2)
    VersionedTable.deleteMoR(spark, root, col("doc_id") === 1L, "doc_id")
    val before = VersionedTable.snapshot(spark, root, 2)
    VersionedTable.merge(spark, root,
      idsDf(Seq(1)).withColumn("text", lit("new 1")), "doc_id", 1)
    val after = VersionedTable.snapshot(spark, root, 3)
    // both original files carried by reference (dead row 1 is not live,
    // so its file contains no MATCHED key)
    assert(before.files.map(_.path).toSet.subsetOf(
      after.files.map(_.path).toSet))
    assert(VersionedTable.read(spark, root)
      .filter(col("doc_id") === 1L).count() === 1)
  }

  test("purgeDeletes materializes DVs above the dead-ratio threshold " +
    "and leaves lightly-masked files untouched") {
    val root = freshRoot("purge")
    VersionedTable.append(spark, root, idsDf(0 until 40), "doc_id", 2)
    // file [0,19]: 10 dead (50%); file [20,39]: 1 dead (5%)
    VersionedTable.deleteMoR(spark, root,
      col("doc_id") < 10L || col("doc_id") === 25L, "doc_id")
    val v = VersionedTable.purgeDeletes(spark, root, "doc_id", 1,
      minDeadRatio = 0.25)
    assert(v === 3)
    val snap = VersionedTable.snapshot(spark, root, 3)
    val (plain, masked) = snap.files.partition(_.dv.isEmpty)
    assert(masked.size === 1 && masked.head.dv.get.rows === 1,
      "the 5%-dead file must carry over, still masked")
    assert(plain.nonEmpty)
    assert(snap.rows === 29)
    assert(VersionedTable.read(spark, root).count() === 29)
    // full purge: threshold 0 rewrites the rest too
    val v2 = VersionedTable.purgeDeletes(spark, root, "doc_id", 1)
    val clean = VersionedTable.snapshot(spark, root, v2)
    assert(clean.files.forall(_.dv.isEmpty))
    assert(VersionedTable.read(spark, root).count() === 29)
    // idempotent: nothing left to purge, no no-op commit
    assert(VersionedTable.purgeDeletes(spark, root, "doc_id", 1) === v2)
  }

  test("diff and changeFeed across a DV-only commit see exactly the " +
    "deleted rows (DV pointer is part of file identity)") {
    val root = freshRoot("feed")
    VersionedTable.append(spark, root, idsDf(0 until 50), "doc_id", 2)
    VersionedTable.deleteMoR(spark, root,
      col("doc_id").isin(3L, 33L), "doc_id")
    val (added, removed) = VersionedTable.diff(spark, root, 1, 2)
    assert(added.count() === 0)
    assert(removed.select(col("doc_id")).collect().map(_.getLong(0))
      .sorted.toSeq === Seq(3L, 33L))
    val feed = VersionedTable.changeFeed(spark, root, 1, 2,
      idCol = Some("doc_id"))
    assert(feed.filter(col("_change_type") === "delete").count() === 2)
    assert(feed.filter(col("_change_type") =!= "delete").count() === 0)
  }

  test("vacuum keeps DV sidecars referenced by kept manifests and " +
    "reclaims them once purged out of history") {
    val root = freshRoot("vac")
    VersionedTable.append(spark, root, idsDf(0 until 30), "doc_id", 1)
    VersionedTable.deleteMoR(spark, root, col("doc_id") < 5L, "doc_id")
    val dvPath = VersionedTable.snapshot(spark, root, 2)
      .files.head.dv.get.path
    val fs = new org.apache.hadoop.fs.Path(dvPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // keep v2 (which references the sidecar): vacuum must not touch it
    VersionedTable.vacuum(spark, root, keepFrom = 2, retainMs = 0)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dvPath)))
    assert(VersionedTable.read(spark, root).count() === 25)
    // purge, then drop the DV version from history: sidecar reclaimed
    val v = VersionedTable.purgeDeletes(spark, root, "doc_id", 1)
    VersionedTable.vacuum(spark, root, keepFrom = v, retainMs = 0)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dvPath)))
    assert(VersionedTable.read(spark, root).count() === 25)
  }

  test("optimize compaction materializes the DVs of the small files " +
    "it packs") {
    val root = freshRoot("opt")
    VersionedTable.append(spark, root, idsDf(0 until 12), "doc_id", 3)
    VersionedTable.deleteMoR(spark, root, col("doc_id") === 2L, "doc_id")
    val v = VersionedTable.optimize(spark, root, minRows = 100,
      "doc_id", 1)
    val snap = VersionedTable.snapshot(spark, root, v)
    assert(snap.files.forall(_.dv.isEmpty))
    assert(VersionedTable.read(spark, root).count() === 11)
  }

  test("deleteMoR keeps NULL-condition rows (SQL DELETE semantics) " +
    "and a no-match delete commits a carry-only version") {
    val root = freshRoot("nullsem")
    import spark.implicits._
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(30L)))
      .toDF("doc_id", "score")
    VersionedTable.append(spark, root, df, "doc_id", 1)
    // score > 15 is NULL for id 2: the row must survive
    VersionedTable.deleteMoR(spark, root, col("score") > 15L, "doc_id")
    assert(VersionedTable.read(spark, root)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
      === Seq(1L, 2L))
    // nothing matches: a new version, same entries, no DV growth
    VersionedTable.deleteMoR(spark, root, col("score") > 999L, "doc_id")
    val snap = VersionedTable.snapshot(spark, root, 3)
    assert(snap.rows === 2)
    assert(snap.files.map(_.dv.map(_.rows).getOrElse(0L)).sum === 1)
  }

  test("restore and shallow clone carry DV refs: both read the masked " +
    "state exactly") {
    val root = freshRoot("restclone")
    VersionedTable.append(spark, root, idsDf(0 until 20), "doc_id", 1)
    VersionedTable.deleteMoR(spark, root, col("doc_id") < 4L, "doc_id")
    // move past the DV version, then restore back to it
    VersionedTable.merge(spark, root,
      idsDf(Seq(50, 51)), "doc_id", 1)
    VersionedTable.restore(spark, root, toVersion = 2)
    assert(VersionedTable.read(spark, root).count() === 16)
    val cloneRoot = freshRoot("restclone_dst")
    VersionedTable.cloneShallow(spark, root, cloneRoot, Some(2))
    assert(VersionedTable.read(spark, cloneRoot).count() === 16)
    assert(VersionedTable.read(spark, cloneRoot)
      .filter(col("doc_id") < 4L).count() === 0)
  }

  test("deleteMoR racing a merge: optimistic retry serializes both — " +
    "no lost update, no lost delete, DV arithmetic intact") {
    val root = freshRoot("race")
    VersionedTable.append(spark, root, idsDf(0 until 100), "doc_id", 4)
    // the DV commit's carry list (every file + its new sidecar refs)
    // is only valid on the parent it was derived from: if the merge
    // wins first and REWRITES a file the delete planned to mask, the
    // delete must re-derive (requireParent conflict), not commit a
    // mask over a superseded file
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val t1 = new Thread(() =>
      try {
        VersionedTable.deleteMoR(spark, root,
          pmod(col("doc_id"), lit(10)) === 0, "doc_id")
        ()
      } catch { case t: Throwable => errs.add(t); () })
    val t2 = new Thread(() =>
      try {
        // keys deliberately disjoint from the delete's (no multiple of
        // 10): the two serial orders then agree on the final state, so
        // the assertion is race-schedule-independent — while the merge
        // still rewrites the very FILE the delete masks rows of
        VersionedTable.merge(spark, root,
          idsDf(41 until 46).withColumn("text", lit("M")), "doc_id", 1)
        ()
      } catch { case t: Throwable => errs.add(t); () })
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(errs.isEmpty, s"race surfaced: ${errs.peek()}")
    assert(VersionedTable.versions(spark, root) === Seq(1, 2, 3))
    val head = VersionedTable.read(spark, root)
    // serializable outcome in either commit order: every multiple of
    // 10 deleted (found in the original file or the merge's rewrite),
    // 41..45 updated (marked live before or carried through the mask)
    assert(head.count() === 90)
    assert(head.filter(pmod(col("doc_id"), lit(10)) === 0).count() === 0)
    assert(head.filter(col("text") === "M").count() === 5)
    // live-row manifest metadata agrees with the actual read
    val sn = VersionedTable.snapshot(spark, root, 3)
    assert(sn.rows === 90)
    ()
  }

  test("deleteMoRKeys / deleteKeys (join-based bulk deletes) agree " +
    "with their predicate twins: same live rows, same DV arithmetic, " +
    "per-(file,key) masking intact") {
    import spark.implicits._
    val rootA = freshRoot("bulkmor"); val rootB = freshRoot("bulkcow")
    VersionedTable.append(spark, rootA, idsDf(0 until 60), "doc_id", 3)
    VersionedTable.append(spark, rootB, idsDf(0 until 60), "doc_id", 3)
    val keys = (0 until 60).filter(_ % 4 == 0).map(_.toLong)
      .toDF("doc_id")
    // merge-on-read by key set: zero rewrites, masked live counts
    VersionedTable.deleteMoRKeys(spark, rootA, keys, "doc_id")
    val snA = VersionedTable.snapshot(spark, rootA, 2)
    assert(snA.op === "delete-mor" && snA.rows === 45)
    assert(snA.files.map(_.path) ===
      VersionedTable.snapshot(spark, rootA, 1).files.map(_.path),
      "key-set MoR delete must carry every data file by reference")
    assert(VersionedTable.read(spark, rootA).count() === 45)
    assert(VersionedTable.read(spark, rootA)
      .filter(pmod(col("doc_id"), lit(4)) === 0).count() === 0)
    // re-insert law still holds through the key-set path
    VersionedTable.merge(spark, rootA,
      idsDf(Seq(8)).withColumn("text", lit("back")), "doc_id", 1)
    assert(VersionedTable.read(spark, rootA)
      .filter(col("doc_id") === 8L).select(col("text"))
      .head.getString(0) === "back")
    // copy-on-write by key set: same surviving multiset
    VersionedTable.deleteKeys(spark, rootB, keys, "doc_id", 3)
    val cow = VersionedTable.read(spark, rootB)
    assert(cow.count() === 45)
    // a key set with duplicates and misses is harmless (distinct +
    // semi-join semantics)
    VersionedTable.deleteMoRKeys(spark, rootA,
      Seq(9L, 9L, 999L).toDF("doc_id"), "doc_id")
    assert(VersionedTable.read(spark, rootA).count() === 45) // 45+1-1
    ()
  }

  test("deleteMoR is idempotent under a txnId retry") {
    val root = freshRoot("txn")
    VersionedTable.append(spark, root, idsDf(0 until 10), "doc_id", 1)
    val v1 = VersionedTable.deleteMoR(spark, root, col("doc_id") < 2L,
      "doc_id", txnId = Some("dv-batch-7"))
    val v2 = VersionedTable.deleteMoR(spark, root, col("doc_id") < 2L,
      "doc_id", txnId = Some("dv-batch-7"))
    assert(v1 === v2)
    assert(VersionedTable.read(spark, root).count() === 8)
  }
}
