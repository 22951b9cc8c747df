package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Physical-layer laws of the versioned table format the oracle's row
  * algebra can't see: CAS commit under contention, copy-on-write file
  * targeting (untouched files carry by reference), manifest pruning,
  * time-travel immutability, and vacuum's can't-break-kept-snapshots
  * guarantee. */
class VersionedTableSpec extends SparkSpec {

  private def freshRoot(kind: String): String =
    Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_vtspec_${kind}_" +
        s"${spark.sparkContext.applicationId}")

  private def idsDf(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
  }

  test("concurrent appends: CAS gives both committers distinct versions") {
    val root = freshRoot("cas")
    VersionedTable.append(spark, root, idsDf(0 until 40), "doc_id", 2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def appender(ids: Range) = new Thread(() =>
      try {
        VersionedTable.append(spark, root, idsDf(ids), "doc_id", 1)
        ()
      } catch { case t: Throwable => errs.add(t); () })
    val t1 = appender(1000 until 1020)
    val t2 = appender(2000 until 2020)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(errs.isEmpty, s"appender threads threw: ${errs.toArray.toSeq}")
    assert(VersionedTable.versions(spark, root) === Seq(1, 2, 3))
    // the loser rebased: the final snapshot carries BOTH appends
    assert(VersionedTable.read(spark, root).count() === 80)
    assert(VersionedTable.read(spark, root)
      .filter(col("doc_id") >= 1000 && col("doc_id") < 1020).count() === 20)
    assert(VersionedTable.read(spark, root)
      .filter(col("doc_id") >= 2000).count() === 20)
  }

  test("merge rewrites only files containing matched keys") {
    val root = freshRoot("cow")
    VersionedTable.append(spark, root, idsDf(0 until 100), "doc_id", 4)
    val before = VersionedTable.snapshot(spark, root, 1)
    assert(before.files.size === 4)
    // keys 0..9 live in the lowest range file only
    val upd = idsDf(0 until 10)
      .withColumn("text", concat(lit("u "), col("text")))
    VersionedTable.merge(spark, root, upd, "doc_id", 1)
    val after = VersionedTable.snapshot(spark, root, 2)
    val carried = after.files.map(_.path).toSet
      .intersect(before.files.map(_.path).toSet)
    // at least the top range files carry over by reference
    assert(carried.size >= 2, s"expected >=2 carried files, got $carried")
    assert(carried.size < before.files.size)
    // and the merge applied
    val head = VersionedTable.read(spark, root)
    assert(head.count() === 100)
    assert(head.filter(col("text").startsWith("u ")).count() === 10)
  }

  test("delete carries untouched files and drops only matching rows") {
    val root = freshRoot("del")
    VersionedTable.append(spark, root, idsDf(0 until 100), "doc_id", 4)
    val before = VersionedTable.snapshot(spark, root, 1)
    VersionedTable.delete(spark, root, col("doc_id") < 5, "doc_id", 1)
    val after = VersionedTable.snapshot(spark, root, 2)
    val carried = after.files.map(_.path).toSet
      .intersect(before.files.map(_.path).toSet)
    assert(carried.size >= 2 && carried.size < before.files.size)
    assert(VersionedTable.read(spark, root).count() === 95)
    assert(VersionedTable.read(spark, root)
      .agg(min(col("doc_id"))).head.getLong(0) === 5L)
  }

  test("time travel: an old snapshot is byte-stable across later commits") {
    val root = freshRoot("tt")
    VersionedTable.append(spark, root, idsDf(0 until 50), "doc_id", 2)
    val v1Before = VersionedTable.read(spark, root, Some(1))
      .collect().map(_.toString).sorted
    VersionedTable.merge(spark, root,
      idsDf(0 until 50).withColumn("text", lit("rewritten")), "doc_id", 2)
    VersionedTable.delete(spark, root, col("doc_id") < 25, "doc_id", 1)
    val v1After = VersionedTable.read(spark, root, Some(1))
      .collect().map(_.toString).sorted
    assert(v1Before.toSeq === v1After.toSeq)
    assert(VersionedTable.read(spark, root).count() === 25)
  }

  test("manifest pruning plans a strict file subset with the same answer") {
    val root = freshRoot("prune")
    VersionedTable.append(spark, root, idsDf(0 until 200), "doc_id", 8)
    val all = VersionedTable.snapshot(spark, root, 1).files
    val pruned = VersionedTable.prunedFiles(spark, root, 1, 0L, 24L)
    assert(pruned.nonEmpty && pruned.size < all.size,
      s"pruned ${pruned.size} of ${all.size}")
    val viaPruned = VersionedTable
      .read(spark, root, idRange = Some((0L, 24L)))
      .filter(col("doc_id") <= 24).count()
    val viaFull = VersionedTable.read(spark, root)
      .filter(col("doc_id") <= 24).count()
    assert(viaPruned === viaFull)
  }

  test("optimize compacts small files, preserves rows, keeps history") {
    val root = freshRoot("opt")
    // simulate a streaming table: one small file set per "batch"
    VersionedTable.append(spark, root, idsDf(0 until 30), "doc_id", 3)
    (1 to 4).foreach { b =>
      VersionedTable.append(spark, root,
        idsDf(b * 100 until b * 100 + 5), "doc_id", 1)
    }
    val before = VersionedTable.snapshot(spark, root, 5)
    assert(before.files.size === 7)
    val v = VersionedTable.optimize(spark, root, minRows = 8L,
      "doc_id", 1)
    val after = VersionedTable.snapshot(spark, root, v)
    // the four 5-row batch files packed into one; the 10-row files carried
    assert(after.files.size === 4, s"files: ${after.files.map(_.rows)}")
    assert(after.files.map(_.path).toSet
      .intersect(before.files.map(_.path).toSet).size === 3)
    // row multiset identical
    val a = VersionedTable.read(spark, root, Some(5))
      .collect().map(_.toString).sorted.toSeq
    val b = VersionedTable.read(spark, root, Some(v))
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
    // pre-optimize history still reads
    assert(VersionedTable.read(spark, root, Some(2)).count() === 35)
  }

  test("schema evolution: an upsert can add a column; old rows read null") {
    import spark.implicits._
    val root = freshRoot("schema")
    VersionedTable.append(spark, root, idsDf(0 until 20), "doc_id", 2)
    // the new batch carries a quality column the table never had
    val withQuality = (10L until 30L)
      .map(i => (i, s"q$i", i * 10))
      .toDF("doc_id", "text", "quality")
    VersionedTable.merge(spark, root, withQuality, "doc_id", 2)
    val head = VersionedTable.read(spark, root)
    assert(head.columns.toSet === Set("doc_id", "text", "quality"))
    assert(head.count() === 30)
    // untouched old rows surface null quality; upserted rows carry it
    assert(head.filter(col("quality").isNull)
      .agg(max(col("doc_id"))).head.getLong(0) < 10L)
    assert(head.filter(col("quality").isNotNull).count() === 20)
    // a time-travel read of the pre-evolution snapshot has no column
    assert(!VersionedTable.read(spark, root, Some(1))
      .columns.contains("quality"))
  }

  test("delete keeps rows whose condition is NULL (SQL DELETE semantics)") {
    import spark.implicits._
    val root = freshRoot("delnull")
    // lang is null for ids 0..4 — co-located in the same low-range file
    // as the 'zh' rows the delete targets, so a bare !cond rewrite
    // would silently drop them
    val df = (0L until 40L)
      .map(i => (i, s"t$i", if (i < 5) null else if (i < 10) "zh" else "en"))
      .toDF("doc_id", "text", "lang")
    VersionedTable.append(spark, root, df, "doc_id", 2)
    VersionedTable.delete(spark, root, col("lang") === "zh", "doc_id", 1)
    val head = VersionedTable.read(spark, root)
    assert(head.count() === 35)
    assert(head.filter(col("lang").isNull).count() === 5)
    assert(head.filter(col("lang") === "zh").count() === 0)
  }

  test("delete matching every row leaves a readable empty snapshot") {
    val root = freshRoot("delall")
    VersionedTable.append(spark, root, idsDf(0 until 20), "doc_id", 2)
    VersionedTable.delete(spark, root, col("doc_id") >= 0, "doc_id", 1)
    val head = VersionedTable.read(spark, root)
    assert(head.count() === 0)
    // schema survives through the pre-delete history
    assert(head.columns.toSet === Set("doc_id", "text"))
    // and the emptied table still accepts a diff against its past
    val (added, removed) = VersionedTable.diff(spark, root, 1, 2)
    assert(added.count() === 0 && removed.count() === 20)
  }

  test("optimize after schema evolution keeps evolved column values") {
    import spark.implicits._
    val root = freshRoot("optevo")
    VersionedTable.append(spark, root, idsDf(0 until 6), "doc_id", 1)
    // evolution: small append batches carry a quality column
    (0 until 3).foreach { b =>
      val batch = (100L + b * 10 until 100L + b * 10 + 4)
        .map(i => (i, s"q$i", i * 2)).toDF("doc_id", "text", "quality")
      VersionedTable.append(spark, root, batch, "doc_id", 1)
    }
    val v = VersionedTable.optimize(spark, root, minRows = 8L, "doc_id", 1)
    val head = VersionedTable.read(spark, root, Some(v))
    // row-preserving INCLUDING the evolved column of the packed files
    assert(head.count() === 18)
    assert(head.filter(col("quality").isNotNull).count() === 12)
    // a fully-compacted table optimizes to a no-op without a new version
    val again = VersionedTable.optimize(spark, root, minRows = 8L,
      "doc_id", 1)
    assert(again === v)
    assert(VersionedTable.latestVersion(spark, root).get === v)
  }

  test("diff across a schema-evolution boundary aligns both sides") {
    import spark.implicits._
    val root = freshRoot("diffevo")
    VersionedTable.append(spark, root, idsDf(0 until 10), "doc_id", 1)
    val evolved = (0L until 10L).map(i => (i, s"text $i", i * 3))
      .toDF("doc_id", "text", "quality")
    VersionedTable.merge(spark, root, evolved, "doc_id", 1)
    val (added, removed) = VersionedTable.diff(spark, root, 1, 2)
    // every row changed (gained a quality value); the un-evolved side
    // reads quality as null rather than mis-cancelling or throwing
    assert(added.count() === 10 && removed.count() === 10)
    assert(added.filter(col("quality").isNotNull).count() === 10)
    assert(removed.filter(col("quality").isNull).count() === 10)
  }

  test("vacuum deletes only unreferenced files and keeps snapshots whole") {
    val root = freshRoot("vac")
    VersionedTable.append(spark, root, idsDf(0 until 50), "doc_id", 2)
    VersionedTable.merge(spark, root,
      idsDf(0 until 50).withColumn("text", lit("v2")), "doc_id", 2)
    VersionedTable.append(spark, root, idsDf(100 until 120), "doc_id", 1)
    val keptFiles = VersionedTable.snapshot(spark, root, 3).files
    // retainMs = 0: the in-flight-commit safety horizon is meaningless
    // in a single-process test and would keep every just-written file
    val (beforeCount, deleted) =
      VersionedTable.vacuum(spark, root, 2, retainMs = 0L)
    assert(deleted > 0)
    assert(beforeCount - deleted >= keptFiles.size)
    // kept versions read whole
    assert(VersionedTable.versions(spark, root) === Seq(2, 3))
    assert(VersionedTable.read(spark, root, Some(2)).count() === 50)
    assert(VersionedTable.read(spark, root, Some(3)).count() === 70)
    // every kept file physically present
    keptFiles.foreach { f =>
      assert(new java.io.File(
        new org.apache.hadoop.fs.Path(f.path).toUri.getPath).exists())
    }
    // v1 history is gone
    intercept[Exception] {
      VersionedTable.read(spark, root, Some(1)).count()
    }
    ()
  }

  test("concurrent merges: optimistic conflict retry preserves both " +
    "updates (no lost update, every head file live)") {
    import org.apache.spark.sql.functions.{concat, lit}
    val root = freshRoot("mergerace")
    VersionedTable.append(spark, root, idsDf(0 until 100), "doc_id", 4)
    // two committers upsert DISJOINT key ranges at the same time: the
    // loser's carry list is stale (the winner may have rewritten the
    // very files it planned to carry), so it must detect the conflict
    // (requireParent) and re-derive against the new head — losing
    // either update silently is the classic lost-update anomaly
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def merger(lo: Int, hi: Int, tag: String) = new Thread(() =>
      try {
        VersionedTable.merge(spark, root,
          idsDf(lo until hi)
            .withColumn("text", concat(lit(s"$tag "), col("text"))),
          "doc_id", 2)
        ()
      } catch { case t: Throwable => errs.add(t); () })
    val a = merger(0, 10, "A"); val b = merger(50, 60, "B")
    a.start(); b.start(); a.join(); b.join()
    assert(errs.isEmpty, s"merge race surfaced: ${errs.peek()}")
    // both landed: two new versions, both updates visible, no rows
    // lost or duplicated
    assert(VersionedTable.versions(spark, root) === Seq(1, 2, 3))
    val head = VersionedTable.read(spark, root)
    assert(head.count() === 100)
    assert(head.filter(col("doc_id") < 10 &&
      !col("text").startsWith("A ")).count() === 0, "update A lost")
    assert(head.filter(col("doc_id").between(50, 59) &&
      !col("text").startsWith("B ")).count() === 0, "update B lost")
    assert(head.filter(col("text").startsWith("A ")).count() === 10)
    assert(head.filter(col("text").startsWith("B ")).count() === 10)
    // every file the head references physically exists (a stale carry
    // list would reference a file the winner's rewrite superseded —
    // it must still exist because commits never delete, but the
    // REBASED manifest must also never point into the void)
    VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get).files.foreach { f =>
      assert(new java.io.File(
        new org.apache.hadoop.fs.Path(f.path).toUri.getPath).exists(),
        s"head references missing file ${f.path}")
    }
    ()
  }

  test("restore rolls the head back as a NEW commit; history intact; " +
    "zero data files written") {
    val root = freshRoot("restore")
    VersionedTable.append(spark, root, idsDf(0 until 30), "doc_id", 2)
    VersionedTable.merge(spark, root,
      idsDf(0 until 10).withColumn("text", lit("v2")), "doc_id", 1)
    VersionedTable.delete(spark, root, col("doc_id") >= 20, "doc_id", 1)
    val filesBefore = {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(root, "data"), true)
      var n = 0; while (it.hasNext) { it.next(); n += 1 }; n
    }
    val v = VersionedTable.restore(spark, root, toVersion = 1)
    assert(v === 4)
    // head content == v1 exactly (the merge and delete are undone)
    assert(VersionedTable.read(spark, root)
      .exceptAll(idsDf(0 until 30)).count() === 0)
    assert(VersionedTable.read(spark, root).count() === 30)
    // intermediate history still time-travels
    assert(VersionedTable.read(spark, root, Some(3)).count() === 20)
    assert(VersionedTable.read(spark, root, Some(2))
      .filter(col("text") === "v2").count() === 10)
    // restore wrote a manifest, not data
    val filesAfter = {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(root, "data"), true)
      var n = 0; while (it.hasNext) { it.next(); n += 1 }; n
    }
    assert(filesAfter === filesBefore, "restore must not write data files")
    ()
  }

  test("shallow clone is zero-copy, reads the source version, and " +
    "evolves independently") {
    val src = freshRoot("clonesrc")
    VersionedTable.append(spark, src, idsDf(0 until 40), "doc_id", 2)
    VersionedTable.merge(spark, src,
      idsDf(40 until 50), "doc_id", 1)
    val dst = freshRoot("clonedst")
    val v = VersionedTable.cloneShallow(spark, src, dst, Some(2))
    assert(v === 1)
    // zero-copy: the clone has no data directory of its own
    assert(!new java.io.File(s"$dst/data").exists())
    // reads the source's v2 byte-identically
    assert(VersionedTable.read(spark, dst)
      .exceptAll(VersionedTable.read(spark, src, Some(2))).count() === 0)
    assert(VersionedTable.read(spark, dst).count() === 50)
    // the clone evolves independently: a delete on the clone rewrites
    // into the CLONE's root and never mutates the source
    VersionedTable.delete(spark, dst, col("doc_id") < 10, "doc_id", 1)
    assert(VersionedTable.read(spark, dst).count() === 40)
    assert(VersionedTable.read(spark, src).count() === 50,
      "source must be untouched by clone-side mutation")
    // clone-side vacuum can never reach source files
    VersionedTable.vacuum(spark, dst,
      keepFrom = VersionedTable.latestVersion(spark, dst).get,
      retainMs = 0L)
    assert(VersionedTable.read(spark, src).count() === 50,
      "clone-side vacuum must not delete source data")
    // a second clone into a non-empty root is refused
    intercept[IllegalStateException] {
      VersionedTable.cloneShallow(spark, src, dst)
    }
    ()
  }

  test("source vacuum cannot break a registered clone: the clone " +
    "back-reference pins every file the clone still needs, and a " +
    "deleted clone's back-reference garbage-collects") {
    val src = freshRoot("clonevacsrc")
    VersionedTable.append(spark, src, idsDf(0 until 40), "doc_id", 2)
    val dst = freshRoot("clonevacdst")
    VersionedTable.cloneShallow(spark, src, dst)
    // the source moves on: a full rewrite (merge touching every file)
    // makes v1's files unreferenced BY THE SOURCE's kept manifests
    VersionedTable.merge(spark, src,
      idsDf(0 until 40).withColumn("text", lit("v2")), "doc_id", 2)
    val (_, deleted) =
      VersionedTable.vacuum(spark, src, keepFrom = 2, retainMs = 0L)
    // nothing the clone references may be reclaimed: the clone still
    // reads its full snapshot byte-identically
    assert(VersionedTable.read(spark, dst).count() === 40)
    assert(VersionedTable.read(spark, dst)
      .filter(col("text") === "v2").count() === 0,
      "clone must still read the ORIGINAL v1 content")
    assert(deleted === 0,
      "every v1 file is clone-referenced; vacuum must reclaim none")

    // delete the clone's version log: the back-reference is stale now
    def rmrf(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rmrf)
      f.delete(); ()
    }
    rmrf(new java.io.File(dst))
    val (_, deleted2) =
      VersionedTable.vacuum(spark, src, keepFrom = 2, retainMs = 0L)
    assert(deleted2 > 0,
      "with the clone gone, its pinned files must finally reclaim")
    assert(VersionedTable.read(spark, src).count() === 40)
    // and the stale back-reference file itself was garbage-collected
    val clonesDir = new java.io.File(s"$src/_versions/_clones")
    assert(!clonesDir.exists() ||
      clonesDir.listFiles().forall(!_.getName.startsWith("clone-")),
      "stale clone back-reference must be garbage-collected")
    ()
  }

  test("change feed folds: applying the v1->v2 feed to v1 reproduces v2") {
    val root = freshRoot("cdf")
    VersionedTable.append(spark, root, idsDf(0 until 25), "doc_id", 2)
    VersionedTable.merge(spark, root,
      idsDf(20 until 35).withColumn("text", lit("new")), "doc_id", 1)
    val feed = VersionedTable.changeFeed(spark, root, 1, 2).persist()
    val inserts = feed.filter(col("_change_type") === "insert")
      .drop("_change_type")
    val deletes = feed.filter(col("_change_type") === "delete")
      .drop("_change_type")
    // fold: v1 minus deletes plus inserts == v2 as a multiset
    val folded = VersionedTable.read(spark, root, Some(1))
      .exceptAll(deletes).unionByName(inserts)
    val v2 = VersionedTable.read(spark, root, Some(2))
    assert(folded.exceptAll(v2).count() === 0)
    assert(v2.exceptAll(folded).count() === 0)
    // the update keys appear as delete+insert pairs
    assert(deletes.filter(col("doc_id").between(20, 24)).count() === 5)
    assert(inserts.filter(col("text") === "new").count() === 15)
    feed.unpersist()
    ()
  }

  test("merge without orderCol rejects a duplicate-key batch loudly") {
    val root = freshRoot("dupkey")
    VersionedTable.append(spark, root, idsDf(0 until 20), "doc_id", 2)
    // two rows for doc_id=3: silently keeping both would corrupt the
    // one-row-per-key upsert contract, so merge must throw instead
    val dupBatch = idsDf(3 until 4).unionByName(
      idsDf(3 until 4).withColumn("text", lit("other")))
    val e = intercept[IllegalArgumentException] {
      VersionedTable.merge(spark, root, dupBatch, "doc_id", 1)
    }
    assert(e.getMessage.contains("multiple rows"))
    // the table is untouched: still exactly one version, 20 rows
    assert(VersionedTable.versions(spark, root) === Seq(1))
    assert(VersionedTable.read(spark, root).count() === 20)

    // the same batch WITH orderCol resolves keep-last deterministically
    val ordered = idsDf(3 until 4).withColumn("seq", lit(1L))
      .unionByName(idsDf(3 until 4)
        .withColumn("text", lit("winner")).withColumn("seq", lit(2L)))
    VersionedTable.merge(spark, root, ordered, "doc_id", 1,
      orderCol = Some("seq"))
    val head = VersionedTable.read(spark, root)
    assert(head.count() === 20)
    assert(head.filter(col("doc_id") === 3)
      .select(col("text")).head.getString(0) === "winner")
    ()
  }

  test("restore surfaces a commit racing past its observed head as a " +
    "conflict instead of silently erasing it") {
    val root = freshRoot("restorerace")
    VersionedTable.append(spark, root, idsDf(0 until 20), "doc_id", 2)
    VersionedTable.merge(spark, root,
      idsDf(0 until 5).withColumn("text", lit("v2")), "doc_id", 1)
    val observedHead = VersionedTable.latestVersion(spark, root).get // 2
    // a commit races in AFTER the restore read its head: previously the
    // restore would still win the next CAS slot and erase these rows
    // from the head with a success return on BOTH sides
    VersionedTable.append(spark, root, idsDf(100 until 110), "doc_id", 1)
    intercept[java.util.ConcurrentModificationException] {
      VersionedTable.restoreFrom(spark, root, toVersion = 1, observedHead)
    }
    // nothing was erased: the racer's rows are still in the head
    assert(VersionedTable.read(spark, root)
      .filter(col("doc_id") >= 100).count() === 10)
    assert(VersionedTable.versions(spark, root) === Seq(1, 2, 3))
    // re-issued against the CURRENT head, the restore is a deliberate,
    // acknowledged rollback and goes through
    val v = VersionedTable.restore(spark, root, toVersion = 1)
    assert(v === 4)
    assert(VersionedTable.read(spark, root).count() === 20)
    ()
  }

  test("merge's keep-last tiebreak tolerates map-typed columns") {
    import spark.implicits._
    val root = freshRoot("mapcol")
    val base = Seq((0L, "a", Map("k" -> "v0")), (1L, "b", Map("k" -> "v1")))
      .toDF("doc_id", "text", "attrs")
    VersionedTable.append(spark, root, base, "doc_id", 1)
    // a CDC batch with two events for doc_id=0 AND a map column:
    // xxhash64 over all columns would throw AnalysisException (maps are
    // unhashable); the tiebreak must restrict itself to hashable
    // columns and let orderCol resolve the duplicate
    val batch = Seq(
      (0L, "old", Map("k" -> "x"), 1L),
      (0L, "new", Map("k" -> "y"), 2L),
      (2L, "c", Map("k" -> "v2"), 1L))
      .toDF("doc_id", "text", "attrs", "seq")
    VersionedTable.merge(spark, root, batch, "doc_id", 1,
      orderCol = Some("seq"))
    val head = VersionedTable.read(spark, root)
    assert(head.count() === 3)
    val r0 = head.filter(col("doc_id") === 0L)
      .select(col("text"), col("attrs")("k")).head
    assert(r0.getString(0) === "new" && r0.getString(1) === "y")
    ()
  }

  test("reading a vacuumed-away version fast-fails as 'reclaimed', " +
    "not a retry-loop timeout") {
    val root = freshRoot("vacfail")
    VersionedTable.append(spark, root, idsDf(0 until 10), "doc_id", 1)
    VersionedTable.merge(spark, root,
      idsDf(0 until 2).withColumn("text", lit("v2")), "doc_id", 1)
    VersionedTable.merge(spark, root,
      idsDf(2 until 4).withColumn("text", lit("v3")), "doc_id", 1)
    VersionedTable.vacuum(spark, root, keepFrom = 3, retainMs = 0L)
    val t0 = System.nanoTime()
    val e = intercept[java.util.NoSuchElementException] {
      VersionedTable.read(spark, root, Some(1))
    }
    val ms = (System.nanoTime() - t0) / 1e6
    assert(e.getMessage.contains("reclaimed by vacuum"),
      s"wrong error: ${e.getMessage}")
    // the old behavior spun 100 x 20ms before a misleading timeout
    assert(ms < 1000, f"fast-fail took $ms%.0f ms")
    // restore and clone against the reclaimed version fail the same way
    intercept[java.util.NoSuchElementException] {
      VersionedTable.restore(spark, root, toVersion = 1)
    }
    intercept[java.util.NoSuchElementException] {
      VersionedTable.cloneShallow(spark, root, freshRoot("vacfaildst"),
        Some(1))
    }
    ()
  }

  test("restore and clone across a schema-evolution boundary: restore " +
    "re-reads the old schema; a clone spanning two schemas backfills " +
    "null") {
    import spark.implicits._
    val root = freshRoot("evorestore")
    VersionedTable.append(spark, root, idsDf(0 until 20), "doc_id", 2)
    // v2 evolves the schema: the upsert batch carries a new column
    val evolved = Seq((0L, "e0", 7L), (30L, "e30", 9L))
      .toDF("doc_id", "text", "score")
    VersionedTable.merge(spark, root, evolved, "doc_id", 1)
    assert(VersionedTable.read(spark, root).columns.toSet ===
      Set("doc_id", "text", "score"))

    // restore to the PRE-evolution version: the head must read with
    // v1's schema — no phantom score column resurrected from v2 files
    VersionedTable.restore(spark, root, toVersion = 1)
    val back = VersionedTable.read(spark, root)
    assert(back.columns.toSet === Set("doc_id", "text"))
    assert(back.count() === 20)

    // roll forward again to the evolved version: schema returns, old
    // rows read score as null (the read-side backfill contract)
    VersionedTable.restore(spark, root, toVersion = 2)
    val fwd = VersionedTable.read(spark, root)
    assert(fwd.columns.toSet === Set("doc_id", "text", "score"))
    assert(fwd.count() === 21)
    assert(fwd.filter(col("score").isNull).count() === 19)
    assert(fwd.filter(col("doc_id") === 0L)
      .select(col("score")).head.getLong(0) === 7L)

    // clone the evolved head (v2 files + v1 files in one manifest):
    // the clone reads the merged schema with the same null backfill
    val dst = freshRoot("evoclonedst")
    VersionedTable.cloneShallow(spark, root, dst)
    val cl = VersionedTable.read(spark, dst)
    assert(cl.columns.toSet === Set("doc_id", "text", "score"))
    assert(cl.count() === 21)
    assert(cl.filter(col("score").isNull).count() === 19)
    assert(cl.exceptAll(fwd).count() === 0 &&
      fwd.exceptAll(cl).count() === 0)
    ()
  }

  test("changeFeed with idCol resolves update pairs; one-sided keys " +
    "stay insert/delete") {
    val root = freshRoot("cdfpairs")
    VersionedTable.append(spark, root, idsDf(0 until 20), "doc_id", 2)
    // one commit that UPDATES 15..19, INSERTS 20..24 (merge), then a
    // separate delete commit so the 1->3 feed carries all four types
    VersionedTable.merge(spark, root,
      idsDf(15 until 25).withColumn("text", lit("upd")), "doc_id", 1)
    VersionedTable.delete(spark, root, col("doc_id") < 3, "doc_id", 1)
    val feed = VersionedTable.changeFeed(spark, root, 1, 3,
      idCol = Some("doc_id")).persist()
    val byType = feed.groupBy(col("_change_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType === Map(
      "update_preimage" -> 5L, "update_postimage" -> 5L,
      "insert" -> 5L, "delete" -> 3L))
    // images pair on the key and carry old vs new content
    val pre = feed.filter(col("_change_type") === "update_preimage")
    val post = feed.filter(col("_change_type") === "update_postimage")
    assert(pre.select(col("doc_id")).except(
      post.select(col("doc_id"))).count() === 0)
    assert(pre.filter(col("text") === "upd").count() === 0)
    assert(post.filter(col("text") =!= "upd").count() === 0)
    // folding still reproduces the head: -pre +post +insert -delete
    val folded = VersionedTable.read(spark, root, Some(1))
      .exceptAll(pre.drop("_change_type"))
      .exceptAll(feed.filter(col("_change_type") === "delete")
        .drop("_change_type"))
      .unionByName(post.drop("_change_type"))
      .unionByName(feed.filter(col("_change_type") === "insert")
        .drop("_change_type"))
    val head = VersionedTable.read(spark, root)
    assert(folded.exceptAll(head).count() === 0 &&
      head.exceptAll(folded).count() === 0)
    feed.unpersist()
    ()
  }
}
