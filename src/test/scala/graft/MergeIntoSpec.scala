package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable
import graft.sources.VersionedTable.{MatchedDelete, MatchedUpdate, NotMatchedBySourceDelete, NotMatchedBySourceUpdate, NotMatchedInsert}

/** Row-level DML laws the DuckDB oracle can't express: UPDATE
  * (copy-on-write and merge-on-read) and conditional MERGE INTO —
  * clause ordering, multi-match detection, rewrite scope, constraint
  * gating, txn idempotence, and the empty-survivor edge. */
class MergeIntoSpec extends SparkSpec {

  private def freshRoot(kind: String): String =
    Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_mispec_${kind}_" +
        s"${spark.sparkContext.applicationId}")

  private def df(ids: Seq[Int]) = {
    import spark.implicits._
    ids.map(i => (i.toLong, i.toLong * 10, s"t$i")).toDF("id", "a", "b")
  }

  // ------------------------------------------------------------ UPDATE

  test("update applies assignments only where cond is TRUE (NULL rows " +
    "untouched), every assignment sees the PRE-update row, and " +
    "untouched files carry by reference") {
    import spark.implicits._
    val root = freshRoot("upd")
    // one file holds ids 0..49, the other 50..99 (range partition)
    VersionedTable.append(spark, root, df(0 until 100), "id", 2)
    val v1 = VersionedTable.snapshot(spark, root, 1)
    // swap-shaped assignment: a := a + b, b := a — correct only if b's
    // new value is the OLD a
    VersionedTable.update(spark, root,
      col("id") < 10, Map("a" -> (col("a") + col("id")),
        "b" -> concat(lit("x"), col("b"))), "id", 1)
    val v2 = VersionedTable.snapshot(spark, root, 2)
    // the 50..99 file never contained a matching row: carried verbatim
    assert(v1.files.map(_.path).toSet
      .intersect(v2.files.map(_.path).toSet).nonEmpty)
    val got = VersionedTable.read(spark, root)
      .select("id", "a", "b").as[(Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    (0 until 10).foreach { i =>
      assert(got(i.toLong) === (i * 10L + i, s"xt$i")) }
    (10 until 100).foreach { i =>
      assert(got(i.toLong) === (i * 10L, s"t$i")) }
  }

  test("update: NULL condition rows keep (SQL three-valued semantics)") {
    import spark.implicits._
    val root = freshRoot("updnull")
    val d = Seq((1L, Some(5L)), (2L, None), (3L, Some(50L)))
      .toDF("id", "v")
    VersionedTable.append(spark, root, d, "id", 1)
    // v > 10 is NULL for id=2: must stay, not be updated or dropped
    VersionedTable.update(spark, root, col("v") > 10,
      Map("v" -> (col("v") + 1L)), "id", 1)
    val got = VersionedTable.read(spark, root).orderBy("id")
      .as[(Long, Option[Long])].collect()
    assert(got === Array((1L, Some(5L)), (2L, None), (3L, Some(51L))))
  }

  test("update rejects key assignment and unknown columns") {
    val root = freshRoot("updkey")
    VersionedTable.append(spark, root, df(0 until 10), "id", 1)
    intercept[IllegalArgumentException] {
      VersionedTable.update(spark, root, lit(true),
        Map("id" -> (col("id") + 1L)), "id", 1)
    }
    intercept[IllegalArgumentException] {
      VersionedTable.update(spark, root, lit(true),
        Map("nope" -> lit(1L)), "id", 1)
    }
  }

  test("update enforces CHECK constraints on the post-image and " +
    "commits nothing on violation; txnId makes a retried update " +
    "exactly-once") {
    val root = freshRoot("updcs")
    VersionedTable.append(spark, root, df(0 until 20), "id", 1)
    VersionedTable.addConstraint(spark, root, "a_small", "a < 1000")
    intercept[IllegalStateException] {
      VersionedTable.update(spark, root, col("id") === 5,
        Map("a" -> lit(99999L)), "id", 1)
    }
    assert(VersionedTable.latestVersion(spark, root) === Some(2))
    val v = VersionedTable.update(spark, root, col("id") === 5,
      Map("a" -> lit(999L)), "id", 1, txnId = Some("upd#1"))
    val v2 = VersionedTable.update(spark, root, col("id") === 5,
      Map("a" -> (col("a") + 1L)), "id", 1, txnId = Some("upd#1"))
    assert(v === v2) // replay is a no-op returning the same version
    assert(VersionedTable.read(spark, root)
      .filter(col("id") === 5).select("a").head().getLong(0) === 999L)
  }

  test("updateMoR rewrites nothing: data files carry by reference, " +
    "masks land as DV refs, post-images as new files; live counts " +
    "stay exact and the read matches copy-on-write semantics") {
    val root = freshRoot("updmor")
    VersionedTable.append(spark, root, df(0 until 100), "id", 4)
    val v1 = VersionedTable.snapshot(spark, root, 1)
    VersionedTable.updateMoR(spark, root,
      pmod(col("id"), lit(10)) === 0, Map("a" -> (col("a") + 1L)), "id")
    val v2 = VersionedTable.snapshot(spark, root, 2)
    assert(v2.op === "update-mor")
    // every v1 file survives; the post-image arrived as a NEW file
    assert(v1.files.map(_.path).toSet
      .subsetOf(v2.files.map(_.path).toSet))
    assert(v2.files.size > v1.files.size)
    assert(v2.files.count(_.dv.isDefined) === 4) // every file held a %10
    assert(v2.rows === 100) // masked 10, added 10: live count exact
    val got = VersionedTable.read(spark, root)
    assert(got.count() === 100)
    assert(got.filter(pmod(col("id"), lit(10)) === 0)
      .agg(sum(col("a"))).head().getLong(0) ===
      (0 until 100 by 10).map(_ * 10L + 1).sum)
  }

  test("updateMoR folds prior deletion vectors and purge materializes " +
    "to an identical read") {
    val root = freshRoot("updmorfold")
    VersionedTable.append(spark, root, df(0 until 100), "id", 2)
    VersionedTable.deleteMoR(spark, root, col("id") < 5, "id")
    // updates rows in the same files the delete already masked
    VersionedTable.updateMoR(spark, root, col("id") >= 5 && col("id") < 8,
      Map("b" -> lit("upd")), "id")
    val before = VersionedTable.read(spark, root).orderBy("id").collect()
    assert(before.length === 95)
    assert(before.take(3).map(_.getString(2)).forall(_ == "upd"))
    VersionedTable.purgeDeletes(spark, root, "id", 2)
    val after = VersionedTable.read(spark, root).orderBy("id").collect()
    assert(after === before) // purge is read-identity
  }

  // -------------------------------------------------------- MERGE INTO

  private def buildTarget(root: String): Unit = {
    VersionedTable.append(spark, root, df(0 until 100), "id", 2)
    ()
  }

  test("mergeInto: first match wins within a clause class — a row " +
    "satisfying both the UPDATE and DELETE conditions updates") {
    import spark.implicits._
    val root = freshRoot("mifmw")
    buildTarget(root)
    val src = Seq((3L, 777L, "s3"), (4L, 888L, "s4"))
      .toDF("id", "a", "b")
    VersionedTable.mergeInto(spark, root, src, "id", Seq(
      // id=3 satisfies BOTH conditions; the update clause is first
      MatchedUpdate(Map("a" -> col("s.a")),
        cond = Some(col("s.id") === 3)),
      MatchedDelete(cond = Some(col("t.id") < 10))), 1)
    val got = VersionedTable.read(spark, root)
      .filter(col("id") < 10).orderBy("id")
      .as[(Long, Long, String)].collect()
    // 3 updated (not deleted); 4 deleted; others untouched
    assert(got.map(_._1) === Array(0L, 1L, 2L, 3L, 5L, 6L, 7L, 8L, 9L))
    assert(got.find(_._1 == 3L).get._2 === 777L)
    assert(got.find(_._1 == 3L).get._3 === "t3") // unassigned col kept
  }

  test("mergeInto: multiple source rows matching one target row throw; " +
    "duplicate NON-matching keys are allowed (plain double insert)") {
    import spark.implicits._
    val root = freshRoot("midup")
    buildTarget(root)
    val dupMatched = Seq((5L, 1L, "x"), (5L, 2L, "y")).toDF("id", "a", "b")
    intercept[IllegalArgumentException] {
      VersionedTable.mergeInto(spark, root, dupMatched, "id", Seq(
        MatchedUpdate(Map("a" -> col("s.a")))), 1)
    }
    assert(VersionedTable.latestVersion(spark, root) === Some(1))
  }

  test("mergeInto: NOT MATCHED BY SOURCE update/delete see only the " +
    "target side; without such clauses untouched files carry by " +
    "reference, with them every file is in scope") {
    import spark.implicits._
    val root = freshRoot("minmbs")
    buildTarget(root)
    val v1 = VersionedTable.snapshot(spark, root, 1)
    // source matches only low ids -> high-range file must carry
    val src = Seq((1L, 11L, "s1")).toDF("id", "a", "b")
    VersionedTable.mergeInto(spark, root, src, "id", Seq(
      MatchedUpdate(Map("a" -> col("s.a")))), 1)
    val v2 = VersionedTable.snapshot(spark, root, 2)
    assert(v1.files.map(_.path).toSet
      .intersect(v2.files.map(_.path).toSet).nonEmpty)
    // NMBS: every unmatched row with id >= 90 deletes, id in [80,90)
    // stamps b; matched row 1 keeps its v2 value
    VersionedTable.mergeInto(spark, root, src, "id", Seq(
      NotMatchedBySourceUpdate(Map("b" -> lit("stale")),
        cond = Some(col("t.id") >= 80 && col("t.id") < 90)),
      NotMatchedBySourceDelete(cond = Some(col("t.id") >= 90))), 2)
    val got = VersionedTable.read(spark, root)
    assert(got.count() === 90)
    assert(got.filter(col("b") === "stale").count() === 10)
    assert(got.filter(col("id") === 1).select("a").head().getLong(0) === 11L)
  }

  test("mergeInto: INSERT defaults an unlisted key to the source key " +
    "and unlisted columns to NULL; the insert condition gates") {
    import spark.implicits._
    val root = freshRoot("miins")
    buildTarget(root)
    val src = Seq((200L, 1L, "in"), (201L, 2L, "out"))
      .toDF("id", "a", "b")
    VersionedTable.mergeInto(spark, root, src, "id", Seq(
      NotMatchedInsert(Map("a" -> col("s.a")),
        cond = Some(col("s.b") === "in"))), 1)
    val got = VersionedTable.read(spark, root).filter(col("id") >= 200)
      .as[(Long, Long, Option[String])].collect()
    assert(got === Array((200L, 1L, None))) // 201 gated out; b NULL
  }

  test("mergeInto insert-only: matched target files are never " +
    "rewritten (every parent file carries by reference), matched " +
    "source rows — even DUPLICATE matched keys — are ignored, and " +
    "duplicate UNMATCHED keys insert once per source row") {
    import spark.implicits._
    val root = freshRoot("miinsonly")
    buildTarget(root)
    val v1 = VersionedTable.snapshot(spark, root, 1)
    // ids 5 and 5 MATCH (duplicate matched key: legal in insert-only —
    // no target row flows through any join, nothing can duplicate);
    // 300 appears twice UNMATCHED: SQL MERGE inserts one row per
    // unmatched source row
    val src = Seq((5L, 1L, "x"), (5L, 2L, "y"),
      (300L, 3L, "p"), (300L, 4L, "q")).toDF("id", "a", "b")
    VersionedTable.mergeInto(spark, root, src, "id", Seq(
      NotMatchedInsert(Map("a" -> col("s.a"), "b" -> col("s.b")))), 1)
    val v2 = VersionedTable.snapshot(spark, root, 2)
    // append-shaped: EVERY parent file carried by reference
    assert(v1.files.map(_.path).toSet
      .subsetOf(v2.files.map(_.path).toSet))
    val got = VersionedTable.read(spark, root)
    assert(got.count() === 102)
    // target row 5 untouched; both unmatched source rows landed
    assert(got.filter(col("id") === 5).select("a").head()
      .getLong(0) === 50L)
    assert(got.filter(col("id") === 300).count() === 2)
  }

  test("mergeInto: duplicate matched source keys throw for EVERY " +
    "shape that rewrites matched files — including NOT MATCHED BY " +
    "SOURCE merges with no WHEN MATCHED clause (a silent double-write " +
    "otherwise)") {
    import spark.implicits._
    val root = freshRoot("midupnmbs")
    buildTarget(root)
    val dupMatched = Seq((5L, 1L, "x"), (5L, 2L, "y"))
      .toDF("id", "a", "b")
    intercept[IllegalArgumentException] {
      VersionedTable.mergeInto(spark, root, dupMatched, "id", Seq(
        NotMatchedBySourceUpdate(Map("b" -> lit("stale")))), 1)
    }
    intercept[IllegalArgumentException] {
      VersionedTable.mergeInto(spark, root, dupMatched, "id", Seq(
        NotMatchedInsert(Map("a" -> col("s.a"))),
        NotMatchedBySourceDelete()), 1)
    }
    assert(VersionedTable.latestVersion(spark, root) === Some(1))
  }

  test("mergeInto: a rewrite that deletes every surviving row and " +
    "inserts nothing still commits, and the table reads back") {
    import spark.implicits._
    val root = freshRoot("miempty")
    VersionedTable.append(spark, root, df(0 until 10), "id", 1)
    val src = (0 until 10).map(i => (i.toLong, 0L, "")).toDF("id", "a", "b")
    VersionedTable.mergeInto(spark, root, src, "id", Seq(
      MatchedDelete()), 1)
    assert(VersionedTable.read(spark, root).count() === 0)
    assert(VersionedTable.snapshot(spark, root, 2).files.isEmpty)
  }

  test("mergeInto enforces CHECK constraints on changed rows only and " +
    "is exactly-once under txnId") {
    import spark.implicits._
    val root = freshRoot("mics")
    buildTarget(root)
    VersionedTable.addConstraint(spark, root, "a_small", "a < 2000")
    val bad = Seq((5L, 99999L, "x")).toDF("id", "a", "b")
    intercept[IllegalStateException] {
      VersionedTable.mergeInto(spark, root, bad, "id", Seq(
        MatchedUpdate(Map("a" -> col("s.a")))), 1)
    }
    val ok = Seq((5L, 1999L, "x")).toDF("id", "a", "b")
    val v = VersionedTable.mergeInto(spark, root, ok, "id", Seq(
      MatchedUpdate(Map("a" -> col("s.a")))), 1, txnId = Some("mi#1"))
    val v2 = VersionedTable.mergeInto(spark, root, ok, "id", Seq(
      MatchedUpdate(Map("a" -> (col("s.a") + 1L)))), 1,
      txnId = Some("mi#1"))
    assert(v === v2)
    assert(VersionedTable.read(spark, root)
      .filter(col("id") === 5).select("a").head().getLong(0) === 1999L)
  }

  test("mergeInto rejects key assignment in update clauses and an " +
    "empty clause list") {
    import spark.implicits._
    val root = freshRoot("mireq")
    buildTarget(root)
    val src = Seq((1L, 1L, "x")).toDF("id", "a", "b")
    intercept[IllegalArgumentException] {
      VersionedTable.mergeInto(spark, root, src, "id", Seq(
        MatchedUpdate(Map("id" -> lit(7L)))), 1)
    }
    intercept[IllegalArgumentException] {
      VersionedTable.mergeInto(spark, root, src, "id", Seq.empty, 1)
    }
  }

  test("replaceWhere: one commit swaps the slice, untouched files " +
    "carry, outside-slice batches are rejected, NULL-condition rows " +
    "keep, and txnId makes retries exactly-once") {
    import spark.implicits._
    val root = freshRoot("rw")
    val d = Seq((1L, Some("a"), 10L), (2L, Some("b"), 20L),
      (3L, None, 30L), (60L, Some("a"), 60L), (70L, Some("b"), 70L))
      .toDF("id", "grp", "x")
    VersionedTable.append(spark, root,
      d.repartitionByRange(2, col("id")), "id", 2)
    val v1 = VersionedTable.snapshot(spark, root, 1)
    // outside-slice row (grp='b') rejected before anything commits
    intercept[IllegalArgumentException] {
      VersionedTable.replaceWhere(spark, root, col("grp") === "a",
        Seq((9L, Some("b"), 0L)).toDF("id", "grp", "x"), "id", 1)
    }
    assert(VersionedTable.latestVersion(spark, root) === Some(1))
    // replace grp='a' (ids 1 and 60, in BOTH files) with one new row;
    // two output files so the next slice-replace has something to carry
    val batch = Seq((100L, Some("a"), 1L)).toDF("id", "grp", "x")
    val v = VersionedTable.replaceWhere(spark, root, col("grp") === "a",
      batch, "id", 2, txnId = Some("rw#1"))
    assert(VersionedTable.snapshot(spark, root, v).op === "replace-where")
    val got = VersionedTable.read(spark, root).orderBy("id")
      .as[(Long, Option[String], Long)].collect()
    // NULL grp (id 3) kept — SQL three-valued semantics
    assert(got === Array((2L, Some("b"), 20L), (3L, None, 30L),
      (70L, Some("b"), 70L), (100L, Some("a"), 1L)))
    // retry is a no-op
    assert(VersionedTable.replaceWhere(spark, root, col("grp") === "a",
      batch, "id", 2, txnId = Some("rw#1")) === v)
    assert(VersionedTable.latestVersion(spark, root) === Some(v))
    // a slice confined to the high-range file leaves the low one
    // carried by reference
    val v3 = VersionedTable.replaceWhere(spark, root, col("id") >= 60,
      Seq((80L, Some("z"), 0L)).toDF("id", "grp", "x"), "id", 1)
    val s3 = VersionedTable.snapshot(spark, root, v3)
    assert(VersionedTable.snapshot(spark, root, v).files.map(_.path)
      .toSet.intersect(s3.files.map(_.path).toSet).nonEmpty)
    assert(VersionedTable.read(spark, root).orderBy("id")
      .as[(Long, Option[String], Long)].collect() ===
      Array((2L, Some("b"), 20L), (3L, None, 30L),
        (80L, Some("z"), 0L)))
  }

  test("replaceWhere through the connector: mode(overwrite) + " +
    "option(replaceWhere, sqlPredicate)") {
    import spark.implicits._
    val root = freshRoot("rwconn")
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "grp")
      .write.format("graft-table").option("keyCol", "id").save(root)
    Seq((10L, "a")).toDF("id", "grp")
      .write.format("graft-table").mode("overwrite")
      .option("replaceWhere", "grp = 'a'").save(root)
    val got = VersionedTable.read(spark, root).orderBy("id")
      .as[(Long, String)].collect()
    assert(got === Array((2L, "b"), (10L, "a")))
    // plain overwrite still replaces everything
    Seq((5L, "c")).toDF("id", "grp")
      .write.format("graft-table").mode("overwrite").save(root)
    assert(VersionedTable.read(spark, root).count() === 1)
  }

  test("ALTER TABLE ADD COLUMN: metadata-only widen — zero files " +
    "touched, library and connector both read NULL until data " +
    "arrives, later writes fill it, duplicates throw") {
    import spark.implicits._
    val root = freshRoot("addcol")
    VersionedTable.append(spark, root, df(0 until 20), "id", 2)
    val before = VersionedTable.snapshot(spark, root, 1)
    val v = VersionedTable.addColumn(spark, root, "tag",
      org.apache.spark.sql.types.StringType)
    val after = VersionedTable.snapshot(spark, root, v)
    assert(after.op === "add-column")
    assert(after.files.map(_.path) === before.files.map(_.path))
    val lib = VersionedTable.read(spark, root)
    assert(lib.columns.contains("tag"))
    assert(lib.filter(col("tag").isNotNull).count() === 0)
    val conn = spark.read.format("graft-table").load(root)
    assert(conn.columns.contains("tag"))
    assert(conn.filter(col("tag").isNotNull).count() === 0)
    // new data fills it; old rows stay null
    VersionedTable.append(spark, root,
      Seq((100L, 1L, "x", "tagged")).toDF("id", "a", "b", "tag"),
      "id", 1)
    val got = VersionedTable.read(spark, root)
    assert(got.filter(col("tag") === "tagged").count() === 1)
    assert(got.filter(col("tag").isNull).count() === 20)
    intercept[IllegalArgumentException] {
      VersionedTable.addColumn(spark, root, "tag",
        org.apache.spark.sql.types.StringType)
    }
  }

  test("updateMoR CDC: the change feed across the commit is pure " +
    "update pairs keyed to the masked rows") {
    val root = freshRoot("updmorcdc")
    VersionedTable.append(spark, root, df(0 until 50), "id", 2)
    VersionedTable.updateMoR(spark, root, col("id") < 7,
      Map("a" -> (col("a") + 100L)), "id")
    val feed = VersionedTable.changeFeed(spark, root, 1, 2, Some("id"))
    val byType = feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType === Map(
      "update_preimage" -> 7L, "update_postimage" -> 7L))
  }

  test("mergeInto onExtra residual: a key-matched pair failing the " +
    "residual is unmatched BOTH ways — NMBS clauses apply to the " +
    "target row and insert clauses to the source row") {
    import spark.implicits._
    import graft.sources.VersionedTable.{MatchedUpdate, NotMatchedInsert, NotMatchedBySourceDelete}
    val root = Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_onextra_" +
        s"${spark.sparkContext.applicationId}")
    VersionedTable.append(spark, root,
      (0 until 10).map(i => (i.toLong, s"g${i % 2}", i.toLong))
        .toDF("id", "grp", "x"), "id", 2)
    // residual t.grp = 'g0': ids 0,2,4 (g0) are true matches; ids 1,3
    // (g1) key-match but fail the residual -> their SOURCE rows insert
    // AND the NMBS delete sees the TARGET rows as not-matched
    VersionedTable.mergeInto(spark, root,
      Seq((0L, 100L), (1L, 101L), (2L, 102L), (3L, 103L), (4L, 104L))
        .toDF("id", "nx"),
      "id", Seq(
        MatchedUpdate(Map("x" -> col("s.nx"))),
        NotMatchedInsert(Map("grp" -> lit("ins"), "x" -> col("s.nx"))),
        NotMatchedBySourceDelete(cond = Some(col("t.id") >= 8))),
      2, onExtra = Some(col("t.grp") === "g0"))
    val got = VersionedTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got.contains((0L, "g0", 100L)))  // matched+residual: updated
    assert(got.contains((2L, "g0", 102L)))
    assert(got.contains((4L, "g0", 104L)))
    assert(got.contains((1L, "g1", 1L)))    // residual failed: kept
    assert(got.contains((1L, "ins", 101L))) // ...and source inserted
    assert(got.contains((3L, "ins", 103L)))
    assert(!got.exists(t => t._1 >= 8 && t._2 != "ins")) // NMBS deleted 8,9
    // 10 - 2 (NMBS) + 2 inserts = 10
    assert(got.size === 10)
  }

  test("mergeInto compound-ON dup guard: key-sharing source rows whose " +
    "residual selects at most one per target row are Delta-legal (no " +
    "false positive); two source rows passing the residual for one " +
    "target row still throw") {
    import spark.implicits._
    val root = Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_ondup_" +
        s"${spark.sparkContext.applicationId}")
    VersionedTable.append(spark, root,
      (0 until 10).map(i => (i.toLong, s"g${i % 2}", i.toLong))
        .toDF("id", "grp", "x"), "id", 2)
    // two source rows share key 4, but the residual t.grp = s.sg
    // selects exactly ONE per target row (target 4 is g0) — counting
    // duplicates by key alone would throw here, wrongly
    val legal = Seq((4L, "g0", 400L), (4L, "g1", 401L))
      .toDF("id", "sg", "nx")
    VersionedTable.mergeInto(spark, root, legal, "id", Seq(
      MatchedUpdate(Map("x" -> col("s.nx")))), 1,
      onExtra = Some(col("t.grp") === col("s.sg")))
    val got = VersionedTable.read(spark, root)
    assert(got.filter(col("id") === 4L).select("x").head()
      .getLong(0) === 400L) // the residual-selected row won
    assert(got.count() === 10L)
    // both source rows pass the residual for target row 4: ambiguous,
    // must throw loudly (no silent double-write)
    val illegal = Seq((4L, "g0", 500L), (4L, "g0", 501L))
      .toDF("id", "sg", "nx")
    intercept[IllegalArgumentException] {
      VersionedTable.mergeInto(spark, root, illegal, "id", Seq(
        MatchedUpdate(Map("x" -> col("s.nx")))), 1,
        onExtra = Some(col("t.grp") === col("s.sg")))
    }
    // the failed merge committed nothing
    assert(VersionedTable.read(spark, root)
      .filter(col("id") === 4L).select("x").head().getLong(0) === 400L)
  }
}
