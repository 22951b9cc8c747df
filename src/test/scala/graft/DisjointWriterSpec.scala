package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable
import graft.sources.VersionedTable.{MatchedUpdate, NotMatchedInsert}

/** Disjoint-writer commit fast path: a DML whose head moved between
  * file-set derivation and its CAS commits WITHOUT recomputing when
  * the intervening commits touched none of its rewrite set (and the
  * table metadata is unchanged) — at most one recompute between two
  * disjoint UPDATEs, and the interloper's effects survive.  The
  * interleaving is DETERMINISTIC via the `testBeforeCommit` seam
  * (runs once, between the outer DML's derivation and its first CAS
  * attempt). */
class DisjointWriterSpec extends SparkSpec {

  private def freshRoot(kind: String): String =
    Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_disj_${kind}_" +
        s"${spark.sparkContext.applicationId}")

  private def build(root: String): Unit = {
    import spark.implicits._
    // two range-partitioned files: ids 0..49 and 50..99
    VersionedTable.append(spark, root,
      (0 until 100).map(i => (i.toLong, i.toLong)).toDF("id", "v")
        .repartitionByRange(2, col("id")),
      "id", 2)
    ()
  }

  test("two disjoint UPDATEs: the second head movement rebases with " +
    "ZERO recomputes, both effects land, untouched file carries") {
    val root = freshRoot("upd")
    build(root)
    val before = VersionedTable.rebaseCommits.get()
    // outer update touches the LOW file only; the seam commits a
    // disjoint update of the HIGH file after the outer derivation
    VersionedTable.testBeforeCommit = () => {
      VersionedTable.update(spark, root, col("id") >= 90,
        Map("v" -> lit(-1L)), "id", 1)
      ()
    }
    try VersionedTable.update(spark, root, col("id") < 10,
      Map("v" -> (col("v") + 1000L)), "id", 1)
    finally VersionedTable.testBeforeCommit = () => ()
    assert(VersionedTable.rebaseCommits.get() === before + 1)
    // three commits: load + interloper + rebased outer (no retry
    // commit in between)
    assert(VersionedTable.latestVersion(spark, root) === Some(3))
    val got = VersionedTable.read(spark, root)
    assert(got.filter(col("v") >= 1000L).count() === 10L)  // outer
    assert(got.filter(col("v") === -1L).count() === 10L)   // interloper
    assert(got.count() === 100L)
  }

  test("overlapping UPDATEs still conflict and recompute: the second " +
    "writer sees the first's rows (serializable outcome, no lost " +
    "update)") {
    val root = freshRoot("conflict")
    build(root)
    val rebasesBefore = VersionedTable.rebaseCommits.get()
    // interloper rewrites the SAME low file the outer update targets
    VersionedTable.testBeforeCommit = () => {
      VersionedTable.update(spark, root, col("id") === 5,
        Map("v" -> lit(500L)), "id", 1)
      ()
    }
    try VersionedTable.update(spark, root, col("id") < 10,
      Map("v" -> (col("v") + 1000L)), "id", 1)
    finally VersionedTable.testBeforeCommit = () => ()
    // no rebase — a full recompute happened instead
    assert(VersionedTable.rebaseCommits.get() === rebasesBefore)
    val got = VersionedTable.read(spark, root)
    // serial order: interloper (v=500 at id 5) THEN outer (+1000 on
    // the PRE-update value it re-read after the conflict)
    assert(got.filter(col("id") === 5).select("v").head()
      .getLong(0) === 1500L)
    assert(got.filter(col("id") === 1).select("v").head()
      .getLong(0) === 1001L)
  }

  test("a concurrent metadata change (ADD CONSTRAINT) defeats the " +
    "rebase: the DML recomputes and the constraint applies") {
    val root = freshRoot("meta")
    build(root)
    val rebasesBefore = VersionedTable.rebaseCommits.get()
    VersionedTable.testBeforeCommit = () => {
      VersionedTable.addConstraint(spark, root, "v_cap", "v < 100000")
      ()
    }
    try VersionedTable.update(spark, root, col("id") < 10,
      Map("v" -> (col("v") + 1000L)), "id", 1)
    finally VersionedTable.testBeforeCommit = () => ()
    assert(VersionedTable.rebaseCommits.get() === rebasesBefore)
    assert(VersionedTable.read(spark, root)
      .filter(col("v") >= 1000L).count() === 10L)
  }

  test("MoR delete / MoR update rebase over an interleaved disjoint " +
    "writer; an interloper masking one of OUR touched files still " +
    "conflicts (DV pointer is part of file identity)") {
    val root = freshRoot("mor")
    build(root)
    val before = VersionedTable.rebaseCommits.get()
    // disjoint: MoR delete touches the LOW file, interloper appends
    VersionedTable.testBeforeCommit = () => {
      import spark.implicits._
      VersionedTable.append(spark, root,
        Seq((200L, 0L)).toDF("id", "v"), "id", 1)
      ()
    }
    try VersionedTable.deleteMoR(spark, root, col("id") < 5, "id")
    finally VersionedTable.testBeforeCommit = () => ()
    assert(VersionedTable.rebaseCommits.get() === before + 1)
    val got = VersionedTable.read(spark, root)
    assert(got.count() === 96L) // 100 - 5 masked + 1 appended
    assert(got.filter(col("id") === 200).count() === 1L)
    // MoR update rebases over a disjoint MoR delete of the HIGH file
    VersionedTable.testBeforeCommit = () => {
      VersionedTable.deleteMoR(spark, root, col("id") >= 95 &&
        col("id") < 200, "id")
      ()
    }
    try VersionedTable.updateMoR(spark, root,
      col("id") >= 5 && col("id") < 10, Map("v" -> lit(-7L)), "id")
    finally VersionedTable.testBeforeCommit = () => ()
    assert(VersionedTable.rebaseCommits.get() === before + 2)
    val got2 = VersionedTable.read(spark, root)
    assert(got2.filter(col("v") === -7L).count() === 5L)
    assert(got2.count() === 91L) // 96 - 5 masked
    // OVERLAP: interloper masks the same file our MoR update touches
    // -> full recompute (no rebase), serializable outcome
    val rebases = VersionedTable.rebaseCommits.get()
    VersionedTable.testBeforeCommit = () => {
      VersionedTable.deleteMoR(spark, root, col("id") === 12, "id")
      ()
    }
    try VersionedTable.updateMoR(spark, root,
      col("id") >= 10 && col("id") < 12, Map("v" -> lit(-9L)), "id")
    finally VersionedTable.testBeforeCommit = () => ()
    assert(VersionedTable.rebaseCommits.get() === rebases)
    val got3 = VersionedTable.read(spark, root)
    assert(got3.filter(col("id") === 12).count() === 0L)
    assert(got3.filter(col("v") === -9L).count() === 2L)
  }

  test("disjoint MERGE after an interleaved disjoint delete rebases; " +
    "the delete's effect survives the merge's carry") {
    import spark.implicits._
    val root = freshRoot("mrg")
    build(root)
    val before = VersionedTable.rebaseCommits.get()
    VersionedTable.testBeforeCommit = () => {
      // delete confined to the HIGH file
      VersionedTable.delete(spark, root, col("id") >= 95, "id", 1)
      ()
    }
    try VersionedTable.mergeInto(spark, root,
      Seq((1L, 77L), (200L, 7L)).toDF("id", "v"), "id", Seq(
        MatchedUpdate(Map("v" -> col("s.v"))),
        NotMatchedInsert(Map("v" -> col("s.v")))), 1)
    finally VersionedTable.testBeforeCommit = () => ()
    assert(VersionedTable.rebaseCommits.get() === before + 1)
    val got = VersionedTable.read(spark, root)
    assert(got.count() === 96L) // 100 - 5 deleted + 1 inserted
    assert(got.filter(col("id") === 1).select("v").head()
      .getLong(0) === 77L)
    assert(got.filter(col("id") >= 95 && col("id") < 200).count() === 0L)
    assert(got.filter(col("id") === 200).count() === 1L)
  }

  test("two racing INSERT-ONLY merges sharing an unmatched source " +
    "key do NOT both insert it: the interloper's addition is in the " +
    "second merge's READ set, so the rebase refuses and the recompute " +
    "sees the key as matched (serializable, no duplicate)") {
    import spark.implicits._
    val root = freshRoot("insdup")
    build(root)
    val before = VersionedTable.rebaseCommits.get()
    VersionedTable.testBeforeCommit = () => {
      VersionedTable.mergeInto(spark, root,
        Seq((500L, 1L)).toDF("id", "v"),
        "id", Seq(NotMatchedInsert(Map("v" -> col("s.v")))), 1)
      ()
    }
    try VersionedTable.mergeInto(spark, root,
      Seq((500L, 2L)).toDF("id", "v"),
      "id", Seq(NotMatchedInsert(Map("v" -> col("s.v")))), 1)
    finally VersionedTable.testBeforeCommit = () => ()
    // NOT a rebase: the interloper added a file holding our source key
    assert(VersionedTable.rebaseCommits.get() === before)
    val got = VersionedTable.read(spark, root).filter(col("id") === 500L)
    assert(got.count() === 1L) // once, not twice
    assert(got.select("v").head().getLong(0) === 1L) // first writer won
  }

  test("an interloper APPEND whose rows match our DELETE's predicate " +
    "defeats the rebase; the recompute deletes them too (the " +
    "added-files-vs-read-predicate conflict); a NON-matching append " +
    "still rebases") {
    import spark.implicits._
    val root = freshRoot("addread")
    build(root)
    val before = VersionedTable.rebaseCommits.get()
    // matching append: id=3 satisfies `id < 10`
    VersionedTable.testBeforeCommit = () => {
      VersionedTable.append(spark, root,
        Seq((3L, 333L)).toDF("id", "v"), "id", 1)
      ()
    }
    try VersionedTable.delete(spark, root, col("id") < 10, "id", 1)
    finally VersionedTable.testBeforeCommit = () => ()
    assert(VersionedTable.rebaseCommits.get() === before) // recomputed
    val got = VersionedTable.read(spark, root)
    assert(got.filter(col("id") < 10).count() === 0L) // 3 deleted too
    assert(got.count() === 90L)
    // non-matching append: id=300 cannot satisfy `id >= 90 and id < 95`
    VersionedTable.testBeforeCommit = () => {
      VersionedTable.append(spark, root,
        Seq((300L, 1L)).toDF("id", "v"), "id", 1)
      ()
    }
    try VersionedTable.delete(spark, root,
      col("id") >= 90 && col("id") < 95, "id", 1)
    finally VersionedTable.testBeforeCommit = () => ()
    assert(VersionedTable.rebaseCommits.get() === before + 1) // rebased
    val got2 = VersionedTable.read(spark, root)
    assert(got2.filter(col("id") === 300).count() === 1L)
    assert(got2.count() === 86L)
  }

  test("a TYPE-MISMATCHED DML literal never falsely proves bloom/stats " +
    "disjointness: DELETE WHERE longCol = '5' racing an append of " +
    "bloomed v=5 rows conflicts and recomputes (the parse-level " +
    "UTF8String would hash against long-built blooms and miss every " +
    "probe bit — the conjunct must drop, not lie)") {
    import spark.implicits._
    val root = freshRoot("typeconf")
    // bloom-enroll the value column BEFORE any write so the
    // interloper's added file carries a long-hashed bloom on `v`
    VersionedTable.setProperty(spark, root,
      VersionedTable.BloomColsProp, "v")
    VersionedTable.append(spark, root,
      (0 until 100).map(i => (i.toLong, i.toLong)).toDF("id", "v")
        .repartitionByRange(2, col("id")),
      "id", 2)
    val before = VersionedTable.rebaseCommits.get()
    // interloper appends rows MATCHING the delete's predicate (v=5) —
    // the engine's contract: an added file intersecting the DML's
    // read set defeats the rebase (serial order append-then-delete)
    VersionedTable.testBeforeCommit = () => {
      VersionedTable.append(spark, root,
        Seq((200L, 5L), (201L, 5L)).toDF("id", "v"), "id", 1)
      ()
    }
    // the analyzer would Cast this string literal; the rebase's
    // parse-level extraction sees a raw UTF8String against LongType v
    try VersionedTable.delete(spark, root, col("v") === "5", "id", 1)
    finally VersionedTable.testBeforeCommit = () => ()
    assert(VersionedTable.rebaseCommits.get() === before,
      "type-mismatched bound must defeat the rebase, not prove through" +
        " a wrong-type bloom probe")
    val got = VersionedTable.read(spark, root)
    assert(got.filter(col("v") === 5L).count() === 0L,
      "the racing append's matching rows must not survive the DELETE")
    // 100 initial + 2 appended - 3 deleted (id=5 and both interlopers)
    assert(got.count() === 99L)
  }

  test("a WELL-TYPED literal on a bloom-enrolled column still proves " +
    "disjointness: a non-matching bloomed append rebases with zero " +
    "recomputes (the type gate must not over-conservatize)") {
    import spark.implicits._
    val root = freshRoot("typok")
    VersionedTable.setProperty(spark, root,
      VersionedTable.BloomColsProp, "v")
    VersionedTable.append(spark, root,
      (0 until 100).map(i => (i.toLong, i.toLong)).toDF("id", "v")
        .repartitionByRange(2, col("id")),
      "id", 2)
    val before = VersionedTable.rebaseCommits.get()
    VersionedTable.testBeforeCommit = () => {
      VersionedTable.append(spark, root,
        Seq((200L, 7777L)).toDF("id", "v"), "id", 1)
      ()
    }
    try VersionedTable.delete(spark, root, col("v") === 5L, "id", 1)
    finally VersionedTable.testBeforeCommit = () => ()
    assert(VersionedTable.rebaseCommits.get() === before + 1,
      "well-typed stats/bloom disjointness proof must still rebase")
    val got = VersionedTable.read(spark, root)
    assert(got.filter(col("id") === 200L).count() === 1L)
    assert(got.count() === 100L) // 100 + 1 appended - 1 deleted
  }
}
