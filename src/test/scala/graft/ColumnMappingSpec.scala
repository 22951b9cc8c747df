package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import graft.sources.VersionedTable
import graft.sources.VersionedTable.{MatchedUpdate, NotMatchedInsert}

/** Column RENAME / DROP via column mapping (Delta's name-mapping
  * invariant: physical storage names never change; renames and drops
  * are metadata commits whose mapping every snapshot carries for
  * itself).  Pins: zero files touched, reads serve the logical
  * surface everywhere (library, connector, CDF, time travel), writes
  * land under physical names, retired names never resurrect, and the
  * guard rails (key, constraints, retired-name collisions). */
class ColumnMappingSpec extends SparkSpec {

  private def freshRoot(kind: String): String =
    Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_colmap_${kind}_" +
        s"${spark.sparkContext.applicationId}")

  private def build(root: String, n: Int = 40): Unit = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"t$i", i.toLong * 2))
      .toDF("id", "txt", "score")
      .write.format("graft-table").option("keyCol", "id")
      .option("numFiles", "2").save(root)
  }

  test("RENAME COLUMN is metadata-only: zero files touched, reads " +
    "serve the new name with old files' data, time travel reads the " +
    "old name, and a rename round-trip clears the mapping") {
    val root = freshRoot("ren")
    build(root)
    val v1 = VersionedTable.snapshot(spark, root, 1)
    val v = VersionedTable.renameColumn(spark, root, "score", "rating")
    val v2 = VersionedTable.snapshot(spark, root, v)
    assert(v2.op === "rename-column")
    assert(v2.files.map(_.path) === v1.files.map(_.path))
    val got = VersionedTable.read(spark, root)
    assert(got.columns.toSeq === Seq("id", "txt", "rating"))
    assert(got.agg(sum(col("rating"))).head().getLong(0) ===
      (0 until 40).map(_ * 2L).sum)
    // time travel: the pre-rename snapshot reads its own names
    val old = VersionedTable.read(spark, root, Some(1))
    assert(old.columns.contains("score") && !old.columns.contains("rating"))
    // round-trip back: mapping entry collapses to identity and clears
    VersionedTable.renameColumn(spark, root, "rating", "score")
    val head = VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    assert(!head.props.contains(VersionedTable.ColumnMappingProp))
    assert(VersionedTable.read(spark, root).columns.contains("score"))
  }

  test("writes after a rename land under the PHYSICAL name; mixed " +
    "old/new files read uniformly; DML and the connector work on the " +
    "logical name") {
    import spark.implicits._
    val root = freshRoot("renw")
    build(root)
    VersionedTable.renameColumn(spark, root, "score", "rating")
    // append under the LOGICAL name
    VersionedTable.append(spark, root,
      Seq((100L, "new", 777L)).toDF("id", "txt", "rating"), "id", 1)
    // the new file physically carries the ORIGINAL storage name
    val head = VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    val newFile = head.files.map(_.path)
      .diff(VersionedTable.snapshot(spark, root, 1).files.map(_.path))
    assert(newFile.nonEmpty)
    val physCols = spark.read.parquet(newFile: _*).columns.toSet
    assert(physCols.contains("score") && !physCols.contains("rating"))
    // mixed-file read serves the logical surface
    val got = VersionedTable.read(spark, root)
    assert(got.filter(col("id") === 100).select("rating")
      .head().getLong(0) === 777L)
    assert(got.count() === 41)
    // UPDATE on the renamed column
    VersionedTable.update(spark, root, col("id") === 0,
      Map("rating" -> lit(999L)), "id", 1)
    assert(VersionedTable.read(spark, root).filter(col("id") === 0)
      .select("rating").head().getLong(0) === 999L)
    // MERGE with insert referencing the logical name
    VersionedTable.mergeInto(spark, root,
      Seq((200L, "m", 5L)).toDF("id", "txt", "rating"), "id", Seq(
        MatchedUpdate(Map("rating" -> col("s.rating"))),
        NotMatchedInsert(Map("txt" -> col("s.txt"),
          "rating" -> col("s.rating")))), 1)
    assert(VersionedTable.read(spark, root).filter(col("id") === 200)
      .select("rating").head().getLong(0) === 5L)
    // connector read serves logical names too (mapped tables route
    // through the logical-surface relation)
    val conn = spark.read.format("graft-table").load(root)
    assert(conn.columns.contains("rating") &&
      !conn.columns.contains("score"))
    assert(conn.filter(col("rating") === 999L).count() === 1L)
    // CDF across post-rename commits carries the renamed column's
    // values (the aligned diff reads the physical schema)
    val feed = VersionedTable.changeFeed(spark, root,
      VersionedTable.latestVersion(spark, root).get - 1,
      VersionedTable.latestVersion(spark, root).get, Some("id"))
    assert(feed.filter(col("_change_type") === "insert")
      .select("rating").head().getLong(0) === 5L)
  }

  test("DROP COLUMN narrows reads everywhere but keeps history; " +
    "re-ADD of the same name binds a fresh physical — old values " +
    "never resurrect; stats-pruned reads translate to physical names") {
    import spark.implicits._
    val root = freshRoot("drop")
    build(root)
    val v = VersionedTable.dropColumn(spark, root, "score")
    assert(VersionedTable.snapshot(spark, root, v).op === "drop-column")
    val got = VersionedTable.read(spark, root)
    assert(got.columns.toSeq === Seq("id", "txt"))
    // history intact
    assert(VersionedTable.read(spark, root, Some(1))
      .columns.contains("score"))
    // re-add the same name: reads NULL everywhere (no resurrection)
    VersionedTable.addColumn(spark, root, "score", LongType)
    val readd = VersionedTable.read(spark, root)
    assert(readd.columns.contains("score"))
    assert(readd.filter(col("score").isNotNull).count() === 0L)
    // new appends fill the re-added column; it stores under a fresh
    // physical name
    VersionedTable.append(spark, root,
      Seq((500L, "x", 42L)).toDF("id", "txt", "score"), "id", 1)
    val after = VersionedTable.read(spark, root)
    assert(after.filter(col("score") === 42L).count() === 1L)
    assert(after.filter(col("score").isNotNull).count() === 1L)
    val head = VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    val newFile = head.files.map(_.path)
      .diff(VersionedTable.snapshot(spark, root, 1).files.map(_.path))
    val phys = spark.read.parquet(newFile: _*).columns.toSet
    assert(!phys.contains("score") &&
      phys.exists(_.startsWith("score__p")))
    // ranged reads translate the logical name to per-file physicals
    val sliced = VersionedTable.read(spark, root,
      ranges = Map("score" -> (40L, 50L)))
    assert(sliced.filter(col("score").isNotNull).count() === 1L)
  }

  test("guard rails: key rename/drop refused, constraint-referenced " +
    "refused, duplicate target refused, appends colliding with a " +
    "retired physical name refused") {
    import spark.implicits._
    val root = freshRoot("guard")
    build(root)
    intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, "id", "key")
    }
    intercept[IllegalArgumentException] {
      VersionedTable.dropColumn(spark, root, "id")
    }
    intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, "txt", "score")
    }
    VersionedTable.addConstraint(spark, root, "score_pos", "score >= 0")
    intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, "score", "rating")
    }
    intercept[IllegalArgumentException] {
      VersionedTable.dropColumn(spark, root, "score")
    }
    VersionedTable.dropConstraint(spark, root, "score_pos")
    VersionedTable.renameColumn(spark, root, "score", "rating")
    // an append re-introducing the retired PHYSICAL name is rejected
    intercept[IllegalArgumentException] {
      VersionedTable.append(spark, root,
        Seq((900L, "x", 1L, 2L)).toDF("id", "txt", "rating", "score"),
        "id", 1)
    }
  }

  test("RESTORE past a rename rolls the mapping back with the schema") {
    val root = freshRoot("restore")
    build(root)
    VersionedTable.renameColumn(spark, root, "score", "rating")
    VersionedTable.restore(spark, root, toVersion = 1)
    val got = VersionedTable.read(spark, root)
    assert(got.columns.contains("score") && !got.columns.contains("rating"))
    val head = VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    assert(!head.props.contains(VersionedTable.ColumnMappingProp))
  }

  test("maintenance rewrites migrate mapped files toward " +
    "physical == logical and physically shed dropped columns") {
    import spark.implicits._
    val root = freshRoot("migrate")
    build(root)
    VersionedTable.renameColumn(spark, root, "score", "rating")
    VersionedTable.dropColumn(spark, root, "txt")
    // compact everything: the rewrite reads the LOGICAL surface and
    // writes physical names for the current mapping
    VersionedTable.optimize(spark, root, minRows = 1000000L, "id", 1)
    val head = VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    val phys = spark.read.parquet(head.files.map(_.path): _*).columns.toSet
    // 'rating' still stores under its immutable physical name 'score';
    // the dropped 'txt' is physically gone from the rewritten files
    assert(phys === Set("id", "score"))
    val got = VersionedTable.read(spark, root)
    assert(got.columns.toSeq === Seq("id", "rating"))
    assert(got.agg(sum(col("rating"))).head().getLong(0) ===
      (0 until 40).map(_ * 2L).sum)
  }

  test("rename CHAIN reusing a live physical name (score->tmp, " +
    "txt->score) serves each logical column the RIGHT data — the " +
    "order-dependent rename-fold hazard") {
    val root = freshRoot("chain")
    build(root)
    // after this chain: logical `tmp` is stored under physical
    // `score`, logical `score` under physical `txt`
    VersionedTable.renameColumn(spark, root, "score", "tmp")
    VersionedTable.renameColumn(spark, root, "txt", "score")
    val got = VersionedTable.read(spark, root)
    assert(got.columns.toSeq === Seq("id", "score", "tmp"))
    // `score` must carry the OLD txt strings, `tmp` the OLD numbers —
    // a sequential rename fold null-filled one and/or served the
    // other column's values
    assert(got.filter(col("id") === 7).select("score").head()
      .getString(0) === "t7")
    assert(got.filter(col("id") === 7).select("tmp").head()
      .getLong(0) === 14L)
    assert(got.filter(col("score").isNull || col("tmp").isNull)
      .count() === 0L)
  }

  test("rename SWAP via a temp (txt<->score) round-trips reads AND " +
    "writes: new appends land under swapped physicals without " +
    "duplicate-column corruption") {
    import spark.implicits._
    val root = freshRoot("swap")
    build(root)
    // classic three-rename swap: txt -> t0, score -> txt, t0 -> score
    VersionedTable.renameColumn(spark, root, "txt", "t0")
    VersionedTable.renameColumn(spark, root, "score", "txt")
    VersionedTable.renameColumn(spark, root, "t0", "score")
    // logical `txt` (LongType payload) stored physically as `score`,
    // logical `score` (StringType payload) physically as `txt`
    val got = VersionedTable.read(spark, root)
    assert(got.schema("txt").dataType === LongType)
    assert(got.schema("score").dataType === StringType)
    assert(got.filter(col("id") === 3).select("txt").head()
      .getLong(0) === 6L)
    assert(got.filter(col("id") === 3).select("score").head()
      .getString(0) === "t3")
    // a WRITE through the swapped mapping: the simultaneous
    // logical->physical projection must not alias two columns
    VersionedTable.append(spark, root,
      Seq((100L, 200L, "t100")).toDF("id", "txt", "score"), "id", 1)
    val after = VersionedTable.read(spark, root)
    assert(after.filter(col("id") === 100).select("txt").head()
      .getLong(0) === 200L)
    assert(after.filter(col("id") === 100).select("score").head()
      .getString(0) === "t100")
    // and the stored FILE carries physical names: old files still read
    assert(after.count() === 41L)
    assert(after.agg(sum(col("txt"))).head().getLong(0) ===
      (0 until 40).map(_ * 2L).sum + 200L)
  }
}
