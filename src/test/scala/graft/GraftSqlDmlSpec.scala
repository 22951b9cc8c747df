package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable
import graft.sources.v2.GraftSql

/** The SQL WRITE/DML face: INSERT / UPDATE / DELETE / MERGE over
  * `graft.`/root`` identifiers.  The shared test session has no
  * extensions, so these tests drive [[GraftSql.sql]]'s parse-level
  * interception — the extension-installed path (plain `spark.sql`)
  * runs end-to-end in a child JVM (SqlDmlChild), mirroring
  * GraftCatalogSpec's construction. */
class GraftSqlDmlSpec extends SparkSpec {

  private def freshRoot(kind: String): String =
    Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_sqldml_${kind}_" +
        s"${spark.sparkContext.applicationId}")

  private def seed(root: String, n: Int = 10): Unit = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"g${i % 2}", i.toLong))
      .toDF("id", "grp", "x")
      .write.format("graft-table").option("keyCol", "id").save(root)
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.v2.GraftCatalog")
  }

  private def count(root: String, where: String = ""): Long =
    GraftSql.sql(spark,
      s"SELECT count(*) AS n FROM graft.`$root` $where")
      .head().getLong(0)

  test("INSERT INTO: positional, with column list (null-fill), and " +
    "INSERT OVERWRITE — each one manifest commit, history intact") {
    val root = freshRoot("ins")
    seed(root)
    GraftSql.sql(spark, s"INSERT INTO graft.`$root` VALUES (100, 'new', 7)")
    assert(count(root) === 11L)
    assert(count(root, "WHERE id = 100 AND grp = 'new' AND x = 7") === 1L)
    GraftSql.sql(spark, s"INSERT INTO graft.`$root` (id, x) VALUES (101, 9)")
    assert(count(root, "WHERE id = 101 AND grp IS NULL AND x = 9") === 1L)
    assert(VersionedTable.latestVersion(spark, root) === Some(3))
    assert(VersionedTable.snapshot(spark, root, 2).op === "append")
    // INSERT from a SELECT over another graft table
    val src = freshRoot("inssrc")
    seed(src, 3)
    GraftSql.sql(spark,
      s"INSERT INTO graft.`$root` SELECT id + 500, grp, x " +
        s"FROM graft.`$src`")
    assert(count(root, "WHERE id >= 500") === 3L)
    // OVERWRITE: content swaps, history stays
    GraftSql.sql(spark, s"INSERT OVERWRITE graft.`$root` VALUES (1, 'o', 1)")
    assert(count(root) === 1L)
    assert(GraftSql.sql(spark,
      s"SELECT count(*) AS n FROM graft.`$root` VERSION AS OF 3")
      .head().getLong(0) === 12L)
  }

  test("UPDATE: SET expressions see the pre-update row, WHERE gates " +
    "with SQL NULL semantics, commits through the library path") {
    val root = freshRoot("upd")
    seed(root)
    GraftSql.sql(spark,
      s"UPDATE graft.`$root` SET x = x + 1000, grp = 'u' WHERE id < 3")
    assert(count(root, "WHERE grp = 'u'") === 3L)
    assert(count(root, "WHERE id = 2 AND x = 1002") === 1L)
    assert(count(root, "WHERE id = 5 AND x = 5") === 1L)
    assert(VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get).op === "update")
  }

  test("DELETE FROM with and without WHERE") {
    val root = freshRoot("del")
    seed(root)
    GraftSql.sql(spark, s"DELETE FROM graft.`$root` WHERE id % 2 = 0")
    assert(count(root) === 5L)
    GraftSql.sql(spark, s"DELETE FROM graft.`$root`")
    assert(count(root) === 0L)
    // history: pre-delete state still readable
    assert(GraftSql.sql(spark,
      s"SELECT count(*) AS n FROM graft.`$root` VERSION AS OF 1")
      .head().getLong(0) === 10L)
  }

  test("MERGE INTO: clause census — conditional matched update beats " +
    "delete, not-matched insert, NMBS update + delete, aliases " +
    "and unqualified source columns both resolve") {
    import spark.implicits._
    val root = freshRoot("mrg")
    seed(root, 100)
    Seq((0L, "s0", 1L), (5L, "s5", 2L), (200L, "s2", 3L))
      .toDF("id", "sgrp", "sx").createOrReplaceTempView("sqldml_src")
    GraftSql.sql(spark,
      s"""MERGE INTO graft.`$root` AS t
         |USING sqldml_src AS s ON t.id = s.id
         |WHEN MATCHED AND sx = 1 THEN UPDATE SET x = sx * 10, grp = sgrp
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT (id, grp, x) VALUES (s.id, sgrp, sx)
         |WHEN NOT MATCHED BY SOURCE AND t.id >= 90 THEN DELETE
         |""".stripMargin)
    assert(count(root, "WHERE id = 0 AND x = 10 AND grp = 's0'") === 1L)
    assert(count(root, "WHERE id = 5") === 0L)
    assert(count(root, "WHERE id = 200 AND grp = 's2' AND x = 3") === 1L)
    assert(count(root, "WHERE id >= 90 AND id < 200") === 0L)
    assert(count(root) === 100L - 1L - 10L + 1L)
    assert(VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get).op === "merge")
  }

  test("MERGE with a differently-named source key joins on the table " +
    "key; duplicate matched source keys throw through SQL too") {
    import spark.implicits._
    val root = freshRoot("mrgkey")
    seed(root)
    Seq((1L, 77L)).toDF("sid", "sx")
      .createOrReplaceTempView("sqldml_key_src")
    GraftSql.sql(spark,
      s"""MERGE INTO graft.`$root` AS t USING sqldml_key_src AS s
         |ON t.id = s.sid
         |WHEN MATCHED THEN UPDATE SET x = s.sx""".stripMargin)
    assert(count(root, "WHERE id = 1 AND x = 77") === 1L)
    Seq((2L, 1L), (2L, 2L)).toDF("sid", "sx")
      .createOrReplaceTempView("sqldml_dup_src")
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"""MERGE INTO graft.`$root` AS t USING sqldml_dup_src AS s
           |ON t.id = s.sid
           |WHEN MATCHED THEN UPDATE SET x = s.sx""".stripMargin)
    }
  }

  test("SQL DML negative cases: constraint violations surface, " +
    "non-key merge conditions and subqueries are rejected loudly, " +
    "hive-style INSERT PARTITION is refused") {
    import spark.implicits._
    val root = freshRoot("neg")
    seed(root)
    VersionedTable.addConstraint(spark, root, "x_pos", "x >= 0")
    val e = intercept[IllegalStateException] {
      GraftSql.sql(spark, s"INSERT INTO graft.`$root` VALUES (50, 'b', -1)")
    }
    assert(e.getMessage.contains("CHECK constraint"))
    assert(count(root, "WHERE x < 0") === 0L)
    Seq((1L, 1L)).toDF("id", "x").createOrReplaceTempView("sqldml_neg_src")
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"""MERGE INTO graft.`$root` AS t USING sqldml_neg_src AS s
           |ON t.x = s.x
           |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"DELETE FROM graft.`$root` WHERE id IN " +
          s"(SELECT id FROM graft.`$root` WHERE x > 5)")
    }
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"INSERT INTO graft.`$root` PARTITION (grp='a') VALUES (9, 9)")
    }
    // non-graft statements pass through untouched
    assert(GraftSql.sql(spark, "SELECT 1 AS one").head().getInt(0) === 1)
  }

  test("ALTER TABLE via SQL: RENAME COLUMN / DROP COLUMN / ADD " +
    "COLUMNS / SET+UNSET TBLPROPERTIES map to versioned metadata " +
    "commits on any session — no extensions required") {
    val root = freshRoot("alter")
    seed(root)
    spark.sql(s"ALTER TABLE graft.`$root` RENAME COLUMN x TO score")
    assert(VersionedTable.read(spark, root).columns.toSeq ===
      Seq("id", "grp", "score"))
    // the rename was metadata-only
    assert(VersionedTable.snapshot(spark, root, 2).files.map(_.path) ===
      VersionedTable.snapshot(spark, root, 1).files.map(_.path))
    spark.sql(s"ALTER TABLE graft.`$root` ADD COLUMNS (note STRING)")
    assert(VersionedTable.read(spark, root).columns.contains("note"))
    spark.sql(s"ALTER TABLE graft.`$root` DROP COLUMN note")
    assert(!VersionedTable.read(spark, root).columns.contains("note"))
    // IF EXISTS tolerates a missing column; a bare drop throws
    spark.sql(s"ALTER TABLE graft.`$root` DROP COLUMN IF EXISTS nope")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$root` DROP COLUMN nope")
    }
    // the table key refuses to rename through SQL too
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$root` RENAME COLUMN id TO key2")
    }
    spark.sql(s"ALTER TABLE graft.`$root` " +
      "SET TBLPROPERTIES ('curation.owner' = 'team-a')")
    val head = VersionedTable.latestVersion(spark, root).get
    assert(VersionedTable.snapshot(spark, root, head)
      .props.get("curation.owner") === Some("team-a"))
    spark.sql(s"ALTER TABLE graft.`$root` UNSET TBLPROPERTIES ('curation.owner')")
    assert(!VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get)
      .props.contains("curation.owner"))
    // structural properties refuse to unset
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$root` " +
        "UNSET TBLPROPERTIES ('table.schema')")
    }
    // SHOW TBLPROPERTIES serves the manifest props verbatim
    spark.sql(s"ALTER TABLE graft.`$root` " +
      "SET TBLPROPERTIES ('curation.stage' = 'filtered')")
    val props = spark.sql(s"SHOW TBLPROPERTIES graft.`$root`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("curation.stage") === Some("filtered"))
    assert(props.get("table.key") === Some("id"))
    assert(props.contains("table.schema"))
  }

  test("maintenance SQL grammar: DESCRIBE HISTORY/DETAIL, OPTIMIZE " +
    "[ZORDER BY], VACUUM [RETAIN n HOURS] [DRY RUN] — on any session " +
    "through GraftSql; ordinary SQL is untouched") {
    import spark.implicits._
    val root = freshRoot("maint")
    seed(root)
    GraftSql.sql(spark, s"INSERT INTO graft.`$root` VALUES (50, 'z', 5)")
    val hist = GraftSql.sql(spark, s"DESCRIBE HISTORY graft.`$root`")
      .collect()
    assert(hist.map(_.getInt(0)).toSeq === Seq(1, 2))
    assert(hist.map(_.getString(2)).toSeq === Seq("append", "append"))
    val det = GraftSql.sql(spark, s"DESCRIBE DETAIL graft.`$root`")
      .head()
    assert(det.getAs[String]("key_col") === "id")
    assert(det.getAs[Long]("num_live_rows") === 11L)
    // OPTIMIZE bin-packs the two tiny commits into one file
    val opt = GraftSql.sql(spark, s"OPTIMIZE graft.`$root`").head()
    assert(opt.getAs[Long]("num_files_after") <
      opt.getAs[Long]("num_files_before"))
    assert(VersionedTable.read(spark, root).count() === 11L)
    // OPTIMIZE ZORDER BY re-lays out on (grp, x)
    GraftSql.sql(spark, s"OPTIMIZE graft.`$root` ZORDER BY (grp, x)")
    assert(VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get).op === "zorder")
    // DRY RUN lists reclaimable files without deleting them
    val doomed = GraftSql.sql(spark,
      s"VACUUM graft.`$root` RETAIN 0 HOURS DRY RUN")
      .collect().map(_.getString(0))
    assert(doomed.nonEmpty)
    assert(doomed.forall(p =>
      new java.io.File(p.stripPrefix("file:")).exists()))
    // sub-floor retention REFUSES without the explicit opt-out
    // (Delta's retentionDurationCheck): RETAIN 0 HOURS would break
    // concurrent readers of recent snapshots
    val guard = intercept[Exception] {
      GraftSql.sql(spark, s"VACUUM graft.`$root` RETAIN 0 HOURS").head()
    }
    assert(guard.getMessage.contains("safety floor") ||
      Option(guard.getCause).exists(_.getMessage.contains("safety floor")))
    VersionedTable.setProperty(spark, root, "vacuum.retentionCheck",
      "false")
    // the real VACUUM (retain 0 h keeps only the head) reclaims them
    val vac = GraftSql.sql(spark,
      s"VACUUM graft.`$root` RETAIN 0 HOURS").head()
    assert(vac.getAs[Long]("data_files_deleted") >= doomed.length)
    assert(doomed.forall(p =>
      !new java.io.File(p.stripPrefix("file:")).exists()))
    assert(VersionedTable.read(spark, root).count() === 11L)
    // non-maintenance SQL flows through the ordinary path
    assert(GraftSql.sql(spark, "SELECT 2 AS two").head().getInt(0) === 2)
  }

  test("RESTORE TABLE ... TO VERSION AS OF and FSCK REPAIR TABLE " +
    "[DRY RUN] via SQL") {
    val root = freshRoot("restore")
    seed(root)
    GraftSql.sql(spark, s"DELETE FROM graft.`$root` WHERE id < 8")
    assert(count(root) === 2L)
    val r = GraftSql.sql(spark,
      s"RESTORE TABLE graft.`$root` TO VERSION AS OF 1").head()
    assert(r.getAs[Int]("restored_to") === 1)
    assert(count(root) === 10L)
    // TIMESTAMP AS OF accepts the conventional SQL spelling
    // 'yyyy-MM-dd HH:mm:ss' (not just epoch millis / ISO-8601): a
    // probe after the delete's commit restores back to the deleted
    // state
    val delTs = VersionedTable.snapshot(spark, root, 2).tsMillis
    val probe = new java.sql.Timestamp(delTs + 1).toString
    val r2 = GraftSql.sql(spark,
      s"RESTORE TABLE graft.`$root` TO TIMESTAMP AS OF '$probe'")
      .head()
    assert(r2.getAs[Int]("restored_to") === 2)
    assert(count(root) === 2L)
    val badTs = intercept[Exception] { GraftSql.sql(spark,
      s"RESTORE TABLE graft.`$root` TO TIMESTAMP AS OF 'yesterday'")
      .head() }
    assert(badTs.getMessage.contains("cannot parse") ||
      Option(badTs.getCause).exists(_.getMessage.contains("cannot parse")))
    // roll forward again for the FSCK half below
    GraftSql.sql(spark, s"RESTORE TABLE graft.`$root` TO VERSION AS OF 1")
    assert(count(root) === 10L)
    // FSCK: clean table reports nothing
    assert(GraftSql.sql(spark,
      s"FSCK REPAIR TABLE graft.`$root` DRY RUN").count() === 0L)
    // break a referenced data file, then audit + repair through SQL
    val victim = VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get).files.head.path
    new java.io.File(victim.stripPrefix("file:")).delete()
    val missing = GraftSql.sql(spark,
      s"FSCK REPAIR TABLE graft.`$root` DRY RUN").collect()
    assert(missing.length === 1 &&
      missing.head.getString(0) === "missing-data")
    GraftSql.sql(spark, s"FSCK REPAIR TABLE graft.`$root`")
    assert(VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get).op === "fsck")
    // the table reads again (the broken entry is gone)
    assert(count(root) < 10L)
  }

  test("end to end in a child JVM with the extension installed: plain " +
    "spark.sql drives INSERT / UPDATE / DELETE / MERGE / OVERWRITE " +
    "and constraint enforcement through GraftDmlRule") {
    val root = freshRoot("ext")
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx1g", "-Dspark.ui.enabled=false",
      "-cp", cp, "graft.SqlDmlChild", root)).toIndexedSeq
    val p = new ProcessBuilder(cmd: _*).inheritIO().start()
    assert(p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
      "SQL DML child JVM did not finish in time")
    assert(p.exitValue() === 0, "SQL DML child JVM failed")
  }
}
