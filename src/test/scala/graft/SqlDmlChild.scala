package graft

import org.apache.spark.sql.SparkSession

/** Child-JVM half of GraftSqlDmlSpec's end-to-end test: the FIRST
  * session of this JVM installs `spark.sql.extensions` (static conf),
  * so PLAIN `spark.sql` must drive the whole DML lifecycle — INSERT,
  * INSERT with column list, INSERT OVERWRITE, UPDATE, DELETE and a
  * multi-clause MERGE — through the injected GraftDmlRule, with the
  * library commit protocol underneath (versions advance, constraints
  * enforce).  Exits non-zero on any failed check. */
object SqlDmlChild {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.sources.v2.GraftCatalog")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import graft.sources.VersionedTable
    try {
      def check(cond: Boolean, what: String): Unit =
        if (!cond) { System.err.println(s"FAILED: $what"); sys.exit(1) }
      def count(where: String = ""): Long =
        s.sql(s"SELECT count(*) AS n FROM graft.`$root` $where")
          .head().getLong(0)

      // seed: ids 0..9 written through the connector (v1)
      import s.implicits._
      (0 until 10).map(i => (i.toLong, s"g${i % 2}", i.toLong))
        .toDF("id", "grp", "x")
        .write.format("graft-table").option("keyCol", "id").save(root)

      // INSERT INTO, positional
      s.sql(s"INSERT INTO graft.`$root` VALUES (100, 'new', 7)")
      check(count() == 11L, "INSERT INTO positional")
      check(count("WHERE id = 100 AND grp = 'new' AND x = 7") == 1L,
        "inserted row readable")
      // INSERT INTO with a column list: unlisted columns become NULL
      s.sql(s"INSERT INTO graft.`$root` (id, x) VALUES (101, 9)")
      check(count("WHERE id = 101 AND grp IS NULL AND x = 9") == 1L,
        "INSERT with column list null-fills")
      check(VersionedTable.latestVersion(s, root).contains(3),
        "each INSERT is one commit")

      // UPDATE with WHERE; assignments see the pre-update row
      s.sql(s"UPDATE graft.`$root` SET x = x + 1000, grp = 'upd' " +
        "WHERE id < 3")
      check(count("WHERE grp = 'upd' AND x >= 1000") == 3L,
        "UPDATE applied where cond true")
      check(count("WHERE id = 5 AND x = 5") == 1L,
        "UPDATE left non-matching rows")

      // DELETE
      s.sql(s"DELETE FROM graft.`$root` WHERE id = 101")
      check(count("WHERE id = 101") == 0L, "DELETE removed the row")
      check(count() == 11L, "DELETE removed exactly one row")

      // MERGE: update / conditional delete / insert / NMBS delete
      (Seq((0L, "src", 1L), (5L, "src", 2L), (200L, "src", 3L)))
        .toDF("id", "grp", "x").createOrReplaceTempView("dml_src")
      s.sql(
        s"""MERGE INTO graft.`$root` AS t USING dml_src AS src
           |ON t.id = src.id
           |WHEN MATCHED AND src.x = 1 THEN UPDATE SET x = src.x * 10
           |WHEN MATCHED THEN DELETE
           |WHEN NOT MATCHED THEN INSERT (id, grp, x)
           |  VALUES (src.id, src.grp, src.x)
           |WHEN NOT MATCHED BY SOURCE AND t.id >= 9 AND t.id < 100
           |  THEN DELETE""".stripMargin)
      check(count("WHERE id = 0 AND x = 10") == 1L,
        "MERGE first matched clause wins (update, not delete)")
      check(count("WHERE id = 5") == 0L, "MERGE matched delete")
      check(count("WHERE id = 200 AND grp = 'src'") == 1L,
        "MERGE not-matched insert")
      check(count("WHERE id = 9") == 0L, "MERGE NMBS delete")
      check(count("WHERE id = 100") == 1L,
        "MERGE NMBS condition gates")

      // INSERT OVERWRITE replaces the head (history stays)
      val beforeOvw = VersionedTable.latestVersion(s, root).get
      s.sql(s"INSERT OVERWRITE graft.`$root` VALUES (1, 'only', 1)")
      check(count() == 1L, "INSERT OVERWRITE replaced content")
      check(s.sql(s"SELECT count(*) AS n FROM graft.`$root` " +
        s"VERSION AS OF $beforeOvw").head().getLong(0) > 1L,
        "history survives the overwrite")

      // CHECK constraint surfaces through SQL INSERT
      VersionedTable.addConstraint(s, root, "x_pos", "x >= 0")
      val threw =
        try { s.sql(s"INSERT INTO graft.`$root` VALUES (2, 'bad', -5)")
          false }
        catch { case e: Throwable =>
          e.getMessage != null &&
            e.getMessage.contains("CHECK constraint") ||
            Option(e.getCause).exists(c => c.getMessage != null &&
              c.getMessage.contains("CHECK constraint")) }
      check(threw, "constraint violation rejected through SQL")
      check(count("WHERE x < 0") == 0L, "violating row not committed")

      // maintenance grammar through the INJECTED PARSER (plain
      // spark.sql — the delegating-parser path only a fresh JVM with
      // the extension can prove)
      val hist = s.sql(s"DESCRIBE HISTORY graft.`$root`").collect()
      check(hist.length == VersionedTable.versions(s, root).size,
        "DESCRIBE HISTORY row per version via plain spark.sql")
      check(s.sql(s"DESCRIBE DETAIL graft.`$root`").head()
        .getAs[String]("key_col") == "id",
        "DESCRIBE DETAIL via plain spark.sql")
      val opt = s.sql(s"OPTIMIZE graft.`$root`").head()
      check(opt.getAs[Long]("num_files_after") <=
        opt.getAs[Long]("num_files_before"),
        "OPTIMIZE via plain spark.sql")
      val dry = s.sql(s"VACUUM graft.`$root` RETAIN 0 HOURS DRY RUN")
        .count()
      VersionedTable.setProperty(s, root, "vacuum.retentionCheck",
        "false") // sub-floor retention needs the explicit opt-out
      val vac = s.sql(s"VACUUM graft.`$root` RETAIN 0 HOURS").head()
      check(vac.getAs[Long]("data_files_deleted") >= dry,
        "VACUUM via plain spark.sql reclaims at least the dry-run list")
      check(count() == 1L, "table reads after maintenance")
      // ordinary SQL still parses through the delegate
      check(s.sql("SELECT 3 AS three").head().getInt(0) == 3,
        "delegating parser passes ordinary SQL through")

      // ---------------- round-13 surface, RESOLVED-path (plain
      // spark.sql through GraftDmlRule / the analyzer) ----------------
      val r13 = root + "_r13"
      // CREATE TABLE with inline CHECK + table.key; empty read; INSERT
      s.sql(s"CREATE TABLE graft.`$r13` (id BIGINT, grp STRING, " +
        "x BIGINT, CONSTRAINT x_pos CHECK (x >= 0)) " +
        "TBLPROPERTIES ('table.key'='id')")
      check(s.sql(s"SELECT * FROM graft.`$r13`").count() == 0L,
        "created table reads empty with schema")
      s.sql(s"INSERT INTO graft.`$r13` SELECT id, 'g' || " +
        s"cast(id % 2 AS string), id FROM range(20)")
      def c13(where: String = ""): Long =
        s.sql(s"SELECT count(*) AS n FROM graft.`$r13` $where")
          .head().getLong(0)
      check(c13() == 20L, "CREATE + INSERT INTO ... SELECT via spark.sql")
      val cThrew =
        try { s.sql(s"INSERT INTO graft.`$r13` VALUES (99, 'g', -1)")
          false }
        catch { case e: Throwable =>
          (e.getMessage + Option(e.getCause).map(_.getMessage)
            .getOrElse("")).contains("x_pos") }
      check(cThrew, "inline CREATE constraint enforced, named")
      // ALTER TABLE ADD/DROP CONSTRAINT through the injected parser
      s.sql(s"ALTER TABLE graft.`$r13` ADD CONSTRAINT x_cap " +
        "CHECK (x < 1000000)")
      check(VersionedTable.snapshot(s, r13,
        VersionedTable.latestVersion(s, r13).get)
        .constraints.keySet == Set("x_pos", "x_cap"),
        "ADD CONSTRAINT via plain spark.sql")
      s.sql(s"ALTER TABLE graft.`$r13` DROP CONSTRAINT x_cap")
      // IN-subquery DELETE (resolved InSubquery through GraftDmlRule)
      s.sql("SELECT id * 2 AS k FROM range(5)")
        .createOrReplaceTempView("r13_doomed")
      s.sql(s"DELETE FROM graft.`$r13` WHERE id IN " +
        "(SELECT k FROM r13_doomed) AND grp = 'g0'")
      check(c13() == 15L, "IN-subquery DELETE with residual (resolved)")
      check(c13("WHERE id IN (0, 2, 4, 6, 8)") == 0L,
        "IN-subquery DELETE removed the right keys")
      // compound-ON MERGE (resolved side attribution)
      s.sql("SELECT id AS id, id + 500 AS nx FROM range(3)")
        .createOrReplaceTempView("r13_src")
      s.sql(
        s"""MERGE INTO graft.`$r13` AS t USING r13_src AS sq
           |ON t.id = sq.id AND t.grp = 'g1'
           |WHEN MATCHED THEN UPDATE SET x = sq.nx
           |WHEN NOT MATCHED THEN INSERT (id, grp, x)
           |VALUES (sq.id + 700, 'ins', sq.nx)""".stripMargin)
      check(c13("WHERE id = 1 AND x = 501") == 1L,
        "compound-ON matched (residual holds) updated")
      check(c13("WHERE id = 700 AND grp = 'ins'") == 1L,
        "compound-ON residual-failed source row inserted")
      // MERGE WITH SCHEMA EVOLUTION (resolved path)
      s.sql("SELECT id * 3 + 1 AS id, id AS q FROM range(3)")
        .createOrReplaceTempView("r13_evo")
      s.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$r13` AS t
           |USING r13_evo AS sq ON t.id = sq.id
           |WHEN MATCHED THEN UPDATE SET q = sq.q""".stripMargin)
      check(s.sql(s"SELECT q FROM graft.`$r13` WHERE id = 7")
        .head().getLong(0) == 2L,
        "WITH SCHEMA EVOLUTION widened + filled (resolved)")
      check(c13("WHERE q IS NULL") > 0L,
        "evolution: untouched rows read NULL")
      // dml.mode=mor via SQL property, then MoR UPDATE
      s.sql(s"ALTER TABLE graft.`$r13` SET TBLPROPERTIES " +
        "('dml.mode'='mor')")
      s.sql(s"UPDATE graft.`$r13` SET x = x + 9000 WHERE id = 7")
      check(VersionedTable.snapshot(s, r13,
        VersionedTable.latestVersion(s, r13).get).op == "update-mor",
        "dml.mode=mor routes SQL UPDATE merge-on-read")
      check(c13("WHERE id = 7 AND x = 9007") == 1L,
        "MoR SQL UPDATE applied")
      // column DEFAULTs through the ANALYZER's own resolution
      // (SUPPORT_COLUMN_DEFAULT_VALUE + field metadata)
      val r13d = root + "_r13def"
      s.sql(s"CREATE TABLE graft.`$r13d` (id BIGINT, " +
        "x BIGINT DEFAULT 42) TBLPROPERTIES ('table.key'='id')")
      s.sql(s"INSERT INTO graft.`$r13d` (id) VALUES (1)")
      check(s.sql(s"SELECT x FROM graft.`$r13d` WHERE id = 1")
        .head().getLong(0) == 42L,
        "column DEFAULT filled by plain spark.sql INSERT")
      // INSERT ... REPLACE WHERE through the resolved rule
      s.sql(s"INSERT INTO graft.`$r13` REPLACE WHERE id >= 700 " +
        "VALUES (700, 'rw', 7, CAST(NULL AS BIGINT))")
      check(c13("WHERE id = 700 AND grp = 'rw'") == 1L,
        "REPLACE WHERE swapped the slice via plain spark.sql")
      check(c13("WHERE id = 702") == 0L,
        "REPLACE WHERE removed the rest of the slice")
      // CTAS through plain spark.sql
      val r13c = root + "_r13ctas"
      s.sql(s"CREATE TABLE graft.`$r13c` TBLPROPERTIES " +
        s"('table.key'='id') AS SELECT id, x FROM graft.`$r13` " +
        "WHERE x < 100")
      check(s.sql(s"SELECT count(*) AS n FROM graft.`$r13c`")
        .head().getLong(0) ==
        c13("WHERE x < 100"), "CTAS via plain spark.sql")
    } finally s.stop()
  }
}
