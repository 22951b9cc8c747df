package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** SQL-only table BIRTH: CREATE TABLE commits a v1 metadata-only
  * manifest (schema + table.key + CHECK constraints), CTAS creates
  * and fills through the V1-fallback write, `df.writeTo` appends and
  * overwrites through the same path, and constraint DDL (inline and
  * ALTER TABLE ADD/DROP CONSTRAINT) round-trips — closing the one
  * missing verb of the round-12 SQL lifecycle. */
class GraftCreateTableSpec extends SparkSpec {

  private def freshRoot(kind: String): String =
    Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_create_${kind}_" +
        s"${spark.sparkContext.applicationId}")

  private def sql(q: String) = graft.sources.v2.GraftSql.sql(spark, q)

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.v2.GraftCatalog")
  }

  test("CREATE TABLE births an empty readable table; INSERT fills it; " +
    "the whole lifecycle is SQL text") {
    val root = freshRoot("basic")
    sql(s"CREATE TABLE graft.`$root` (id BIGINT, txt STRING) " +
      "TBLPROPERTIES ('table.key'='id')")
    val v1 = VersionedTable.snapshot(spark, root, 1)
    assert(v1.op === "create" && v1.files.isEmpty)
    // empty table reads: zero rows WITH the declared schema
    val empty = sql(s"SELECT * FROM graft.`$root`")
    assert(empty.columns.toSeq === Seq("id", "txt"))
    assert(empty.count() === 0L)
    // library read path agrees
    assert(VersionedTable.read(spark, root).columns.toSeq ===
      Seq("id", "txt"))
    sql(s"INSERT INTO graft.`$root` VALUES (1, 'a'), (2, 'b')")
    assert(sql(s"SELECT count(*) AS n FROM graft.`$root`")
      .head().getLong(0) === 2L)
    // the created schema governs: SQL DML works without any connector
    // seed (UPDATE keys on the recorded table.key)
    sql(s"UPDATE graft.`$root` SET txt = 'z' WHERE id = 2")
    assert(sql(s"SELECT txt FROM graft.`$root` WHERE id = 2")
      .head().getString(0) === "z")
    // duplicate create refuses
    val dup = intercept[Exception] {
      sql(s"CREATE TABLE graft.`$root` (id BIGINT) " +
        "TBLPROPERTIES ('table.key'='id')")
    }
    assert(dup.getMessage.toLowerCase.contains("already exists") ||
      Option(dup.getCause).exists(
        _.getMessage.toLowerCase.contains("already")))
  }

  test("CREATE TABLE guard rails: table.key required, key must be " +
    "BIGINT and a declared column, PARTITIONED BY refused") {
    val root = freshRoot("guards")
    val noKey = intercept[Exception] {
      sql(s"CREATE TABLE graft.`${root}_nk` (id BIGINT)")
    }
    assert(noKey.getMessage.contains("table.key") ||
      Option(noKey.getCause).exists(_.getMessage.contains("table.key")))
    val badType = intercept[Exception] {
      sql(s"CREATE TABLE graft.`${root}_bt` (id INT, t STRING) " +
        "TBLPROPERTIES ('table.key'='id')")
    }
    assert(badType.getMessage.contains("BIGINT") ||
      Option(badType.getCause).exists(_.getMessage.contains("BIGINT")))
    val badCol = intercept[Exception] {
      sql(s"CREATE TABLE graft.`${root}_bc` (id BIGINT) " +
        "TBLPROPERTIES ('table.key'='nope')")
    }
    assert(badCol.getMessage.contains("not a column") ||
      Option(badCol.getCause).exists(
        _.getMessage.contains("not a column")))
    val part = intercept[Exception] {
      sql(s"CREATE TABLE graft.`${root}_pt` (id BIGINT, g STRING) " +
        "PARTITIONED BY (g) TBLPROPERTIES ('table.key'='id')")
    }
    assert(part.getMessage.contains("PARTITIONED") ||
      Option(part.getCause).exists(
        _.getMessage.contains("PARTITIONED")))
  }

  test("CTAS: CREATE TABLE ... AS SELECT creates and fills in one " +
    "statement through the V1-fallback write") {
    val root = freshRoot("ctas")
    import spark.implicits._
    (0 until 20).map(i => (i.toLong, s"t$i")).toDF("id", "txt")
      .createOrReplaceTempView("ctas_src")
    sql(s"CREATE TABLE graft.`$root` TBLPROPERTIES ('table.key'='id') " +
      "AS SELECT id, txt FROM ctas_src")
    assert(sql(s"SELECT count(*) AS n FROM graft.`$root`")
      .head().getLong(0) === 20L)
    // the write went through the library path: stats recorded
    val head = VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    assert(head.files.nonEmpty && head.files.forall(_.rows > 0))
    assert(head.props.get(VersionedTable.TableKeyProp) === Some("id"))
    // and DML works immediately
    sql(s"DELETE FROM graft.`$root` WHERE id >= 10")
    assert(sql(s"SELECT count(*) AS n FROM graft.`$root`")
      .head().getLong(0) === 10L)
  }

  test("df.writeTo(graft.`/t`).append()/overwritePartitions route " +
    "through the library append/overwrite (manifest commit, stats)") {
    val root = freshRoot("writeto")
    import spark.implicits._
    sql(s"CREATE TABLE graft.`$root` (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('table.key'='id')")
    (0 until 10).map(i => (i.toLong, i.toLong)).toDF("id", "v")
      .writeTo(s"graft.`$root`").append()
    assert(VersionedTable.read(spark, root).count() === 10L)
    assert(VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get).op === "append")
    // truncate-overwrite replaces content, history stays
    (100 until 105).map(i => (i.toLong, i.toLong)).toDF("id", "v")
      .writeTo(s"graft.`$root`").overwrite(lit(true))
    assert(VersionedTable.read(spark, root).count() === 5L)
    assert(VersionedTable.read(spark, root, Some(2)).count() === 10L)
  }

  test("constraints: inline CHECK at CREATE, ALTER TABLE ADD/DROP " +
    "CONSTRAINT — all enforced on SQL writes by name") {
    val root = freshRoot("constr")
    sql(s"CREATE TABLE graft.`$root` " +
      "(id BIGINT, x BIGINT, CONSTRAINT x_pos CHECK (x >= 0)) " +
      "TBLPROPERTIES ('table.key'='id')")
    assert(VersionedTable.snapshot(spark, root, 1)
      .constraints === Map("x_pos" -> "x >= 0"))
    val bad = intercept[Exception] {
      sql(s"INSERT INTO graft.`$root` VALUES (1, -5)")
    }
    assert((bad.getMessage + Option(bad.getCause)
      .map(_.getMessage).getOrElse("")).contains("x_pos"))
    sql(s"INSERT INTO graft.`$root` VALUES (1, 5)")
    // ADD CONSTRAINT via ALTER TABLE SQL: validates existing rows
    sql(s"ALTER TABLE graft.`$root` ADD CONSTRAINT x_cap CHECK (x < 100)")
    val head = VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    assert(head.constraints.keySet === Set("x_pos", "x_cap"))
    val bad2 = intercept[Exception] {
      sql(s"INSERT INTO graft.`$root` VALUES (2, 500)")
    }
    assert((bad2.getMessage + Option(bad2.getCause)
      .map(_.getMessage).getOrElse("")).contains("x_cap"))
    // an ADD CONSTRAINT violated by EXISTING rows refuses
    val bad3 = intercept[Exception] {
      sql(s"ALTER TABLE graft.`$root` ADD CONSTRAINT x_tiny " +
        "CHECK (x < 3)")
    }
    assert((bad3.getMessage + Option(bad3.getCause)
      .map(_.getMessage).getOrElse("")).nonEmpty)
    // DROP CONSTRAINT releases it
    sql(s"ALTER TABLE graft.`$root` DROP CONSTRAINT x_cap")
    sql(s"INSERT INTO graft.`$root` VALUES (3, 500)")
    // two rows made it in: (1,5) and the post-drop (3,500)
    assert(sql(s"SELECT count(*) AS n FROM graft.`$root`")
      .head().getLong(0) === 2L)
    val noSuch = intercept[Exception] {
      sql(s"ALTER TABLE graft.`$root` DROP CONSTRAINT ghost")
    }
    assert((noSuch.getMessage + Option(noSuch.getCause)
      .map(_.getMessage).getOrElse("")).contains("ghost"))
  }

  test("TRUNCATE TABLE: one empty-file-list commit, no scan; history " +
    "stays; the table accepts new inserts") {
    val root = freshRoot("trunc")
    sql(s"CREATE TABLE graft.`$root` (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('table.key'='id')")
    sql(s"INSERT INTO graft.`$root` SELECT id, id FROM range(50)")
    sql(s"TRUNCATE TABLE graft.`$root`")
    val head = VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    assert(head.op === "truncate" && head.files.isEmpty)
    assert(sql(s"SELECT count(*) AS n FROM graft.`$root`")
      .head().getLong(0) === 0L)
    // schema survives; history time-travels; inserts work again
    assert(sql(s"SELECT * FROM graft.`$root`").columns.toSeq ===
      Seq("id", "v"))
    assert(sql(s"SELECT count(*) AS n FROM graft.`$root` " +
      "VERSION AS OF 2").head().getLong(0) === 50L)
    sql(s"INSERT INTO graft.`$root` VALUES (1, 1)")
    assert(sql(s"SELECT count(*) AS n FROM graft.`$root`")
      .head().getLong(0) === 1L)
  }

  test("column DEFAULT values: CREATE TABLE declares them, INSERT " +
    "column lists fill them instead of NULL, explicit values win") {
    val root = freshRoot("defaults")
    sql(s"CREATE TABLE graft.`$root` (id BIGINT, x BIGINT DEFAULT 7, " +
      "tag STRING DEFAULT 'unset') TBLPROPERTIES ('table.key'='id')")
    // the defaults ride the recorded schema's field metadata
    val rec = VersionedTable.read(spark, root).schema
    assert(rec("x").metadata.contains("CURRENT_DEFAULT"))
    sql(s"INSERT INTO graft.`$root` (id) VALUES (1)")
    sql(s"INSERT INTO graft.`$root` (id, x) VALUES (2, 99)")
    sql(s"INSERT INTO graft.`$root` VALUES (3, 0, 'explicit')")
    val got = sql(s"SELECT id, x, tag FROM graft.`$root` ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got(0) === ((1L, 7L, "unset")))   // both defaulted
    assert(got(1) === ((2L, 99L, "unset")))  // one explicit, one default
    assert(got(2) === ((3L, 0L, "explicit")))
  }

  test("SHOW CREATE TABLE reproduces the declared surface: columns " +
    "with DEFAULTs, table.key and constraints visible") {
    val root = freshRoot("showcreate")
    sql(s"CREATE TABLE graft.`$root` (id BIGINT, " +
      "x BIGINT DEFAULT 7, CONSTRAINT x_pos CHECK (x >= 0)) " +
      "TBLPROPERTIES ('table.key'='id')")
    val ddl = spark.sql(s"SHOW CREATE TABLE graft.`$root`")
      .head().getString(0)
    assert(ddl.contains("id BIGINT"))
    assert(ddl.contains("x BIGINT DEFAULT 7"))
    assert(ddl.contains("'table.key' = 'id'"))
    assert(ddl.contains("'constraint.x_pos' = 'x >= 0'"))
    // engine-managed entries (table.schema, format.version) appear in
    // the verbatim dump — re-executing the statement requires
    // stripping them (createTable refuses engine-managed properties)
    assert(ddl.contains("table.schema"))
  }

  test("ALTER TABLE ADD COLUMN: DEFAULT rejects loudly (existing rows " +
    "would silently read NULL, not the default — Delta's refusal); " +
    "the two-step ADD + SET DEFAULT works; COMMENT records; " +
    "FIRST/AFTER positions reject") {
    val root = freshRoot("addcoldef")
    sql(s"CREATE TABLE graft.`$root` (id BIGINT) " +
      "TBLPROPERTIES ('table.key'='id')")
    sql(s"INSERT INTO graft.`$root` VALUES (1)")
    // ADD COLUMN ... DEFAULT: a silent existing-rows-read-NULL
    // divergence from SQL's existence-default contract — refuse, and
    // point at the supported two-step spelling
    val eDef = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$root` ADD COLUMN x BIGINT DEFAULT 7")
    }
    assert(eDef.getMessage.contains("SET DEFAULT"))
    assert(!VersionedTable.read(spark, root).columns.contains("x"))
    // the two-step has well-defined semantics: existing rows NULL,
    // future inserts fill the default
    spark.sql(s"ALTER TABLE graft.`$root` " +
      "ADD COLUMN x BIGINT COMMENT 'a score'")
    spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN x SET DEFAULT 7")
    val rec = VersionedTable.read(spark, root).schema
    assert(rec("x").metadata.getString("CURRENT_DEFAULT") === "7")
    assert(rec("x").metadata.getString("comment") === "a score")
    sql(s"INSERT INTO graft.`$root` (id) VALUES (2)")
    val got = sql(s"SELECT id, x FROM graft.`$root` ORDER BY id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(got.toSeq === Seq((1L, -1L), (2L, 7L)))
    // FIRST/AFTER would silently append at the end of the recorded
    // schema — diverging from the statement; reject instead
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$root` ADD COLUMN y BIGINT AFTER id")
    }
    assert(e.getMessage.contains("FIRST/AFTER"))
    assert(!VersionedTable.read(spark, root).columns.contains("y"))
  }

  test("ALTER COLUMN SET/DROP DEFAULT: metadata-only; future INSERTs " +
    "observe, existing rows untouched") {
    val root = freshRoot("altdef")
    sql(s"CREATE TABLE graft.`$root` (id BIGINT, x BIGINT) " +
      "TBLPROPERTIES ('table.key'='id')")
    sql(s"INSERT INTO graft.`$root` (id) VALUES (1)") // no default: NULL
    spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN x SET DEFAULT 7")
    sql(s"INSERT INTO graft.`$root` (id) VALUES (2)") // default now 7
    spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN x DROP DEFAULT")
    sql(s"INSERT INTO graft.`$root` (id) VALUES (3)") // back to NULL
    val got = sql(s"SELECT id, x FROM graft.`$root` ORDER BY id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(got.toSeq === Seq((1L, -1L), (2L, 7L), (3L, -1L)))
    // the default flips were metadata-only commits
    val ops = (1 to VersionedTable.latestVersion(spark, root).get)
      .map(v => VersionedTable.snapshot(spark, root, v).op)
    assert(ops.count(_ == "set-default") === 2)
  }

  test("TRUNCATE through the change feed: the commit reads as pure " +
    "deletes of every live row; programmatic df.mergeInto over a " +
    "graft identifier is unsupported without extensions but the SQL " +
    "path covers the same statement") {
    import spark.implicits._
    val root = freshRoot("trunccdc")
    sql(s"CREATE TABLE graft.`$root` (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('table.key'='id')")
    sql(s"INSERT INTO graft.`$root` SELECT id, id FROM range(10)")
    sql(s"TRUNCATE TABLE graft.`$root`")
    val v = VersionedTable.latestVersion(spark, root).get
    val feed = VersionedTable.changeFeed(spark, root, v - 1, v,
      Some("id"))
    val types = feed.groupBy(col("_change_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types === Map("delete" -> 10L))
  }
}
