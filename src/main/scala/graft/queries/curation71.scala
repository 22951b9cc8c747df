package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{QueryDef, Scratch, Tables}
import graft.sources.VersionedTable
import graft.sources.v2.GraftSql

/** Batch 71: the round-13 SQL-surface closers — CREATE TABLE / CTAS
  * (a table born, filled and read ENTIRELY by SQL text; round 12's
  * one missing verb), and constraint DDL as SQL (`ALTER TABLE ... ADD
  * /DROP CONSTRAINT` mapping onto the library constraint commits).
  *
  * Scale notes: CREATE TABLE is a pure-metadata v1 commit (zero data
  * files, O(1) driver work); CTAS writes ride the same library append
  * as every other write (distributed stats pass, manifest commit);
  * constraint DDL validates existing rows in ONE distributed
  * aggregation, never collecting data rows. */
object Curation71Queries {

  /** SQL-only lifecycle table: CREATE TABLE (schema + key + CHECK
    * constraint declared in SQL), INSERT INTO ... SELECT, and one
    * ALTER TABLE ADD CONSTRAINT — no connector seed anywhere. */
  private def createdTable(s: SparkSession, d: String): String =
    Scratch.buildOnce(s, d, "sqlcreate") { root =>
      s.conf.set("spark.sql.catalog.graft",
        "graft.sources.v2.GraftCatalog")
      Tables.documents(s, d)
        .createOrReplaceTempView("graft_create_docs")
      GraftSql.sql(s,
        s"""CREATE TABLE graft.`$root` (
           |  doc_id BIGINT, text STRING, lang STRING, source STRING,
           |  n_chars BIGINT,
           |  CONSTRAINT n_chars_nonneg CHECK (n_chars >= 0))
           |TBLPROPERTIES ('table.key'='doc_id')""".stripMargin)
      GraftSql.sql(s,
        s"""INSERT INTO graft.`$root`
           |SELECT doc_id, text, lang, source, n_chars
           |FROM graft_create_docs WHERE doc_id % 2 = 0""".stripMargin)
      GraftSql.sql(s,
        s"""INSERT INTO graft.`$root`
           |SELECT doc_id, text, lang, source, n_chars
           |FROM graft_create_docs WHERE doc_id % 2 = 1""".stripMargin)
      GraftSql.sql(s, s"ALTER TABLE graft.`$root` ADD CONSTRAINT " +
        "lang_known CHECK (lang IS NOT NULL)")
      ()
    }

  /** CTAS table: created AND filled by one statement. */
  private def ctasTable(s: SparkSession, d: String): String =
    Scratch.buildOnce(s, d, "sqlctas") { root =>
      s.conf.set("spark.sql.catalog.graft",
        "graft.sources.v2.GraftCatalog")
      Tables.documents(s, d)
        .createOrReplaceTempView("graft_ctas_docs")
      GraftSql.sql(s,
        s"""CREATE TABLE graft.`$root`
           |TBLPROPERTIES ('table.key'='doc_id')
           |AS SELECT doc_id, lang, n_chars FROM graft_ctas_docs
           |WHERE n_chars >= 200""".stripMargin)
      ()
    }

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "sql_create_insert_read",
      (s, d) => {
        val root = createdTable(s, d)
        GraftSql.sql(s,
          s"""SELECT lang, count(*) AS n_docs,
             |       sum(n_chars) AS sum_n_chars
             |FROM graft.`$root` GROUP BY lang ORDER BY lang""".stripMargin)
      },
      Some("""SELECT lang, count(*)::BIGINT AS n_docs,
        |       sum(n_chars)::BIGINT AS sum_n_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
      "A table BORN by SQL: `CREATE TABLE graft.`/t`` commits a v1 " +
        "metadata-only manifest (declared schema, table.key, an " +
        "inline CHECK constraint), two `INSERT INTO ... SELECT` " +
        "statements fill it (positional alignment, constraint " +
        "enforcement, stats/bloom recording through the library " +
        "append), and the readout is SQL over the catalog — no " +
        "connector seed anywhere, closing round 12's one missing " +
        "lifecycle verb.  The oracle is the same aggregate over the " +
        "source table: both halves of the modulo split must arrive " +
        "intact.  CREATE is O(1) driver work at any scale; the " +
        "inserts are ordinary distributed appends."),

    QueryDef(
      "sql_create_empty_schema",
      (s, d) => {
        val root = createdTable(s, d)
        // time-travel to v1: the CREATE commit itself — zero rows,
        // full declared schema (the recorded table.schema is the read
        // schema even with no file to template from)
        GraftSql.sql(s,
          s"""SELECT count(*) AS n_rows,
             |       count(DISTINCT lang) AS n_langs
             |FROM graft.`$root` VERSION AS OF 1""".stripMargin)
      },
      Some("SELECT 0::BIGINT AS n_rows, 0::BIGINT AS n_langs"),
      "Time travel to the CREATE commit itself: version 1 is the " +
        "EMPTY table — zero rows but the full declared schema (the " +
        "recorded table.schema serves reads when no data file " +
        "exists to template from).  Pins that a created-but-unfilled " +
        "table is a first-class snapshot, not an error."),

    QueryDef(
      "sql_ctas_read",
      (s, d) => {
        val root = ctasTable(s, d)
        GraftSql.sql(s,
          s"""SELECT lang, count(*) AS n_docs,
             |       sum(n_chars) AS sum_n_chars,
             |       min(doc_id) AS min_doc
             |FROM graft.`$root` GROUP BY lang ORDER BY lang""".stripMargin)
      },
      Some("""SELECT lang, count(*)::BIGINT AS n_docs,
        |       sum(n_chars)::BIGINT AS sum_n_chars,
        |       min(doc_id)::BIGINT AS min_doc
        |FROM documents WHERE n_chars >= 200
        |GROUP BY lang ORDER BY lang""".stripMargin),
      "CTAS: `CREATE TABLE ... AS SELECT` creates the manifest AND " +
        "fills it in one statement — Spark's CreateTableAsSelect " +
        "exec calls the catalog's createTable then writes through " +
        "the V1-fallback write (Delta's WriteIntoDeltaBuilder " +
        "construction), which delegates to the SAME library append " +
        "every path uses: stats, blooms, constraints, manifest " +
        "commit.  The filtered projection proves the query half " +
        "executes distributed before the write."),

    QueryDef(
      "sql_constraint_ddl_props",
      (s, d) => {
        val root = createdTable(s, d)
        // SHOW TBLPROPERTIES serves the head manifest's properties;
        // constraint entries carry the DDL-declared predicates
        GraftSql.sql(s, s"SHOW TBLPROPERTIES graft.`$root`")
          .filter(col("key").startsWith("constraint."))
          .select(col("key"), col("value"))
          .orderBy(col("key"))
      },
      Some("""SELECT 'constraint.lang_known' AS key,
        |       'lang IS NOT NULL' AS value
        |UNION ALL
        |SELECT 'constraint.n_chars_nonneg', 'n_chars >= 0'
        |ORDER BY key""".stripMargin),
      "Constraint DDL round-trip as SQL: the CREATE-inline CHECK " +
        "(`CONSTRAINT n_chars_nonneg CHECK (n_chars >= 0)`) and the " +
        "post-hoc `ALTER TABLE ... ADD CONSTRAINT lang_known` both " +
        "land as `constraint.<name>` manifest properties — the same " +
        "encoding Delta uses — and SHOW TBLPROPERTIES reads them " +
        "back.  Every SQL INSERT into this table validated against " +
        "them (a violating row fails naming the constraint; " +
        "GraftCreateTableSpec pins that).  ADD CONSTRAINT validates " +
        "existing rows in one distributed aggregation first."))
}
