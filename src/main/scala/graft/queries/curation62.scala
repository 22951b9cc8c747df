package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.{QueryDef, Scratch, Tables}
import graft.sources.VersionedTable

/** Batch 62: the versioned-table (time-travel) surface — snapshot
  * isolation, MERGE INTO, DELETE, snapshot diff, manifest-pruned
  * scans and VACUUM over [[graft.sources.VersionedTable]], the
  * engine's minimal Delta/Iceberg-shaped format (immutable parquet
  * files + per-version manifests + CAS commits).
  *
  * Every query reads a four-version table built ONCE per
  * (session, dataset) from `documents` (Scratch.buildOnce):
  *
  *   v1 load    = all documents (range-partitioned by doc_id)
  *   v2 append  = a re-crawl of doc_id % 10 == 0, ids offset +1e6
  *   v3 merge   = upsert: every current row with doc_id % 7 == 0 gets
  *                'rev2 ' prefixed (n_chars + 5); doc_id % 13 == 0 of
  *                the base inserts fresh with ids offset +2e6
  *   v4 delete  = all lang = 'zh' rows removed
  *
  * The oracle mirrors this construction as pure CTE algebra over
  * `documents`, so every readout — per-version row counts, a
  * time-travel read against a superseded snapshot, the v3→v4 diff,
  * a key-range scan pruned by the manifest's per-file min/max, and
  * the post-VACUUM surviving versions — hash-checks against DuckDB.
  *
  * Scale: commits are O(changed files) + one manifest write; reads
  * resolve one manifest and scan exactly its file list; the diff
  * scans only files NOT shared by the two manifests (carried files
  * cancel by reference); vacuum touches only unreferenced files.
  * Nothing is ever quadratic in table size, and no driver state
  * exceeds the manifest entry list.
  */
object Curation62Queries {

  /** The shared DuckDB CTE chain reconstructing v2/v3/v4 logically.
    * private[queries]: batch 63's lifecycle queries reconstruct the
    * same states — ONE definition so the two batches cannot drift. */
  private[queries] val stateSql =
    """v2 AS (
      |  SELECT doc_id, text, lang, source, n_chars FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text, lang, source, n_chars
      |  FROM documents WHERE doc_id % 10 = 0),
      |upd AS (SELECT doc_id, 'rev2 ' || text AS text, lang, source,
      |          n_chars + 5 AS n_chars
      |        FROM v2 WHERE doc_id % 7 = 0),
      |ins AS (SELECT doc_id + 2000000 AS doc_id, text, lang, source,
      |          n_chars
      |        FROM documents WHERE doc_id % 13 = 0),
      |v3 AS (
      |  SELECT * FROM v2 WHERE doc_id % 7 <> 0
      |  UNION ALL SELECT * FROM upd
      |  UNION ALL SELECT * FROM ins),
      |v4 AS (SELECT * FROM v3 WHERE lang <> 'zh')""".stripMargin

  /** The four-version build (load / re-crawl append / copy-on-write
    * merge / delete) — the ONE definition batch 63 reuses too, so the
    * shared `vtab` memo key can never bind two drifting builds. */
  private[queries] def buildFour(s: SparkSession, d: String,
      root: String): Unit = {
    val docs = Tables.documents(s, d)
    VersionedTable.append(s, root, docs, "doc_id", 4, op = "load")
    val recrawl = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    VersionedTable.append(s, root, recrawl, "doc_id", 2)
    val cur = VersionedTable.read(s, root)
    val updates = cur.filter(pmod(col("doc_id"), lit(7)) === 0)
      .withColumn("text", concat(lit("rev2 "), col("text")))
      .withColumn("n_chars", col("n_chars") + 5L)
    val inserts = docs.filter(pmod(col("doc_id"), lit(13)) === 0)
      .withColumn("doc_id", col("doc_id") + 2000000L)
    VersionedTable.merge(s, root, updates.unionByName(inserts),
      "doc_id", 4)
    VersionedTable.delete(s, root, col("lang") === "zh", "doc_id", 4)
    ()
  }

  /** Build the four-version table once per (session, dataset); all
    * queries below read it.  `kind` varies for the vacuum query, which
    * needs its own instance to destroy history on. */
  private[queries] def table(s: SparkSession, d: String,
      kind: String = "vtab"): String =
    Scratch.buildOnce(s, d, kind)(root => buildFour(s, d, root))

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------ per-version history
    QueryDef(
      "table_version_history",
      (s, d) => {
        val root = table(s, d)
        import s.implicits._
        VersionedTable.versions(s, root).map { v =>
          val sn = VersionedTable.snapshot(s, root, v)
          (sn.version.toLong, sn.op, sn.rows)
        }.toDF("version", "op", "n_rows")
      },
      Some(s"""WITH $stateSql
        |SELECT 1::BIGINT AS version, 'load' AS op,
        |       (SELECT count(*) FROM documents)::BIGINT AS n_rows
        |UNION ALL SELECT 2, 'append', (SELECT count(*) FROM v2)::BIGINT
        |UNION ALL SELECT 3, 'merge', (SELECT count(*) FROM v3)::BIGINT
        |UNION ALL SELECT 4, 'delete', (SELECT count(*) FROM v4)::BIGINT
        |ORDER BY version""".stripMargin),
      "The commit log readout: every version's operation and row count " +
        "straight from the manifests (no data files are opened — row " +
        "counts are manifest metadata, the same reason DESCRIBE " +
        "HISTORY is free on a lake format).  The oracle rebuilds all " +
        "four logical states as CTE algebra over documents and must " +
        "agree exactly — load, append, copy-on-write MERGE upsert and " +
        "DELETE all conserve the right multiset."),

    // ------------------------------------------ time travel
    QueryDef(
      "time_travel_read",
      (s, d) => {
        val root = table(s, d)
        VersionedTable.read(s, root, Some(2))
          .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH $stateSql
        |SELECT lang, count(*)::BIGINT AS n_docs
        |FROM v2 GROUP BY lang ORDER BY lang""".stripMargin),
      "Read AS OF version 2 while the table head is version 4: the v2 " +
        "manifest still names its immutable files, so the superseded " +
        "snapshot reads byte-identically after two further commits " +
        "(one of which REWROTE files v2 references — copy-on-write " +
        "never mutates, so the old manifest is untouched).  This is " +
        "the reproducibility primitive for training runs: pin the " +
        "version, get the exact corpus forever (until vacuum)."),

    // ------------------------------------------ snapshot diff
    QueryDef(
      "snapshot_diff_counts",
      (s, d) => {
        val root = table(s, d)
        val (added, removed) = VersionedTable.diff(s, root, 3, 4)
        val a = added.groupBy(col("lang")).agg(count(lit(1)).as("n_added"))
        val r = removed.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_removed"))
        a.join(r, Seq("lang"), "full_outer")
          .select(col("lang"),
            coalesce(col("n_added"), lit(0L)).as("n_added"),
            coalesce(col("n_removed"), lit(0L)).as("n_removed"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH $stateSql
        |SELECT lang, 0::BIGINT AS n_added, count(*)::BIGINT AS n_removed
        |FROM v3 WHERE lang = 'zh' GROUP BY lang ORDER BY lang""".stripMargin),
      "What changed between v3 and v4, per language: the diff reads " +
        "ONLY files the two manifests do not share (carried files " +
        "cancel by reference — multiset algebra, no scan), then " +
        "exceptAll in both directions.  The delete removed exactly the " +
        "zh rows and added nothing, and the oracle agrees from pure " +
        "CTE reconstruction.  At 100 TB this is the incremental-" +
        "refresh primitive: downstream jobs re-process the diff, not " +
        "the table."),

    // ------------------------------------------ manifest-pruned scan
    QueryDef(
      "version_pruned_scan",
      (s, d) => {
        val root = table(s, d)
        VersionedTable.read(s, root, idRange = Some((0L, 249L)))
          .filter(col("doc_id").between(0L, 249L))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("n_chars")).as("sum_n_chars"))
      },
      Some(s"""WITH $stateSql
        |SELECT count(*)::BIGINT AS n_rows,
        |       sum(n_chars)::BIGINT AS sum_n_chars
        |FROM v4 WHERE doc_id BETWEEN 0 AND 249""".stripMargin),
      "A key-range scan of the table head that prunes whole files " +
        "through the manifest's per-file (minId, maxId) BEFORE Spark " +
        "plans the read — the data files are range-partitioned by " +
        "doc_id at write time, so a 250-id probe plans a strict subset " +
        "of the files (pinned by spec) and the row-level filter stays " +
        "as the exact second line of defense, the GenomeZoneMap " +
        "discipline at table-format level.  Same answer as scanning " +
        "everything, fewer files opened."),

    // ------------------------------------------ vacuum
    QueryDef(
      "vacuum_reclaim",
      (s, d) => {
        val root = Scratch.buildOnce(s, d, "vtabvac") { r =>
          buildFour(s, d, r)
          // retainMs = 0: single-process build, no in-flight committers
          VersionedTable.vacuum(s, r, keepFrom = 3, retainMs = 0L)
          ()
        }
        import s.implicits._
        val vs = VersionedTable.versions(s, root)
        Seq((vs.min.toLong, vs.max.toLong, vs.size.toLong,
          VersionedTable.read(s, root).count()))
          .toDF("oldest_version", "newest_version", "n_versions",
            "n_rows_latest")
      },
      Some(s"""WITH $stateSql
        |SELECT 3::BIGINT AS oldest_version, 4::BIGINT AS newest_version,
        |       2::BIGINT AS n_versions,
        |       (SELECT count(*) FROM v4)::BIGINT AS n_rows_latest""".stripMargin),
      "VACUUM keeping versions >= 3 on a second table instance: the " +
        "v1/v2 manifests and every data file referenced ONLY by them " +
        "are gone (the spec pins the physical deletion), versions 3 " +
        "and 4 survive, and the table head still reads the exact " +
        "post-delete state — reclamation can never break a kept " +
        "snapshot because the doomed set is computed from the kept " +
        "manifests' union, not from file age."),
  )
}
