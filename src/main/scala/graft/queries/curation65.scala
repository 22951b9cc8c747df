package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.{QueryDef, Scratch, Tables}
import graft.sources.VersionedTable

/** Batch 65: MERGE-ON-READ deletes (deletion vectors) on the
  * versioned table — the write-amplification complement to batch 62's
  * copy-on-write DELETE.  `deleteMoR` commits a KB-scale sidecar
  * masking (file, key) pairs instead of rewriting every touched file;
  * readers apply the mask as one anti-join; `purgeDeletes` is the
  * maintenance op that materializes heavily-masked files back to
  * plain ones.  This is the Delta-deletion-vector / Iceberg-delete-
  * file mechanism: at 100 TB, deleting 0.1% of rows must cost
  * O(deleted rows), not O(touched data files rewritten).
  *
  * Every query reads a five-version table built ONCE per
  * (session, dataset) from `documents`:
  *
  *   v1 load        = all documents (range-partitioned by doc_id)
  *   v2 delete-mor  = doc_id % 9 == 0 masked (zero files rewritten)
  *   v3 delete-mor  = lang = 'fr' masked (DVs FOLD: touched files'
  *                    new sidecar carries both commits' rows)
  *   v4 merge       = doc_id % 18 == 0 re-inserted with 'back '
  *                    prefix (every key is DEAD, so all insert — and
  *                    the per-file mask must NOT erase the new copies)
  *   v5 purge       = all DVs materialized; head is plain files
  *
  * The oracle mirrors the five logical states as CTE algebra over
  * `documents`, so DuckDB hash-checks zero-rewrite reads, DV folding,
  * the re-insert law, purge equivalence and the manifest-metadata
  * live row counts end to end.
  */
object Curation65Queries {

  private[queries] val morStateSql =
    """m2 AS (SELECT * FROM documents WHERE doc_id % 9 <> 0),
      |m3 AS (SELECT * FROM m2 WHERE lang <> 'fr'),
      |back AS (SELECT doc_id, 'back ' || text AS text, lang, source,
      |           n_chars + 3 AS n_chars
      |         FROM documents WHERE doc_id % 18 = 0),
      |m4 AS (SELECT * FROM m3 UNION ALL SELECT * FROM back)"""
      .stripMargin

  private[queries] def buildMor(s: SparkSession, d: String,
      root: String): Unit = {
    val docs = Tables.documents(s, d)
    VersionedTable.append(s, root, docs, "doc_id", 4, op = "load")
    VersionedTable.deleteMoR(s, root,
      pmod(col("doc_id"), lit(9)) === 0, "doc_id")
    VersionedTable.deleteMoR(s, root, col("lang") === "fr", "doc_id")
    val back = docs.filter(pmod(col("doc_id"), lit(18)) === 0)
      .withColumn("text", concat(lit("back "), col("text")))
      .withColumn("n_chars", col("n_chars") + 3L)
    VersionedTable.merge(s, root, back, "doc_id", 2)
    VersionedTable.purgeDeletes(s, root, "doc_id", 4)
    ()
  }

  private def table(s: SparkSession, d: String): String =
    Scratch.buildOnce(s, d, "vtabmor")(root => buildMor(s, d, root))

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------- zero-rewrite delete, DV folding
    QueryDef(
      "mor_delete_zero_rewrite_read",
      (s, d) => {
        val root = table(s, d)
        val v1 = VersionedTable.snapshot(s, root, 1)
        val v3 = VersionedTable.snapshot(s, root, 3)
        // the merge-on-read invariant, pinned in-band: TWO delete
        // commits later, the data file list is IDENTICAL to v1's
        val rewritten = v3.files.map(_.path).toSet
          .diff(v1.files.map(_.path).toSet).size.toLong
        VersionedTable.read(s, root, Some(3))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_n_chars"))
          .select(col("lang"), col("n_docs"), col("sum_n_chars"),
            lit(rewritten).as("n_files_rewritten"),
            lit(v3.op).as("op"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH $morStateSql
        |SELECT lang, count(*)::BIGINT AS n_docs,
        |       sum(n_chars)::BIGINT AS sum_n_chars,
        |       0::BIGINT AS n_files_rewritten, 'delete-mor' AS op
        |FROM m3 GROUP BY lang ORDER BY lang""".stripMargin),
      "Two merge-on-read DELETEs (doc_id % 9, then lang = 'fr') read " +
        "back through their deletion vectors: the per-lang readout " +
        "hash-matches the logical double-delete, and the in-band pin " +
        "proves ZERO data files were rewritten across both commits — " +
        "each was a KB-scale sidecar plus a manifest.  The second " +
        "delete folds the first's sidecar rows for the files it " +
        "touches, so every DV ref stays self-contained.  At 100 TB " +
        "this is the difference between O(deleted rows) and " +
        "O(touched files rewritten) — the reason Delta deletion " +
        "vectors and Iceberg delete files exist."),

    // ------------------------------------------ the re-insert law
    QueryDef(
      "mor_reinsert_once_read",
      (s, d) => {
        val root = table(s, d)
        VersionedTable.read(s, root, Some(4))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_n_chars"),
            count(when(col("text").startsWith("back "), 1))
              .as("n_reinserted"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH $morStateSql
        |SELECT lang, count(*)::BIGINT AS n_docs,
        |       sum(n_chars)::BIGINT AS sum_n_chars,
        |       count(*) FILTER (WHERE text LIKE 'back %')::BIGINT
        |         AS n_reinserted
        |FROM m4 GROUP BY lang ORDER BY lang""".stripMargin),
      "Keys deleted by a deletion vector and then RE-INSERTED by a " +
        "merge read back exactly once, with the new content: the mask " +
        "is per (file, key) — the old file still physically holds the " +
        "dead row, masked; the new row lives in a fresh file the mask " +
        "does not name.  A naive global key anti-join would erase the " +
        "re-inserts too; the hash check (every lang's count and the " +
        "reinserted-row tally) catches exactly that corruption."),

    // ------------------------------------------ purge equivalence
    QueryDef(
      "mor_purge_equivalence",
      (s, d) => {
        val root = table(s, d)
        val head = VersionedTable.latestVersion(s, root).get
        val sn = VersionedTable.snapshot(s, root, head)
        val masked = sn.files.count(_.dv.isDefined).toLong
        VersionedTable.read(s, root)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_n_chars"))
          .select(col("lang"), col("n_docs"), col("sum_n_chars"),
            lit(masked).as("n_masked_files"), lit(sn.op).as("op"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH $morStateSql
        |SELECT lang, count(*)::BIGINT AS n_docs,
        |       sum(n_chars)::BIGINT AS sum_n_chars,
        |       0::BIGINT AS n_masked_files, 'purge' AS op
        |FROM m4 GROUP BY lang ORDER BY lang""".stripMargin),
      "PURGE (REORG ... APPLY (PURGE) in Delta terms) rewrites every " +
        "DV-carrying file into plain ones, materializing the masked " +
        "deletes: the head reads IDENTICALLY to the pre-purge state " +
        "(live-row preserving by construction) and the in-band pin " +
        "shows zero masked files remain.  This is the maintenance op " +
        "that bounds merge-on-read's read-side anti-join: deletes " +
        "accrue cheaply in sidecars, then one scheduled purge " +
        "restores plain-scan reads — write amplification paid once, " +
        "on the operator's schedule, not per delete."),

    // ------------------------------------------ CDC across a DV commit
    QueryDef(
      "mor_change_feed",
      (s, d) => {
        val root = table(s, d)
        VersionedTable.changeFeed(s, root, 1, 2,
          idCol = Some("doc_id"))
          .groupBy(col("_change_type"), col("lang"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("n_chars")).as("sum_n_chars"))
          .orderBy(col("_change_type"), col("lang"))
      },
      Some(s"""WITH $morStateSql
        |SELECT 'delete' AS _change_type, lang,
        |       count(*)::BIGINT AS n_rows,
        |       sum(n_chars)::BIGINT AS sum_n_chars
        |FROM documents WHERE doc_id % 9 = 0
        |GROUP BY 2 ORDER BY 1, 2""".stripMargin),
      "The change data feed across a deletion-vector commit: the DV " +
        "pointer is part of file IDENTITY in the snapshot diff, so a " +
        "commit that carries every data file by reference but changes " +
        "two entries' DVs still diffs — those files scan (live) on " +
        "both sides and cancel down to exactly the masked rows, " +
        "tagged delete.  Downstream CDC (the streaming follower, " +
        "incremental view maintenance) therefore sees merge-on-read " +
        "deletes identically to copy-on-write ones — the encoding is " +
        "an implementation detail the feed contract hides."),

    // ------------------------------------- manifest-metadata history
    QueryDef(
      "mor_live_history",
      (s, d) => {
        val root = table(s, d)
        import s.implicits._
        VersionedTable.versions(s, root).map { v =>
          val sn = VersionedTable.snapshot(s, root, v)
          (v.toLong, sn.op, sn.rows)
        }.toDF("version", "op", "n_rows")
      },
      Some(s"""WITH $morStateSql
        |SELECT 1::BIGINT AS version, 'load' AS op,
        |       (SELECT count(*) FROM documents)::BIGINT AS n_rows
        |UNION ALL SELECT 2, 'delete-mor', (SELECT count(*) FROM m2)::BIGINT
        |UNION ALL SELECT 3, 'delete-mor', (SELECT count(*) FROM m3)::BIGINT
        |UNION ALL SELECT 4, 'merge', (SELECT count(*) FROM m4)::BIGINT
        |UNION ALL SELECT 5, 'purge', (SELECT count(*) FROM m4)::BIGINT
        |ORDER BY version""".stripMargin),
      "DESCRIBE HISTORY for the merge-on-read world: every version's " +
        "LIVE row count straight from manifest metadata — physical " +
        "rows minus each file's DV-masked count, no data file opened. " +
        "The masked counts are maintained exactly through DV folding, " +
        "re-insert and purge (purge is live-row preserving: v4 and v5 " +
        "agree), so COUNT(*)-style planning stays free even while " +
        "deletes are deferred."),
  )
}
