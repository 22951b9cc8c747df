package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.{QueryDef, Scratch}
import graft.sources.VersionedTable

/** Batch 63: the versioned-table LIFECYCLE surface on top of batch
  * 62's format — RESTORE (roll the head back to an old version as a
  * new commit), shallow zero-copy CLONE (a new table root whose first
  * manifest references the source's files), and the row-level change
  * data feed (the diff multisets tagged insert/delete).  These are
  * the three operations a 100 TB training-corpus deployment leans on
  * hardest: undo a bad curation commit without rewriting anything,
  * fork a corpus for an experiment without copying it, and ship
  * incremental changes downstream without rescanning the table.
  *
  * Same oracle discipline as batch 62: every query's readout reduces
  * to CTE algebra over `documents` (the v2/v3/v4 reconstruction in
  * [[Curation62Queries]]), so DuckDB hash-checks the lifecycle ops
  * end to end.
  */
object Curation63Queries {

  // ONE source of truth with batch 62: the CTE reconstruction, the
  // four-version build, and the shared "vtab" memo key all come from
  // Curation62Queries (private[queries]) — no drift possible
  import Curation62Queries.{buildFour, stateSql}

  /** The shared read-only four-version instance (batch 62's builder
    * and memo key, so the two batches share ONE build per dataset). */
  private def sharedTable(s: SparkSession, d: String): String =
    Curation62Queries.table(s, d)

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------ RESTORE
    QueryDef(
      "restore_version_read",
      (s, d) => {
        // own instance: restore ADDS a v5, which would change
        // table_version_history's answer on the shared table
        val root = Scratch.buildOnce(s, d, "vtabres") { r =>
          buildFour(s, d, r)
          VersionedTable.restore(s, r, toVersion = 2)
          ()
        }
        val head = VersionedTable.latestVersion(s, root).get
        val sn = VersionedTable.snapshot(s, root, head)
        VersionedTable.read(s, root)
          .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
          .select(lit(head.toLong).as("head_version"),
            lit(sn.op).as("op"), col("lang"), col("n_docs"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH $stateSql
        |SELECT 5::BIGINT AS head_version, 'restore' AS op, lang,
        |       count(*)::BIGINT AS n_docs
        |FROM v2 GROUP BY lang ORDER BY lang""".stripMargin),
      "RESTORE to version 2 after a merge and a delete: the head " +
        "becomes a NEW version 5 whose file list IS v2's manifest — " +
        "zero bytes copied or rewritten, intermediate history (v3, " +
        "v4) still time-travels.  The head read hash-matches the pure " +
        "v2 reconstruction: the undo button for a bad curation " +
        "commit, O(manifest) regardless of table size."),

    // ------------------------------------------ shallow CLONE
    QueryDef(
      "clone_zero_copy_read",
      (s, d) => {
        val src = sharedTable(s, d)
        val dst = Scratch.buildOnce(s, d, "vtabclone") { r =>
          VersionedTable.cloneShallow(s, src, r, Some(3))
          ()
        }
        // zero-copy proof carried in-band: the clone root holds NO
        // data files of its own (its manifest references the source)
        val fsPath = new org.apache.hadoop.fs.Path(dst, "data")
        val fs = fsPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        val localFiles = if (fs.exists(fsPath))
          fs.listStatus(fsPath).length.toLong else 0L
        VersionedTable.read(s, dst)
          .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
          .select(col("lang"), col("n_docs"),
            lit(localFiles).as("n_local_data_files"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH $stateSql
        |SELECT lang, count(*)::BIGINT AS n_docs,
        |       0::BIGINT AS n_local_data_files
        |FROM v3 GROUP BY lang ORDER BY lang""".stripMargin),
      "Shallow clone of the shared table AS OF version 3 into a fresh " +
        "root: one manifest write, zero data copied (pinned in-band — " +
        "the clone's data dir holds 0 files), and the clone reads " +
        "byte-identically to the source's v3.  The fork-a-corpus-for-" +
        "an-experiment primitive: at 100 TB a deep copy is days of " +
        "I/O, a shallow clone is one JSON file; the clone's own " +
        "commits land under its root and never touch the source."),

    // ------------------------------------------ change data feed
    QueryDef(
      "version_change_feed",
      (s, d) => {
        val root = sharedTable(s, d)
        VersionedTable.changeFeed(s, root, 2, 3)
          .groupBy(col("_change_type"), col("lang"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("n_chars")).as("sum_n_chars"))
          .orderBy(col("_change_type"), col("lang"))
      },
      Some(s"""WITH $stateSql,
        |feed AS (
        |  SELECT 'insert' AS _change_type, lang, n_chars FROM upd
        |  UNION ALL
        |  SELECT 'insert', lang, n_chars FROM ins
        |  UNION ALL
        |  SELECT 'delete', lang, n_chars FROM v2 WHERE doc_id % 7 = 0)
        |SELECT _change_type, lang, count(*)::BIGINT AS n_rows,
        |       sum(n_chars)::BIGINT AS sum_n_chars
        |FROM feed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      "Row-level change data feed for the v2 -> v3 MERGE: every " +
        "updated row surfaces as its delete+insert pair (old and new " +
        "image) and every inserted row as an insert, tagged " +
        "_change_type — the CDC encoding downstream incremental " +
        "consumers (re-embed changed docs, refresh an index) fold " +
        "without rescanning the table.  Reads ONLY files the two " +
        "manifests do not share; carried files cancel by reference, " +
        "so feed cost scales with the commit, not the table."),

    // -------------------------------- change feed with update pairing
    QueryDef(
      "change_feed_update_pairs",
      (s, d) => {
        val root = sharedTable(s, d)
        VersionedTable.changeFeed(s, root, 2, 3, idCol = Some("doc_id"))
          .groupBy(col("_change_type"), col("lang"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("n_chars")).as("sum_n_chars"))
          .orderBy(col("_change_type"), col("lang"))
      },
      Some(s"""WITH $stateSql,
        |feed AS (
        |  SELECT 'update_postimage' AS _change_type, lang, n_chars
        |  FROM upd
        |  UNION ALL
        |  SELECT 'insert', lang, n_chars FROM ins
        |  UNION ALL
        |  SELECT 'update_preimage', lang, n_chars
        |  FROM v2 WHERE doc_id % 7 = 0)
        |SELECT _change_type, lang, count(*)::BIGINT AS n_rows,
        |       sum(n_chars)::BIGINT AS sum_n_chars
        |FROM feed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      "The same v2 -> v3 feed with its update halves RESOLVED on the " +
        "table key (Delta's CDF contract): a doc_id on both sides of " +
        "the diff is an update, emitted as update_preimage (old row) " +
        "and update_postimage (new row); one-sided keys stay insert / " +
        "delete — here every merge-matched row pairs and every fresh " +
        "id inserts, which the oracle reconstructs exactly.  Pairing " +
        "is one commit-sized key intersection + marker join, never a " +
        "table scan; it is what lets a downstream aggregate fold " +
        "+post - pre and stay exact without reprocessing."),

    // --------------------- incremental view maintenance over the CDF
    QueryDef(
      "cdf_incremental_agg_maintenance",
      (s, d) => {
        val root = sharedTable(s, d)
        // the materialized view: per-lang (count, sum) aggregated ONCE
        // over v1, then maintained commit by commit from each paired
        // change feed — +postimage/+insert, -preimage/-delete — and
        // compared in-band against the direct v4 aggregate
        val base = VersionedTable.read(s, root, Some(1))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sc"))
        val sign = when(col("_change_type")
          .isin("insert", "update_postimage"), 1L).otherwise(-1L)
        val deltas = (1 until 4).map { v =>
          VersionedTable.changeFeed(s, root, v, v + 1,
              idCol = Some("doc_id"))
            .select(col("lang"), sign.as("n"),
              (sign * col("n_chars")).as("sc"))
        }.reduce(_ unionByName _)
        val maintained = base.unionByName(deltas)
          .groupBy(col("lang"))
          .agg(sum(col("n")).as("n_docs"),
            sum(col("sc")).as("sum_n_chars"))
          // a group folding to zero rows (zh: v4 deletes the lang
          // entirely) leaves the view, exactly as a recompute would
          .filter(col("n_docs") > 0)
        val direct = VersionedTable.read(s, root, Some(4))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs_direct"),
            sum(col("n_chars")).as("sum_n_chars_direct"))
        // full outer: ANY divergence (group missing on either side)
        // surfaces as nulls and breaks the oracle hash
        maintained.join(direct, Seq("lang"), "full")
          .orderBy(col("lang"))
      },
      Some(s"""WITH $stateSql
        |SELECT lang, count(*)::BIGINT AS n_docs,
        |       sum(n_chars)::BIGINT AS sum_n_chars,
        |       count(*)::BIGINT AS n_docs_direct,
        |       sum(n_chars)::BIGINT AS sum_n_chars_direct
        |FROM v4 GROUP BY lang ORDER BY lang""".stripMargin),
      "Incremental materialized-view maintenance from the paired " +
        "change feed: a per-lang (count, sum) view aggregated once " +
        "over v1 and then FOLDED forward through the v1->v2->v3->v4 " +
        "feeds (+postimage/+insert, -preimage/-delete) lands exactly " +
        "on the direct v4 aggregate — including the group that v4 " +
        "empties out (zh), which must leave the view as a recompute " +
        "would.  The 100 TB point: the base aggregate is paid once; " +
        "each refresh reads only the commit's differing files " +
        "(multiset cancellation), so view freshness costs " +
        "O(commit), never O(table) — the same algebra Delta/Iceberg " +
        "users hand-roll for aggregate tables, here as one " +
        "oracle-checked operator."),
  )
}
