package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.{QueryDef, Scratch, Tables}
import graft.sources.VersionedTable

/** Batch 68: table GOVERNANCE and NATIVE-SPARK ACCESS on the
  * versioned table — CHECK constraints as versioned manifest metadata
  * enforced on every row-adding write, the DESCRIBE HISTORY audit
  * surface over commit metadata, per-file bloom filters for
  * unclustered point lookups, two-level (grouped) manifests bounding
  * commit I/O, and the graft-table Spark relation (read with
  * manifest-driven file skipping from plain .filter predicates, write
  * with history-preserving overwrite).  The 100 TB story: a curated
  * training corpus is written by many pipelines — the TABLE, not each
  * writer's good intentions, must reject a batch of negative lengths
  * (Delta's CHECK constraints exist for exactly this); the audit
  * trail must cost manifest reads, never scans; point lookups must
  * skip files on any layout; commits must write what changed, not
  * re-list a million entries; and any Spark job must be able to read
  * and write the format without this library on its classpath beyond
  * the connector. */
object Curation68Queries {

  /** documents loaded under two CHECK constraints. */
  private def constrainedTable(s: SparkSession, d: String): String =
    Scratch.buildOnce(s, d, "vtabcons") { root =>
      VersionedTable.append(s, root, Tables.documents(s, d),
        "doc_id", 4, op = "load")
      VersionedTable.addConstraint(s, root, "nonneg_chars",
        "n_chars >= 0")
      VersionedTable.addConstraint(s, root, "lang_nn",
        "lang IS NOT NULL")
      ()
    }

  /** A deterministic four-op lifecycle for the history audit. */
  private def historyTable(s: SparkSession, d: String): String =
    Scratch.buildOnce(s, d, "vtabhist") { root =>
      VersionedTable.append(s, root, Tables.documents(s, d),
        "doc_id", 4, op = "load")                                  // v1
      VersionedTable.addConstraint(s, root, "nonneg_chars",
        "n_chars >= 0")                                            // v2
      VersionedTable.merge(s, root,
        Tables.documents(s, d).filter(col("doc_id") < 5)
          .withColumn("text", concat(lit("edited "), col("text"))),
        "doc_id", 2)                                               // v3
      VersionedTable.deleteMoR(s, root,
        pmod(col("doc_id"), lit(100)) === 7, "doc_id")             // v4
      ()
    }

  val defs: Seq[QueryDef] = Seq(

    // -------------------------------- CHECK constraints gate writes
    QueryDef(
      "table_constraint_gate",
      (s, d) => {
        val root = constrainedTable(s, d)
        // a violating batch (negated lengths, fresh keys) attempted on
        // EVERY run: enforcement rejects it BEFORE any file is written
        // or version committed, so the attempt is repeatable and the
        // in-band pin is the live enforcement path, not builder state
        val bad = Tables.documents(s, d).limit(64).select(
          (col("doc_id") + lit(10000000L)).as("doc_id"), col("text"),
          col("lang"), col("source"),
          (-col("n_chars") - lit(1L)).as("n_chars"))
        val rejected =
          try { VersionedTable.append(s, root, bad, "doc_id", 1); false }
          catch { case e: IllegalStateException =>
            e.getMessage.contains("nonneg_chars") }
        val headV = VersionedTable.latestVersion(s, root).get
        val active = VersionedTable.constraints(s, root).toSeq.sorted
          .map { case (k, v) => s"$k: $v" }.mkString("; ")
        VersionedTable.read(s, root)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_n_chars"))
          .select(col("lang"), col("n_docs"), col("sum_n_chars"),
            lit(rejected).as("violating_append_rejected"),
            lit(headV == 3).as("no_version_from_rejected_write"),
            lit(active).as("active_constraints"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, count(*)::BIGINT AS n_docs,
        |       sum(n_chars)::BIGINT AS sum_n_chars,
        |       TRUE AS violating_append_rejected,
        |       TRUE AS no_version_from_rejected_write,
        |       'lang_nn: lang IS NOT NULL; nonneg_chars: n_chars >= 0'
        |         AS active_constraints
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
      "CHECK constraints as VERSIONED table metadata (`constraint.*` " +
        "manifest properties, Delta's encoding): adding one validates " +
        "every existing live row in a single aggregation pass, and " +
        "from that commit on every append/merge — including streaming " +
        "upserts, CDC ingest and replication, which route through " +
        "them — folds all constraints into one batch-sized aggregation " +
        "and REJECTS violating batches before any file is written or " +
        "version committed.  The query attempts a violating append on " +
        "every run and pins in-band that it was rejected, that no " +
        "version materialized, and which constraints are active; the " +
        "surviving table hash-matches the raw corpus.  At 100 TB the " +
        "table is written by many pipelines — the format, not writer " +
        "discipline, is what keeps a batch of negative lengths out, " +
        "at zero cost to unconstrained tables (empty set = zero " +
        "actions)."),

    // ------------------- the graft-table Spark relation (connector)
    QueryDef(
      "connector_pruned_read",
      (s, d) => {
        val root = Scratch.buildOnce(s, d, "vtabconn") { r =>
          VersionedTable.append(s, r, Tables.documents(s, d),
            "doc_id", 8, op = "load")
          VersionedTable.optimizeClusterBy(s, r, "n_chars", "doc_id", 8)
          ()
        }
        // the whole lakehouse layer behind a PLAIN spark.read.format:
        // Catalyst hands the filter to the manifest FileIndex, which
        // prunes through the per-file n_chars stats
        val df = s.read.format("graft-table").load(root)
          .filter(col("n_chars") < 150L)
        // in-band pin: the planned file count (scan metric, read after
        // one probe execution OF THIS dataframe's own physical plan —
        // count() would build a separate query execution whose scan
        // metrics never fire) is a strict subset and agrees with the
        // manifest's own stats predicate
        df.queryExecution.toRdd.count()
        def flatten(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[org.apache.spark.sql.execution.SparkPlan] =
          p +: (p match {
            case a: org.apache.spark.sql.execution.adaptive
                .AdaptiveSparkPlanExec => flatten(a.executedPlan)
            case other => other.children.flatMap(flatten)
          })
        val scanned = flatten(df.queryExecution.executedPlan)
          .collectFirst {
            case f: org.apache.spark.sql.execution.FileSourceScanExec =>
              f.metrics("numFiles").value
          }.getOrElse(-1L)
        val head = VersionedTable.latestVersion(s, root).get
        val snap = VersionedTable.snapshot(s, root, head)
        val manifestKept = VersionedTable.statsPrunedFiles(snap.files,
          Map("n_chars" -> (Long.MinValue, 149L))).size
        df.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_n_chars"))
          .select(col("source"), col("n_docs"), col("sum_n_chars"),
            lit(scanned < snap.files.size).as("scan_pruned_strict"),
            lit(scanned == manifestKept.toLong)
              .as("scan_matches_manifest_prune"))
          .orderBy(col("source"))
      },
      Some("""SELECT source, count(*)::BIGINT AS n_docs,
        |       sum(n_chars)::BIGINT AS sum_n_chars,
        |       TRUE AS scan_pruned_strict,
        |       TRUE AS scan_matches_manifest_prune
        |FROM documents WHERE n_chars < 150
        |GROUP BY source ORDER BY source""".stripMargin),
      "The versioned table as a NATIVE Spark relation " +
        "(spark.read.format(\"graft-table\"), Delta's architecture: a " +
        "HadoopFsRelation over Spark's vectorized parquet scan with a " +
        "manifest-backed FileIndex): a plain .filter(n_chars < 150) " +
        "reaches the manifest as a Catalyst data filter and the index " +
        "skips files through per-file column stats — no library call, " +
        "no reader options, whole-stage codegen and parquet row-group " +
        "pushdown intact.  In-band pins read the scan's own numFiles " +
        "metric: it planned a strict subset AND exactly the file set " +
        "the manifest's stats predicate computes (zone maps, string " +
        "stats and bloom probes ride the same translation; versionAsOf " +
        "/ timestampAsOf ride reader options).  At 100 TB this is the " +
        "difference between 'a format only its own library can read' " +
        "and a table any Spark job, SQL view or BI connector scans " +
        "with file skipping for free."),

    // ----------------------------- two-level (grouped) manifests
    QueryDef(
      "manifest_grouped_read",
      (s, d) => {
        // 16 files in 4 groups of 4; a one-file merge must then carry
        // 3 groups by reference and rewrite one
        val root = Scratch.buildOnce(s, d, "vtabgrp") { r =>
          VersionedTable.setProperty(s, r,
            VersionedTable.ManifestGroupSizeProp, "4")
          VersionedTable.append(s, r, Tables.documents(s, d),
            "doc_id", 16, op = "load")
          VersionedTable.merge(s, r,
            Tables.documents(s, d).filter(col("doc_id") < 5)
              .withColumn("text", concat(lit("edited "), col("text"))),
            "doc_id", 1)
          ()
        }
        val v2 = VersionedTable.snapshot(s, root, 2)
        val v3 = VersionedTable.snapshot(s, root, 3)
        val reused = v3.groups.map(_._1.path).toSet
          .intersect(v2.groups.map(_._1.path).toSet).size
        VersionedTable.read(s, root)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("text").startsWith("edited "), 1L)
              .otherwise(0L)).as("n_edited"))
          .select(col("lang"), col("n_docs"), col("n_edited"),
            lit(v2.groups.size).as("n_groups"),
            lit(reused.toLong).as("groups_carried_by_ref"),
            lit(v3.files.size == 16).as("file_set_roundtrips"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, count(*)::BIGINT AS n_docs,
        |       count(*) FILTER (WHERE doc_id < 5)::BIGINT AS n_edited,
        |       4::INT AS n_groups, 3::BIGINT AS groups_carried_by_ref,
        |       TRUE AS file_set_roundtrips
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
      "TWO-LEVEL manifests (Iceberg's manifest-list over manifests, " +
        "enrolled by the manifest.groupSize property): the root " +
        "manifest lists GROUP references — immutable sidecars of N " +
        "entries each with rows/key-range aggregates — and a commit " +
        "re-writes only the groups whose members actually changed, " +
        "carrying the rest by reference.  The query runs a one-file " +
        "merge over a 16-file/4-group layout and pins in-band that " +
        "exactly 3 of 4 groups carried by reference while the " +
        "materialized file set round-trips and the merged rows " +
        "hash-match the oracle.  This closes the single-level " +
        "manifest's documented ceiling: at 10^6 files a 3-file merge " +
        "writes ~1 group and a ~100-ref root instead of re-listing " +
        "a million entries — commit I/O proportional to what changed, " +
        "which is what makes high-frequency commits on a 100 TB " +
        "table affordable."),

    // ------------------------- bloom-filter point-lookup file skipping
    QueryDef(
      "bloom_pruned_point_read",
      (s, d) => {
        // key-ranged 64-file layout with blooms on `text`: the lookup
        // column is NOT the layout column, so zone maps cannot help —
        // exactly the case blooms exist for
        val root = Scratch.buildOnce(s, d, "vtabbloom") { r =>
          VersionedTable.append(s, r, Tables.documents(s, d),
            "doc_id", 4, op = "load")
          VersionedTable.setProperty(s, r,
            VersionedTable.BloomColsProp, "text")
          // rewrite under the property so every file carries blooms;
          // 64 files keeps rows-per-file in bloom-accurate range at
          // every fixture scale (sf0.1: ~780 rows/file)
          VersionedTable.optimizeClusterBy(s, r, "doc_id", "doc_id", 64)
          ()
        }
        val head = VersionedTable.latestVersion(s, root).get
        val snap = VersionedTable.snapshot(s, root, head)
        // the needle: doc 7's full text, resolved through the zone map
        // (one file) — a dedup-shaped "is this exact text already in
        // the corpus?" probe
        val needle = VersionedTable.read(s, root, idRange = Some((7L, 7L)))
          .filter(col("doc_id") === 7L)
          .select(col("text")).head().getString(0)
        val kept = VersionedTable.bloomPrunedFiles(snap.files,
          Map("text" -> needle))
        val strict = kept.size < snap.files.size
        VersionedTable.read(s, root, eqs = Map("text" -> needle))
          .filter(col("text") === lit(needle))
          .select(col("doc_id"), col("lang"), col("source"),
            col("n_chars"), lit(strict).as("bloom_prune_strict"),
            lit(snap.files.forall(_.blooms.contains("text")))
              .as("all_files_bloomed"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang, source, n_chars,
        |       TRUE AS bloom_prune_strict, TRUE AS all_files_bloomed
        |FROM documents
        |WHERE text = (SELECT text FROM documents WHERE doc_id = 7)
        |ORDER BY doc_id""".stripMargin),
      "Per-file BLOOM FILTERS (4096 bits x 4 xxhash64 probes per " +
        "value, ~700 manifest bytes per file-column, enrolled by the " +
        "bloom.cols table property) answer point-equality predicates " +
        "on columns the layout is NOT clustered by — the role of " +
        "Delta's bloom index and parquet's bloom pages.  The query " +
        "probes the corpus for one document's exact text on a " +
        "key-ranged layout: the in-band pins prove every file carries " +
        "a bloom and the lookup planned a strict file subset, and the " +
        "answer hash-matches the plain equality scan (no false " +
        "negatives by construction — the driver-side lookup evaluates " +
        "the SAME Catalyst hash expression the write-side projection " +
        "used).  At 100 TB this is the exact-dedup / by-content-lookup " +
        "primitive: 'is this text already in the corpus' costs a few " +
        "false-positive file reads instead of a full scan, on any " +
        "layout, for KBs of manifest."),

    // -------------------- connector write path: overwrite + reread
    QueryDef(
      "connector_write_roundtrip",
      (s, d) => {
        val root = Scratch.buildOnce(s, d, "vtabconnw") { r =>
          // Append then history-preserving Overwrite, both through the
          // public DataFrameWriter surface
          Tables.documents(s, d).filter(col("doc_id") < 10)
            .write.format("graft-table").option("keyCol", "doc_id")
            .option("numFiles", "2").mode("append").save(r)
          Tables.documents(s, d)
            .write.format("graft-table").mode("overwrite").save(r)
          ()
        }
        val head = VersionedTable.latestVersion(s, root).get
        val snap = VersionedTable.snapshot(s, root, head)
        val v1Rows = VersionedTable.snapshot(s, root, 1).rows
        s.read.format("graft-table").load(root)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_n_chars"))
          .select(col("lang"), col("n_docs"), col("sum_n_chars"),
            lit(snap.op).as("op"),
            lit(v1Rows == 10L).as("history_time_travels"),
            lit(snap.props.get(VersionedTable.TableKeyProp)
              .contains("doc_id")).as("key_recorded"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, count(*)::BIGINT AS n_docs,
        |       sum(n_chars)::BIGINT AS sum_n_chars,
        |       'overwrite' AS op, TRUE AS history_time_travels,
        |       TRUE AS key_recorded
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
      "The connector WRITE path end to end through the public " +
        "DataFrameWriter surface: an Append creates the table " +
        "(recording its key as the table.key property), a mode= " +
        "overwrite commits a version whose file list replaces the " +
        "head, and the reread through the same format hash-matches " +
        "the corpus — while the in-band pins prove the pre-overwrite " +
        "version is still time-travelable (Delta's overwrite: content " +
        "swaps, history and policy stay).  A user of the reference " +
        "can produce AND consume the table format with nothing but " +
        "spark.read/write.format calls."),

    // ------------------------------------- DESCRIBE HISTORY audit
    QueryDef(
      "table_history_audit",
      (s, d) => {
        val root = historyTable(s, d)
        // commit timestamps exist on every manifest (advisory
        // wall-clock; instants are env-dependent so the pin is
        // presence, checked over the O(versions) manifest metadata on
        // the driver — no Spark job, mirroring what history() reads)
        val allTs = VersionedTable.versions(s, root)
          .forall(v => VersionedTable.snapshot(s, root, v).tsMillis > 0L)
        VersionedTable.history(s, root)
          .select(col("version"), col("op"), col("num_live_rows"),
            col("num_constraints"), lit(allTs).as("all_ts_present"))
          .orderBy(col("version"))
      },
      Some("""WITH n AS (SELECT count(*) AS c,
        |         count(*) FILTER (WHERE doc_id % 100 = 7) AS del
        |       FROM documents)
        |SELECT * FROM (
        |  SELECT 1::INT AS version, 'load' AS op,
        |         (SELECT c FROM n)::BIGINT AS num_live_rows,
        |         0::BIGINT AS num_constraints, TRUE AS all_ts_present
        |  UNION ALL SELECT 2::INT, 'set-constraint',
        |         (SELECT c FROM n)::BIGINT, 1::BIGINT, TRUE
        |  UNION ALL SELECT 3::INT, 'merge',
        |         (SELECT c FROM n)::BIGINT, 1::BIGINT, TRUE
        |  UNION ALL SELECT 4::INT, 'delete-mor',
        |         ((SELECT c FROM n) - (SELECT del FROM n))::BIGINT,
        |         1::BIGINT, TRUE
        |) ORDER BY version""".stripMargin),
      "DESCRIBE HISTORY over the versioned table: one audit row per " +
        "kept version — op, live-row count (deletion-vector-masked " +
        "rows already excluded, straight from manifest metadata), " +
        "active-constraint cardinality, and commit wall-clock — " +
        "built from the manifests alone, O(versions) driver work over " +
        "cached parses with NO data scan.  The lifecycle under audit " +
        "is load -> add constraint -> merge -> merge-on-read delete, " +
        "and the oracle recomputes each version's live count from the " +
        "raw corpus.  At 100 TB 'what changed this table, when, and " +
        "how many rows did it leave' must cost manifest reads, not " +
        "scans — this is Delta's DESCRIBE HISTORY contract, commit " +
        "timestamps riding every manifest for time-based retention " +
        "(vacuumRetain) as well."),
  )
}
