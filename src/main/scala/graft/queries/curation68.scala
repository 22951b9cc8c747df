package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.{QueryDef, Scratch, Tables}
import graft.sources.VersionedTable

/** Batch 68: table GOVERNANCE on the versioned table — CHECK
  * constraints as versioned manifest metadata enforced on every
  * row-adding write, and the DESCRIBE HISTORY audit surface over
  * commit metadata.  The 100 TB story: a curated training corpus is
  * written by many pipelines; the TABLE, not each writer's good
  * intentions, must be what rejects a batch of negative lengths or
  * null languages (Delta's CHECK constraints exist for exactly this),
  * and the audit trail of what changed it — op, counts, constraint
  * cardinality per version — must be one manifest-only query, never a
  * data scan. */
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
