package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.{QueryDef, Scratch, Tables}
import graft.sources.VersionedTable

/** Batch 67: STRING column statistics, N-column Z-order, and the
  * reader-option surface (`VERSION AS OF` / `CHANGES BETWEEN`) on the
  * versioned table.  Round 11 lifted the per-file stats past
  * long-only: every write now records truncated lexicographic min/max
  * for string columns (the Iceberg truncate-and-bump rule keeps the
  * bounds sound at bounded manifest size), `optimizeClusterBy` /
  * `optimizeZOrderBy` admit string columns via rank-buckets, and
  * `readOptions` exposes time travel and CDF windows as Delta-shaped
  * reader options.  The point at 100 TB: `lang = 'fr'` — the most
  * natural corpus slice — must prune files exactly like a numeric
  * range does, and the lifecycle ops must be reachable through an
  * option-string surface, not only library calls. */
object Curation67Queries {

  /** documents loaded key-ranged, then re-clustered on the STRING
    * column `lang`. */
  private def langClusteredTable(s: SparkSession, d: String): String =
    Scratch.buildOnce(s, d, "vtabslang") { root =>
      VersionedTable.append(s, root, Tables.documents(s, d),
        "doc_id", 4, op = "load")
      VersionedTable.optimizeClusterBy(s, root, "lang", "doc_id", 4)
      ()
    }

  /** documents Z-ordered on THREE columns: key, numeric, string. */
  private def zorder3Table(s: SparkSession, d: String): String =
    Scratch.buildOnce(s, d, "vtabz3") { root =>
      VersionedTable.append(s, root, Tables.documents(s, d),
        "doc_id", 8, op = "load")
      // 16 files: ~log2(numFiles) interleave bits get constrained in
      // total across the 3 dims — 8 files would starve the least-
      // significant dimension of any strict prune
      VersionedTable.optimizeZOrderBy(s, root,
        Seq("doc_id", "n_chars", "lang"), "doc_id", 16)
      ()
    }

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------ string stats + string clustering
    QueryDef(
      "cluster_string_pruned_read",
      (s, d) => {
        val root = langClusteredTable(s, d)
        val head = VersionedTable.latestVersion(s, root).get
        val snap = VersionedTable.snapshot(s, root, head)
        val kept = VersionedTable.statsPrunedFiles(snap.files,
          Map.empty, Map("lang" -> ("fr", "fr")))
        // in-band pins: the string predicate prunes STRICTLY, and
        // every skipped file's recorded lexicographic bounds provably
        // exclude 'fr' — sound skipping, not sampled luck
        val strict = kept.size < snap.files.size
        val sound = snap.files.diff(kept).forall { f =>
          val (mn, mx) = f.sstats("lang"); mn > "fr" || mx < "fr"
        }
        VersionedTable.read(s, root,
            strRanges = Map("lang" -> ("fr", "fr")))
          .filter(col("lang") === "fr")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_n_chars"))
          .select(col("source"), col("n_docs"), col("sum_n_chars"),
            lit(snap.op).as("op"),
            lit(strict).as("lang_prune_strict"),
            lit(sound).as("skipped_cannot_match"))
          .orderBy(col("source"))
      },
      Some("""SELECT source, count(*)::BIGINT AS n_docs,
        |       sum(n_chars)::BIGINT AS sum_n_chars,
        |       'cluster' AS op, TRUE AS lang_prune_strict,
        |       TRUE AS skipped_cannot_match
        |FROM documents WHERE lang = 'fr'
        |GROUP BY source ORDER BY source""".stripMargin),
      "Re-cluster the corpus on the STRING column lang, then serve " +
        "`lang = 'fr'` through the per-file string statistics every " +
        "write records (truncated lexicographic min/max, Iceberg's " +
        "truncate-and-bump rule keeping long text from bloating the " +
        "manifest): the answer hash-matches the plain filter and the " +
        "in-band pins prove the read planned a strict file subset " +
        "with every skipped file's recorded bounds excluding 'fr'.  " +
        "Pre-r11 stats were long-only, so the most natural corpus " +
        "slice predicate could never skip a file; at 100 TB this is " +
        "the difference between scanning one language's share and " +
        "scanning the corpus."),

    // ------------------------------------------ 3-column Z-order
    QueryDef(
      "zorder3_table_pruned_read",
      (s, d) => {
        val root = zorder3Table(s, d)
        val head = VersionedTable.latestVersion(s, root).get
        val snap = VersionedTable.snapshot(s, root, head)
        // three INDEPENDENT single-dimension prunes, all strict —
        // what no 1-D (and no 2-D) layout can satisfy simultaneously
        val keptId = snap.files
          .filter(f => f.maxId >= 0L && f.minId <= 49L)
        val keptChars = VersionedTable.statsPrunedFiles(snap.files,
          Map("n_chars" -> (0L, 100L)))
        val keptLang = VersionedTable.statsPrunedFiles(snap.files,
          Map.empty, Map("lang" -> ("zh", "zh")))
        VersionedTable.read(s, root,
            strRanges = Map("lang" -> ("zh", "zh")))
          .filter(col("lang") === "zh")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_n_chars"))
          .select(col("source"), col("n_docs"), col("sum_n_chars"),
            lit(snap.op).as("op"),
            lit(keptId.size < snap.files.size).as("id_prune_strict"),
            lit(keptChars.size < snap.files.size)
              .as("chars_prune_strict"),
            lit(keptLang.size < snap.files.size)
              .as("lang_prune_strict"))
          .orderBy(col("source"))
      },
      Some("""SELECT source, count(*)::BIGINT AS n_docs,
        |       sum(n_chars)::BIGINT AS sum_n_chars,
        |       'zorder' AS op, TRUE AS id_prune_strict,
        |       TRUE AS chars_prune_strict, TRUE AS lang_prune_strict
        |FROM documents WHERE lang = 'zh'
        |GROUP BY source ORDER BY source""".stripMargin),
      "OPTIMIZE ZORDER BY (doc_id, n_chars, lang) — THREE dimensions, " +
        "one of them a string admitted via lexicographic rank-buckets " +
        "scaled across the full cell range so the string dimension " +
        "reaches the high interleave bits.  Each file covers a " +
        "compact box of the 3-space, so a narrow predicate on ANY one " +
        "dimension alone prunes strictly — pinned in-band for all " +
        "three simultaneously (key range via manifest minId/maxId, " +
        "numeric via long stats, string via the truncated string " +
        "stats).  The readout itself goes through the string-pruned " +
        "path and hash-matches the plain filter.  One layout rewrite " +
        "then serves id-shard scans, length-slice scans AND " +
        "language-slice scans from file subsets."),

    // ----------------------------------- timestamp stats + clustering
    QueryDef(
      "cluster_timestamp_pruned_read",
      (s, d) => {
        val root = Scratch.buildOnce(s, d, "vtabts") { r =>
          VersionedTable.append(s, r, Tables.events(s, d),
            "event_id", 6, op = "load")
          VersionedTable.optimizeClusterBy(s, r, "ts", "event_id", 6)
          ()
        }
        val head = VersionedTable.latestVersion(s, root).get
        val snap = VersionedTable.snapshot(s, root, head)
        // timestamp stats live in the long map as epoch MICROS
        // (lossless for parquet timestamp[us]); the cut is the first
        // three days of the 30-day fixture
        val hiMicros = java.time.Instant.parse("2024-01-04T00:00:00Z")
          .toEpochMilli * 1000L - 1L
        val kept = VersionedTable.statsPrunedFiles(snap.files,
          Map("ts" -> (0L, hiMicros)))
        val strict = kept.size < snap.files.size
        val sound = snap.files.diff(kept)
          .forall(_.stats("ts")._1 > hiMicros)
        VersionedTable.read(s, root,
            ranges = Map("ts" -> (0L, hiMicros)))
          .filter(col("ts") < lit("2024-01-04").cast("timestamp"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(floor(col("value") * lit(1000.0)).cast("long"))
              .as("sum_value_e3"))
          .select(col("event_type"), col("n_events"),
            col("sum_value_e3"), lit(snap.op).as("op"),
            lit(strict).as("ts_prune_strict"),
            lit(sound).as("skipped_cannot_match"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*)::BIGINT AS n_events,
        |       sum(floor(value * 1000))::BIGINT AS sum_value_e3,
        |       'cluster' AS op, TRUE AS ts_prune_strict,
        |       TRUE AS skipped_cannot_match
        |FROM events WHERE ts < TIMESTAMP '2024-01-04'
        |GROUP BY event_type ORDER BY event_type""".stripMargin),
      "Re-cluster an event table on its TIMESTAMP column, then serve " +
        "'first three days of the month' through per-file time bounds " +
        "recorded on every write (epoch micros riding the same long " +
        "stats map — lossless for parquet timestamp[us]): the answer " +
        "hash-matches the plain time filter, the read provably plans " +
        "a strict file subset, and every skipped file's recorded " +
        "minimum lies past the cut.  This is the retention-scan / " +
        "last-week-slice shape — the single most common predicate " +
        "over an event log — turned into an O(matching files) scan; " +
        "at 100 TB a time-clustered layout with manifest time bounds " +
        "is the difference between reading a few days and a month."),

    // ------------------------- reader-option surface: VERSION AS OF
    QueryDef(
      "time_travel_reader_option",
      (s, d) => {
        val root = Scratch.buildOnce(s, d, "vtabmor")(r =>
          Curation65Queries.buildMor(s, d, r))
        // the option-string surface: versionAsOf=3 is the state after
        // both MoR deletes, before the re-insert merge
        VersionedTable.readOptions(s, root, Map("versionAsOf" -> "3"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_n_chars"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH ${Curation65Queries.morStateSql}
        |SELECT lang, count(*)::BIGINT AS n_docs,
        |       sum(n_chars)::BIGINT AS sum_n_chars
        |FROM m3 GROUP BY lang ORDER BY lang""".stripMargin),
      "VERSION AS OF through the reader-option surface " +
        "(readOptions(versionAsOf=3)): the option string resolves to " +
        "the same snapshot read as the library call, hash-checked " +
        "against the logical double-delete state — the thin " +
        "Delta-parity surface that makes time travel reachable " +
        "without binding to library signatures.  Unknown options " +
        "throw rather than silently reading the wrong snapshot."),

    // ------------------------ reader-option surface: CHANGES BETWEEN
    QueryDef(
      "cdf_changes_between",
      (s, d) => {
        val root = Scratch.buildOnce(s, d, "vtabmor")(r =>
          Curation65Queries.buildMor(s, d, r))
        // the CDF window: commits 2..4 (two MoR deletes + the
        // re-insert merge), each tagged with its commit version
        VersionedTable.readOptions(s, root, Map(
            "readChangeFeed" -> "true",
            "startingVersion" -> "2", "endingVersion" -> "4",
            "idCol" -> "doc_id"))
          .groupBy(col("_commit_version"), col("_change_type"))
          .agg(count(lit(1)).as("n_rows"))
          .orderBy(col("_commit_version"), col("_change_type"))
      },
      Some(s"""WITH ${Curation65Queries.morStateSql}
        |SELECT 2 AS _commit_version, 'delete' AS _change_type,
        |       count(*)::BIGINT AS n_rows
        |FROM documents WHERE doc_id % 9 = 0
        |UNION ALL
        |SELECT 3, 'delete', count(*)::BIGINT
        |FROM m2 WHERE lang = 'fr'
        |UNION ALL
        |SELECT 4, 'insert', count(*)::BIGINT
        |FROM documents WHERE doc_id % 18 = 0
        |ORDER BY 1, 2""".stripMargin),
      "CHANGES BETWEEN through the reader-option surface " +
        "(readChangeFeed + startingVersion/endingVersion, inclusive — " +
        "Delta's CDF window contract): commits 2..4 of the " +
        "merge-on-read lifecycle feed as per-commit changes tagged " +
        "_commit_version — the two DV deletes surface as plain " +
        "deletes, the re-insert merge as inserts (every re-inserted " +
        "key was dead, so no update pairs), and the whole window " +
        "reads only the files each commit touched (multiset " +
        "cancellation per version).  This is the incremental-consumer " +
        "API: 'give me everything that changed between my last sync " +
        "and now' as one call."),
  )
}
