package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Pipeline-maintenance operators: CDC-style latest-state compaction,
  * wide->long reshaping (unpivot), and per-column data profiling — the
  * housekeeping passes every long-lived 100 TB table needs between
  * analytical queries. Determinism contract as everywhere: integer /
  * fixed-point outputs, explicit tie-breaks. */
object PipelineOpsQueries {

  val defs: Seq[QueryDef] = Seq(
    // ---------------------------------------------------- compaction
    QueryDef(
      "compact_latest_state",
      (s, d) => Tables.events(s, d)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ts").desc, col("event_id").desc)))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event"),
          col("event_type").as("last_type"),
          unix_micros(col("ts")).as("ts_us")),
      Some("""SELECT user_id, event_id AS last_event,
        | event_type AS last_type, epoch_us(ts::TIMESTAMP) AS ts_us
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1""".stripMargin),
      "Latest-record-per-key compaction (CDC upsert resolution): one " +
        "shuffle on the key, rank-1 window with deterministic (ts, id) " +
        "tie-break. The periodic rewrite that keeps a 100 TB mutable-" +
        "state table queryable; same shape as streaming " +
        "dropDuplicates-keep-last."),

    // ------------------------------------------------------- unpivot
    QueryDef(
      "unpivot_user_metrics",
      (s, d) => {
        val wide = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(floor(col("value") * 100)).cast("long").as("value_e2"),
            countDistinct(col("event_type")).as("n_types"))
        wide.unpivot(
          Array(col("user_id")),
          Array(col("n_events"), col("value_e2"), col("n_types")),
          "metric", "metric_value")
      },
      Some("""WITH wide AS (
        |  SELECT user_id, count(*) AS n_events,
        |         sum(floor(value * 100))::BIGINT AS value_e2,
        |         count(DISTINCT event_type) AS n_types
        |  FROM events GROUP BY user_id)
        |SELECT user_id, 'n_events' AS metric, n_events AS metric_value FROM wide
        |UNION ALL
        |SELECT user_id, 'value_e2', value_e2 FROM wide
        |UNION ALL
        |SELECT user_id, 'n_types', n_types FROM wide""".stripMargin),
      "Wide->long reshape (unpivot/melt), the inverse of pivot_scores: " +
        "per-user metric matrix melted to (key, metric, value) triples — " +
        "a narrow map after the aggregation, no extra shuffle; the " +
        "feature-store export shape."),

    // --------------------------------------------- sequence packing
    QueryDef(
      "pack_sequences",
      (s, d) => {
        // Greedy contiguous packing of documents into 2048-token bins,
        // per language shard: exclusive running token sum -> bin =
        // cum div capacity.  The running sum executes through
        // ScalableGroups (one range exchange on (lang, doc_id) + a
        // broadcast per-lang offset), NOT a lang-partitioned window —
        // the enum key would funnel corpus/|lang| rows per task; the
        // range partitioning splits every language across tasks.
        // Within a shard the assignment is the standard
        // streaming-greedy approximation of bin packing.
        val Capacity = 2048L
        val toks = size(split(col("text"), " ")).cast("long")
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), toks.as("n_tokens"))
        graft.operators.ScalableGroups.withGroupRunningSums(
            base, Seq("lang"), Seq(col("doc_id")), Seq("n_tokens"), 8,
            exclusive = true, prefix = "before_")
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            (col("before_n_tokens") / Capacity).cast("long").as("bin_id"))
      },
      Some("""SELECT doc_id, lang,
        | len(string_split(text, ' '))::BIGINT AS n_tokens,
        | (coalesce(sum(len(string_split(text, ' '))) OVER (
        |    PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |  // 2048)::BIGINT AS bin_id
        |FROM documents""".stripMargin),
      "Sequence packing for LLM training: documents greedily packed " +
        "into 2048-token context bins per language shard (exclusive " +
        "running sum -> integer div). One range exchange on " +
        "(lang, doc_id) + a broadcast per-lang offset (ScalableGroups) " +
        "— every language splits across tasks, so the pass is flat at " +
        "any corpus size; the batch-construction step between " +
        "curation and the trainer."),

    // ---------------------------------------------- cohort retention
    QueryDef(
      "cohort_retention",
      (s, d) => {
        val DayUs = 86400000000L
        val ev = Tables.events(s, d)
          .select(col("user_id"),
            (unix_micros(col("ts")) / DayUs).cast("long").as("day"))
          .distinct()
        val firstDay = ev.groupBy(col("user_id"))
          .agg(min(col("day")).as("cohort_day"))
        ev.join(firstDay, "user_id")
          .select(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"),
            col("user_id"))
          .filter(col("day_offset") <= 7)
          .groupBy(col("cohort_day"), col("day_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
      },
      Some("""WITH ev AS (
        |  SELECT DISTINCT user_id,
        |         (epoch_us(ts::TIMESTAMP) // 86400000000) AS day
        |  FROM events),
        |fd AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id)
        |SELECT cohort_day, (day - cohort_day) AS day_offset,
        |       count(DISTINCT ev.user_id) AS n_users
        |FROM ev JOIN fd USING (user_id)
        |WHERE (day - cohort_day) <= 7
        |GROUP BY cohort_day, day_offset""".stripMargin),
      "Cohort retention (users active at day offsets 0-7 from their " +
        "first-seen day): distinct (user, day) grid -> per-user min -> " +
        "co-partitioned join on user -> offset agg. Integer epoch-day " +
        "arithmetic on both engines; the engagement scorecard over any " +
        "event stream, all aggregates map-side-combinable."),

    // ------------------------------------------------ data profiling
    QueryDef(
      "profile_documents",
      (s, d) => {
        val docs = Tables.documents(s, d)
        def prof(name: String, c: org.apache.spark.sql.Column) =
          docs.agg(
            lit(name).as("column_name"),
            count(lit(1)).as("n_rows"),
            count(when(c.isNull, lit(1))).as("n_null"),
            countDistinct(c).as("n_distinct"),
            min(length(c.cast("string"))).cast("bigint").as("min_len"),
            max(length(c.cast("string"))).cast("bigint").as("max_len"))
        prof("text", col("text"))
          .unionByName(prof("lang", col("lang")))
          .unionByName(prof("source", col("source")))
      },
      Some("""SELECT 'text' AS column_name, count(*) AS n_rows,
        |  count(CASE WHEN text IS NULL THEN 1 END) AS n_null,
        |  count(DISTINCT text) AS n_distinct,
        |  min(length(text::VARCHAR))::BIGINT AS min_len,
        |  max(length(text::VARCHAR))::BIGINT AS max_len
        |FROM documents
        |UNION ALL
        |SELECT 'lang', count(*),
        |  count(CASE WHEN lang IS NULL THEN 1 END),
        |  count(DISTINCT lang),
        |  min(length(lang::VARCHAR))::BIGINT,
        |  max(length(lang::VARCHAR))::BIGINT
        |FROM documents
        |UNION ALL
        |SELECT 'source', count(*),
        |  count(CASE WHEN source IS NULL THEN 1 END),
        |  count(DISTINCT source),
        |  min(length(source::VARCHAR))::BIGINT,
        |  max(length(source::VARCHAR))::BIGINT
        |FROM documents""".stripMargin),
      "Per-column profiling (rows / nulls / distinct / length range): " +
        "the table-health pass before any corpus job; each column's " +
        "stats aggregate map-side in one scan per column group, and at " +
        "100 TB distinct counts swap to approx_count_distinct " +
        "(documented in approx_count_users)."),

    // -------------------------------------------- forward fill (LOCF)
    QueryDef(
      "forward_fill_locf",
      (s, d) => {
        // Sensor-style missing data: 'error' events carry no usable
        // reading (synthesized as NULL deterministically in both
        // engines); impute last-observation-carried-forward per user.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("t_us"), col("event_id"))
          .rowsBetween(Long.MinValue, 0)
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("t_us"),
            when(col("event_type") =!= "error",
              floor(col("value") * 1000).cast("bigint")).as("reading_e3"))
          .withColumn("filled_e3",
            last(col("reading_e3"), ignoreNulls = true).over(w))
          .withColumn("was_imputed",
            col("reading_e3").isNull && col("filled_e3").isNotNull)
      },
      Some("""SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS t_us,
        |  CASE WHEN event_type != 'error'
        |       THEN floor(value * 1000)::BIGINT END AS reading_e3,
        |  last_value(CASE WHEN event_type != 'error'
        |                  THEN floor(value * 1000)::BIGINT END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) AS filled_e3,
        |  (CASE WHEN event_type != 'error'
        |        THEN floor(value * 1000)::BIGINT END IS NULL
        |   AND last_value(CASE WHEN event_type != 'error'
        |                  THEN floor(value * 1000)::BIGINT END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) IS NOT NULL) AS was_imputed
        |FROM events""".stripMargin),
      "Forward fill / last-observation-carried-forward: NULL readings " +
        "imputed from the user's most recent non-null via " +
        "last(ignoreNulls) over an unbounded-preceding ROWS frame — " +
        "the missing-data repair every telemetry/feature pipeline runs. " +
        "One shuffle on the partition key; the frame scans forward " +
        "incrementally, so cost is linear per partition regardless of " +
        "gap length (never a self-join per gap)."),

    // ------------------------------------------------ map HOF filtering
    QueryDef(
      "map_filter_hot_types",
      (s, d) => Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(max(col("event_id")).as("last_id"))
        .groupBy(col("user_id"))
        .agg(map_from_entries(array_sort(collect_list(
          struct(col("event_type"), col("last_id"))))).as("m"))
        .select(col("user_id"),
          map_filter(col("m"), (k, v) => v >= 5000).as("hot"))
        .select(col("user_id"),
          size(col("hot")).cast("bigint").as("n_hot"),
          array_join(array_sort(map_keys(col("hot"))), ",").as("hot_types")),
      Some("""WITH last AS (SELECT user_id, event_type,
        |    max(event_id) AS last_id FROM events GROUP BY 1, 2)
        |SELECT user_id,
        |  count(CASE WHEN last_id >= 5000 THEN 1 END)::BIGINT AS n_hot,
        |  coalesce(string_agg(CASE WHEN last_id >= 5000 THEN event_type END,
        |                      ',' ORDER BY event_type), '') AS hot_types
        |FROM last GROUP BY user_id""".stripMargin),
      "Row-local map filtering: the per-user type->latest-id map " +
        "(map_from_entries over pre-deduped entries — duplicate map " +
        "keys throw in Spark) pruned to hot entries with map_filter, " +
        "then re-emitted as sorted scalars so the result is map-order " +
        "independent. Completes the map HOF family " +
        "(map_event_type_counts builds, map_share_permille transforms " +
        "values, this filters); map state stays one bounded map per " +
        "user through the agg."),

    // ------------------------------------- corrupt-record JSON ingestion
    QueryDef(
      "scan_json_corrupt_records",
      (s, d) => {
        // Synthesize a JSON-lines feed with deterministic corruption
        // (every 7th record truncated mid-object) so both engines see
        // identical dirt — the PERMISSIVE-parse shape of a crawl whose
        // writers occasionally die mid-line.
        val good = concat(lit("{\"id\":"), col("doc_id"),
          lit(",\"n\":"), col("n_chars"), lit("}"))
        val bad = concat(lit("{\"id\":"), col("doc_id"), lit(",\"n\":"))
        val lines = Tables.documents(s, d).select(col("source"),
          when(pmod(col("doc_id"), lit(7)) === 0, bad).otherwise(good)
            .as("line"))
        lines
          .select(col("source"), from_json(col("line"),
            org.apache.spark.sql.types.StructType.fromDDL(
              "id BIGINT, n BIGINT")).as("j"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_lines"),
            count(col("j.id")).as("n_parsed"),
            (count(lit(1)) - count(col("j.id"))).as("n_corrupt"),
            sum(col("j.n")).as("sum_n"))
      },
      Some("""WITH lines AS (SELECT source,
        |    CASE WHEN doc_id % 7 = 0
        |         THEN '{"id":' || doc_id || ',"n":'
        |         ELSE '{"id":' || doc_id || ',"n":' || n_chars || '}'
        |    END AS line
        |  FROM documents)
        |SELECT source, count(*)::BIGINT AS n_lines,
        |  count(CASE WHEN json_valid(line) THEN 1 END)::BIGINT AS n_parsed,
        |  count(CASE WHEN NOT json_valid(line) THEN 1 END)::BIGINT
        |    AS n_corrupt,
        |  sum(CASE WHEN json_valid(line)
        |           THEN (line->>'$.n')::BIGINT END)::BIGINT AS sum_n
        |FROM lines GROUP BY source""".stripMargin),
      "Corrupt-tolerant JSON ingestion: from_json in PERMISSIVE mode " +
        "nulls out malformed records instead of failing the job, and " +
        "the per-source quarantine counts (parsed / corrupt / payload " +
        "sum) surface feed health — a 100 TB crawl ingest NEVER dies on " +
        "row one (same contract as ingest_try_cast for scalar casts). " +
        "Narrow parse + one small agg; corruption is synthesized " +
        "deterministically so the DuckDB oracle sees identical dirt."),

    // --------------------------------------- data-quality constraints
    QueryDef(
      "constraint_violations",
      (s, d) => {
        // Deequ/dbt-test-style constraint suite: each rule is one
        // aggregate (or anti-join count) and the report is their union
        // — the gate a corpus ingest runs before promoting a snapshot.
        val orders = Tables.orders(s, d)
        val cust = Tables.customer(s, d)
        val li = Tables.lineitem(s, d)
        val docs = Tables.documents(s, d)
        def rule(name: String, violations: org.apache.spark.sql.Column,
            checked: org.apache.spark.sql.DataFrame) =
          checked.agg(violations.cast("bigint").as("n_violations"),
            count(lit(1)).as("n_checked"))
            .select(lit(name).as("rule"), col("n_violations"),
              col("n_checked"))
        val fk = orders.join(cust,
            orders("o_custkey") === cust("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit("orders_custkey_fk").as("rule"),
            col("n_violations"),
            lit(null).cast("bigint").as("n_checked"))
          .crossJoin(orders.agg(count(lit(1)).as("nc")))
          .select(col("rule"), col("n_violations"),
            col("nc").as("n_checked"))
        fk.unionByName(
            rule("lineitem_quantity_range",
              count(when(col("l_quantity") < 1 || col("l_quantity") > 50,
                lit(1))), li))
          .unionByName(
            rule("documents_doc_id_unique",
              count(lit(1)) - countDistinct(col("doc_id")), docs))
          .unionByName(
            rule("documents_text_nonblank",
              count(when(col("text").isNull ||
                length(trim(col("text"))) === 0, lit(1))), docs))
          .unionByName(
            rule("events_type_domain",
              count(when(!col("event_type").isin(
                "signup", "click", "view", "purchase", "error"), lit(1))),
              Tables.events(s, d)))
      },
      Some("""SELECT 'orders_custkey_fk' AS rule,
        |  (SELECT count(*) FROM orders o
        |   WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                     WHERE c.c_custkey = o.o_custkey))::BIGINT
        |    AS n_violations,
        |  (SELECT count(*) FROM orders)::BIGINT AS n_checked
        |UNION ALL SELECT 'lineitem_quantity_range',
        |  (SELECT count(*) FROM lineitem
        |   WHERE l_quantity < 1 OR l_quantity > 50)::BIGINT,
        |  (SELECT count(*) FROM lineitem)::BIGINT
        |UNION ALL SELECT 'documents_doc_id_unique',
        |  (SELECT count(*) - count(DISTINCT doc_id) FROM documents)::BIGINT,
        |  (SELECT count(*) FROM documents)::BIGINT
        |UNION ALL SELECT 'documents_text_nonblank',
        |  (SELECT count(*) FROM documents
        |   WHERE text IS NULL OR length(trim(text)) = 0)::BIGINT,
        |  (SELECT count(*) FROM documents)::BIGINT
        |UNION ALL SELECT 'events_type_domain',
        |  (SELECT count(*) FROM events
        |   WHERE event_type NOT IN
        |     ('signup','click','view','purchase','error'))::BIGINT,
        |  (SELECT count(*) FROM events)::BIGINT""".stripMargin),
      "Data-quality constraint suite (referential integrity, range, " +
        "uniqueness, non-blank, domain membership) as one report: each " +
        "rule is a single aggregate or broadcast anti-join over its " +
        "table, all map-side combinable, unioned into a (rule, " +
        "violations, checked) gate table. The pre-promotion check a " +
        "production ingest runs on every snapshot; rules are data, so " +
        "extending the suite is appending a row, not new plumbing."),
  )
}
