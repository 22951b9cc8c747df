package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 25: data-contract and pipeline-health monitors — schema-drift
  * profiling between snapshots, expectation-suite evaluation, event
  * disorder measurement (watermark tuning evidence), and freshness SLA
  * auditing.  These run as cheap scheduled gates in front of the heavy
  * operators: each is one or two aggregates whose state is bounded by
  * columns / expectations / users / event types, never raw rows.
  */
object Curation31Queries {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------ schema drift
    QueryDef(
      "schema_drift_detect",
      (s, d) => {
        val stacked = Tables.documents(s, d).selectExpr("doc_id",
          "stack(3, 'lang', lang, 'source', source, " +
            "'n_chars', cast(n_chars as string)) as (col_name, v)")
          .withColumn("snap", expr("doc_id % 2"))
        val topShare = stacked
          .groupBy(col("snap"), col("col_name"), col("v"))
          .agg(count(lit(1)).as("cv"))
          .withColumn("tot",
            sum(col("cv")).over(Window.partitionBy(col("snap"),
              col("col_name"))))
          .groupBy(col("snap"), col("col_name"))
          .agg(count(lit(1)).as("n_distinct"),
            max(expr("(1000 * cv) div tot")).as("top_share_pm"))
        val lens = stacked.groupBy(col("snap"), col("col_name"))
          .agg(count(lit(1)).as("n"),
            expr("(1000 * sum(octet_length(v))) div count(1)")
              .as("avg_len_e3"))
        val prof = topShare.join(lens, Seq("snap", "col_name"))
        val a = prof.filter(col("snap") === 0).drop("snap")
          .select(col("col_name"), col("n_distinct").as("distinct_a"),
            col("top_share_pm").as("top_share_a"), col("n").as("n_a"),
            col("avg_len_e3").as("avg_len_a"))
        val b = prof.filter(col("snap") === 1).drop("snap")
          .select(col("col_name"), col("n_distinct").as("distinct_b"),
            col("top_share_pm").as("top_share_b"), col("n").as("n_b"),
            col("avg_len_e3").as("avg_len_b"))
        a.join(b, Seq("col_name"))
          .withColumn("drift",
            when(abs(col("distinct_a") - col("distinct_b")) * 10 >
              col("distinct_a") ||
              abs(col("top_share_a") - col("top_share_b")) > 100, 1L)
              .otherwise(0L))
      },
      Some("""WITH stacked AS (
        |  SELECT doc_id % 2 AS snap, 'lang' AS col_name, lang AS v
        |    FROM documents
        |  UNION ALL SELECT doc_id % 2, 'source', source FROM documents
        |  UNION ALL SELECT doc_id % 2, 'n_chars', n_chars::VARCHAR
        |    FROM documents),
        |tv AS (SELECT snap, col_name, v, count(*)::BIGINT AS cv
        |       FROM stacked GROUP BY 1, 2, 3),
        |tv2 AS (SELECT snap, col_name, cv,
        |    ((1000 * cv) // sum(cv) OVER (PARTITION BY snap, col_name))
        |      ::BIGINT AS share
        |  FROM tv),
        |ts AS (SELECT snap, col_name, count(*)::BIGINT AS n_distinct,
        |    max(share)::BIGINT AS top_share_pm
        |  FROM tv2 GROUP BY snap, col_name),
        |ln AS (SELECT snap, col_name, count(*)::BIGINT AS n,
        |    ((1000 * sum(strlen(v))) // count(*))::BIGINT AS avg_len_e3
        |  FROM stacked GROUP BY 1, 2),
        |prof AS (SELECT ts.snap, ts.col_name, n_distinct, top_share_pm,
        |    n, avg_len_e3
        |  FROM ts JOIN ln ON ln.snap = ts.snap
        |                 AND ln.col_name = ts.col_name)
        |SELECT a.col_name,
        |  a.n_distinct AS distinct_a, a.top_share_pm AS top_share_a,
        |  a.n AS n_a, a.avg_len_e3 AS avg_len_a,
        |  b.n_distinct AS distinct_b, b.top_share_pm AS top_share_b,
        |  b.n AS n_b, b.avg_len_e3 AS avg_len_b,
        |  CASE WHEN abs(a.n_distinct - b.n_distinct) * 10 > a.n_distinct
        |         OR abs(a.top_share_pm - b.top_share_pm) > 100
        |       THEN 1 ELSE 0 END::BIGINT AS drift
        |FROM prof a JOIN prof b ON b.col_name = a.col_name
        |WHERE a.snap = 0 AND b.snap = 1""".stripMargin),
      "Schema-drift detection between two snapshots (parity split as " +
        "the stand-in for yesterday/today): per column, distinct " +
        "cardinality, modal-value share and mean width, with a drift " +
        "flag when cardinality moves >10% or the modal share shifts " +
        ">0.1.  This catches silently re-encoded categoricals and " +
        "upstream crawler changes BEFORE they poison training mixes — " +
        "per-column state only, so profiling 100 TB costs one pass."),

    // -------------------------------------------- expectation suite
    QueryDef(
      "expectation_suite_eval",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val n = docs.agg(count(lit(1)).as("n"))
        def exp1(name: String, failed: org.apache.spark.sql.Column) =
          docs.agg(count(lit(1)).as("n_checked"), failed.as("n_failed"))
            .select(lit(name).as("expectation"), col("n_checked"),
              col("n_failed"),
              when(col("n_failed") === 0, 1L).otherwise(0L).as("passed"))
        exp1("n_chars_range",
          sum(when(!col("n_chars").between(80, 2000), 1L).otherwise(0L)))
          .unionByName(exp1("lang_domain",
            sum(when(!col("lang").isin("en", "de", "fr", "es", "zh"), 1L)
              .otherwise(0L))))
          .unionByName(exp1("text_nonblank",
            sum(when(length(trim(col("text"))) === 0, 1L).otherwise(0L))))
          .unionByName(exp1("doc_id_unique",
            count(lit(1)) - countDistinct(col("doc_id"))))
          .unionByName(exp1("source_cardinality",
            when(countDistinct(col("source")) > 25,
              countDistinct(col("source")) - 25).otherwise(0L)))
      },
      Some("""SELECT 'n_chars_range' AS expectation,
        |  count(*)::BIGINT AS n_checked,
        |  sum(CASE WHEN n_chars NOT BETWEEN 80 AND 2000 THEN 1 ELSE 0
        |      END)::BIGINT AS n_failed,
        |  CASE WHEN sum(CASE WHEN n_chars NOT BETWEEN 80 AND 2000
        |       THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END::BIGINT AS passed
        |FROM documents
        |UNION ALL
        |SELECT 'lang_domain', count(*),
        |  sum(CASE WHEN lang NOT IN ('en','de','fr','es','zh')
        |      THEN 1 ELSE 0 END)::BIGINT,
        |  CASE WHEN sum(CASE WHEN lang NOT IN ('en','de','fr','es','zh')
        |       THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END::BIGINT
        |FROM documents
        |UNION ALL
        |SELECT 'text_nonblank', count(*),
        |  sum(CASE WHEN strlen(trim(text)) = 0 THEN 1 ELSE 0
        |      END)::BIGINT,
        |  CASE WHEN sum(CASE WHEN strlen(trim(text)) = 0 THEN 1 ELSE 0
        |       END) = 0 THEN 1 ELSE 0 END::BIGINT
        |FROM documents
        |UNION ALL
        |SELECT 'doc_id_unique', count(*),
        |  (count(*) - count(DISTINCT doc_id))::BIGINT,
        |  CASE WHEN count(*) = count(DISTINCT doc_id) THEN 1 ELSE 0
        |    END::BIGINT
        |FROM documents
        |UNION ALL
        |SELECT 'source_cardinality', count(*),
        |  CASE WHEN count(DISTINCT source) > 25
        |       THEN count(DISTINCT source) - 25 ELSE 0 END::BIGINT,
        |  CASE WHEN count(DISTINCT source) <= 25 THEN 1 ELSE 0
        |    END::BIGINT
        |FROM documents""".stripMargin),
      "Expectation-suite evaluation (the Great-Expectations shape): a " +
        "declared contract — range, domain, non-blank, uniqueness, " +
        "cardinality cap — evaluated in ONE scan with per-expectation " +
        "checked/failed counts and a pass verdict.  Complements " +
        "constraint_violations (which lists offending rows): the suite " +
        "row is what a pipeline gate consumes, the violation list is " +
        "what the debugging human reads."),

    // ------------------------------------------- event disorder metric
    QueryDef(
      "event_disorder_metric",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"))
        val byArrival = Window.partitionBy(col("user_id"))
          .orderBy(col("event_id"))
        val byTime = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        ev
          .withColumn("r_arr", row_number().over(byArrival).cast("long"))
          .withColumn("r_ts", row_number().over(byTime).cast("long"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(abs(col("r_arr") - col("r_ts"))).as("footrule"),
            max(abs(col("r_arr") - col("r_ts"))).as("max_displacement"))
          .withColumn("disorder_permille",
            expr("(1000 * footrule) div greatest((n_events * n_events) div 2, 1)"))
      },
      Some("""WITH ev AS (SELECT user_id, event_id,
        |    epoch_us(ts::TIMESTAMP) AS ts_us FROM events),
        |rk AS (SELECT user_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id)
        |      ::BIGINT AS r_arr,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id)::BIGINT AS r_ts
        |  FROM ev)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |  sum(abs(r_arr - r_ts))::BIGINT AS footrule,
        |  max(abs(r_arr - r_ts))::BIGINT AS max_displacement,
        |  ((1000 * sum(abs(r_arr - r_ts))) //
        |    greatest((count(*) * count(*)) // 2, 1))::BIGINT
        |    AS disorder_permille
        |FROM rk GROUP BY user_id""".stripMargin),
      "Event-stream disorder measurement: Spearman footrule between " +
        "arrival order (event_id) and event-time order per user, plus " +
        "the maximum rank displacement.  max_displacement is the " +
        "empirical answer to 'how big must the watermark be' (see " +
        "watermark_late_data / dropDuplicatesWithinWatermark): a " +
        "watermark that tolerates the observed displacement drops " +
        "nothing; the permille score trends shard-merge problems long " +
        "before data loss shows up.  Two windows per user partition, " +
        "O(1) agg state."),

    // ---------------------------------------------- freshness audit
    QueryDef(
      "freshness_lag_audit",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), unix_micros(col("ts")).as("ts_us"))
        val h = ev.agg(max(col("ts_us")).as("horizon_us"))
        ev.crossJoin(broadcast(h))
          .groupBy(col("event_type"))
          .agg(max(col("ts_us")).as("last_us"),
            count(lit(1)).as("n_total"),
            sum(when(col("ts_us") >= col("horizon_us") - 86400000000L, 1L)
              .otherwise(0L)).as("n_last_day"),
            max(col("horizon_us")).as("horizon_us"),
            min(col("ts_us")).as("first_us"))
          .select(col("event_type"), col("n_total"), col("n_last_day"),
            expr("(horizon_us - last_us) div 60000000").as("lag_minutes"),
            expr("""(1000 * n_last_day) div
              greatest(n_total div greatest((horizon_us - first_us)
                div 86400000000, 1), 1)""").as("volume_vs_daily_permille"),
            when(expr("(horizon_us - last_us) div 60000000") > 120, 1L)
              .otherwise(0L).as("stale"))
      },
      Some("""WITH ev AS (SELECT event_type,
        |    epoch_us(ts::TIMESTAMP) AS ts_us FROM events),
        |h AS (SELECT max(ts_us) AS horizon_us FROM ev),
        |agg AS (SELECT event_type, max(ts_us) AS last_us,
        |    count(*)::BIGINT AS n_total,
        |    sum(CASE WHEN ts_us >= horizon_us - 86400000000
        |        THEN 1 ELSE 0 END)::BIGINT AS n_last_day,
        |    max(horizon_us) AS horizon_us, min(ts_us) AS first_us
        |  FROM ev, h GROUP BY event_type)
        |SELECT event_type, n_total, n_last_day,
        |  ((horizon_us - last_us) // 60000000)::BIGINT AS lag_minutes,
        |  ((1000 * n_last_day) //
        |    greatest(n_total // greatest((horizon_us - first_us)
        |      // 86400000000, 1), 1))::BIGINT AS volume_vs_daily_permille,
        |  CASE WHEN (horizon_us - last_us) // 60000000 > 120
        |       THEN 1 ELSE 0 END::BIGINT AS stale
        |FROM agg""".stripMargin),
      "Per-stream freshness SLA audit against the data's own horizon: " +
        "minutes since the last event, last-day volume vs the historical " +
        "daily average (permille), and a staleness flag at 2 h.  Using " +
        "the data horizon instead of now() makes the audit reproducible " +
        "on backfills; the per-type agg is the entire state, so the " +
        "audit is free at any scale."),
  )
}
