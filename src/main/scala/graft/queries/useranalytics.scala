package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** User-level analytics completing the behavioral family: winsorized
  * robust statistics, churn labeling, RFM segmentation, and the
  * time-bounded funnel variant.  Each is the labeling / feature side of
  * a training pipeline over usage logs (the reference's sweep logs are
  * exactly such an event stream, train_adapters/create_all_models.py:48-76).
  */
object UserAnalyticsQueries {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------ winsorization
    QueryDef(
      "winsorize_lengths",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("n_chars"))
        val bounds = docs.groupBy(col("lang")).agg(
          expr("percentile(n_chars, 0.05)").as("p05"),
          expr("percentile(n_chars, 0.95)").as("p95"))
        docs.join(broadcast(bounds), "lang")
          .select(col("doc_id"), col("lang"), col("n_chars"),
            // clamp into [ceil(p05), floor(p95)] — integer-exact bounds
            // from the interpolated percentiles (bit-identical doubles)
            greatest(least(col("n_chars"),
              floor(col("p95")).cast("long")),
              ceil(col("p05")).cast("long")).as("clamped"))
          .filter(col("clamped") =!= col("n_chars"))
      },
      Some("""WITH bounds AS (SELECT lang,
        |    quantile_cont(n_chars, 0.05) AS p05,
        |    quantile_cont(n_chars, 0.95) AS p95
        |  FROM documents GROUP BY lang)
        |SELECT d.doc_id, d.lang, d.n_chars,
        |  greatest(least(d.n_chars, floor(b.p95)::BIGINT),
        |           ceil(b.p05)::BIGINT) AS clamped
        |FROM documents d JOIN bounds b USING (lang)
        |WHERE greatest(least(d.n_chars, floor(b.p95)::BIGINT),
        |               ceil(b.p05)::BIGINT) <> d.n_chars""".stripMargin),
      "Winsorization: clamp the length tail into [p5, p95] per language " +
        "instead of dropping it (length_outlier_filter is the removal " +
        "variant; winsorizing preserves row count for paired data). " +
        "Exact interpolated percentiles on integers, integer clamp, " +
        "5-row bounds broadcast — and at 100 TB the percentile agg " +
        "swaps to approx_percentile with everything downstream intact."),

    // ------------------------------------------------ churn labels
    QueryDef(
      "churn_labels",
      (s, d) => {
        val horizon = Tables.events(s, d)
          .agg(max(unix_micros(col("ts"))).as("horizon_us"))
        Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(max(unix_micros(col("ts"))).as("last_seen_us"),
            count(lit(1)).as("n_events"))
          .crossJoin(broadcast(horizon))
          .select(col("user_id"), col("n_events"),
            expr("(horizon_us - last_seen_us) div 86400000000")
              .as("days_silent"),
            (expr("(horizon_us - last_seen_us) div 86400000000") >= 7)
              .as("churned"))
      },
      Some("""WITH h AS (SELECT max(epoch_us(ts::TIMESTAMP)) AS horizon_us
        |        FROM events),
        |u AS (SELECT user_id, max(epoch_us(ts::TIMESTAMP)) AS last_seen_us,
        |        count(*)::BIGINT AS n_events
        |      FROM events GROUP BY user_id)
        |SELECT u.user_id, u.n_events,
        |  ((h.horizon_us - u.last_seen_us) // 86400000000)::BIGINT
        |    AS days_silent,
        |  ((h.horizon_us - u.last_seen_us) // 86400000000) >= 7 AS churned
        |FROM u CROSS JOIN h""".stripMargin),
      "Churn labeling relative to the observation horizon (max event " +
        "time): a user is churned after 7 silent days — the label-" +
        "generation step for retention models, computed from the data's " +
        "own horizon so backfills are reproducible (wall-clock now() " +
        "would make the label depend on run time). One user-level agg " +
        "+ a 1-row broadcast; integer day arithmetic."),

    // ------------------------------------------- RFM segmentation
    QueryDef(
      "rfm_segmentation",
      (s, d) => {
        val horizon = Tables.events(s, d)
          .agg(max(unix_micros(col("ts"))).as("horizon_us"))
        val rfm = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(max(unix_micros(col("ts"))).as("last_us"),
            count(lit(1)).as("frequency"),
            sum(floor(col("value") * 100).cast("long")).as("monetary_e2"))
          .crossJoin(broadcast(horizon))
          .withColumn("recency_days",
            expr("(horizon_us - last_us) div 86400000000"))
        // user count is unbounded at 100 TB: each quintile is exact
        // ntile(5) arithmetic on a ScalableIndex dense rank (three
        // chained range-partitioned passes, one per axis — no global
        // ntile window ever materializes the user table on one task)
        val n = Tables.events(s, d).select(col("user_id")).distinct().count()
        val q = n / 5
        val rr = n % 5
        val bucket =
          if (q == 0L) "idx + 1"
          else s"if(idx < ${rr * (q + 1)}L, idx div ${q + 1}L, " +
            s"$rr + (idx - ${rr * (q + 1)}L) div ${q}L) + 1"
        def tile(df: org.apache.spark.sql.DataFrame, order: Seq[Column],
            name: String) =
          graft.operators.ScalableIndex.withDenseIndex(df, order, 8, "idx")
            .withColumn(name, expr(s"cast($bucket AS bigint)"))
            .drop("idx")
        val scored = tile(tile(tile(rfm,
            Seq(col("recency_days"), col("user_id")), "r"),
            Seq(col("frequency").desc, col("user_id")), "f"),
            Seq(col("monetary_e2").desc, col("user_id")), "m")
        scored.select(col("user_id"), col("recency_days"),
          col("frequency"), col("monetary_e2"),
          (col("r") * 100 + col("f") * 10 + col("m")).as("rfm_code"))
      },
      Some("""WITH h AS (SELECT max(epoch_us(ts::TIMESTAMP)) AS horizon_us
        |        FROM events),
        |rfm AS (SELECT user_id,
        |    ((h.horizon_us - max(epoch_us(ts::TIMESTAMP))) // 86400000000)
        |      ::BIGINT AS recency_days,
        |    count(*)::BIGINT AS frequency,
        |    sum(floor(value * 100)::BIGINT)::BIGINT AS monetary_e2
        |  FROM events CROSS JOIN h
        |  GROUP BY user_id, h.horizon_us),
        |scored AS (SELECT user_id, recency_days, frequency, monetary_e2,
        |    ntile(5) OVER (ORDER BY recency_days, user_id)::BIGINT AS r,
        |    ntile(5) OVER (ORDER BY frequency DESC, user_id)::BIGINT AS f,
        |    ntile(5) OVER (ORDER BY monetary_e2 DESC, user_id)::BIGINT AS m
        |  FROM rfm)
        |SELECT user_id, recency_days, frequency, monetary_e2,
        |  (r * 100 + f * 10 + m)::BIGINT AS rfm_code
        |FROM scored""".stripMargin),
      "RFM segmentation: recency/frequency/monetary quintiles coded " +
        "into a 3-digit segment (111 = best across all three axes " +
        "under this coding: most recent, most frequent, highest " +
        "spend). The quintile windows rank USER-level aggregates " +
        "(one row per user), with deterministic user_id tie-break; at " +
        "100 TB user count the three global ntiles become " +
        "range-partitioned ranks or approx-quantile bucket joins, " +
        "same downstream coding."),

    // --------------------------------------- time-bounded funnel
    QueryDef(
      "funnel_time_bound",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        // first qualifying predecessor times per user, carried forward
        val staged = Tables.events(s, d)
          .withColumn("click_us", min(
            when(col("event_type") === "click", unix_micros(col("ts"))))
            .over(w))
          .withColumn("view_after_click_us", min(
            when(col("event_type") === "view", unix_micros(col("ts"))))
            .over(w))
        val conversions = staged
          .filter(col("event_type") === "purchase" &&
            col("click_us").isNotNull &&
            col("view_after_click_us").isNotNull &&
            col("view_after_click_us") > col("click_us") &&
            unix_micros(col("ts")) - col("click_us") <= 86400000000L)
        conversions.agg(
          count(lit(1)).as("n_conversions"),
          countDistinct(col("user_id")).as("n_users"),
          min(expr("(unix_micros(ts) - click_us) div 1000000"))
            .as("fastest_secs"),
          max(expr("(unix_micros(ts) - click_us) div 1000000"))
            .as("slowest_secs"))
      },
      Some("""WITH staged AS (SELECT event_id, user_id, event_type, ts,
        |    min(CASE WHEN event_type = 'click'
        |             THEN epoch_us(ts::TIMESTAMP) END) OVER w AS click_us,
        |    min(CASE WHEN event_type = 'view'
        |             THEN epoch_us(ts::TIMESTAMP) END) OVER w AS view_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |conv AS (SELECT user_id, epoch_us(ts::TIMESTAMP) - click_us AS lat_us
        |  FROM staged
        |  WHERE event_type = 'purchase' AND click_us IS NOT NULL
        |    AND view_us IS NOT NULL AND view_us > click_us
        |    AND epoch_us(ts::TIMESTAMP) - click_us <= 86400000000)
        |SELECT count(*)::BIGINT AS n_conversions,
        |  count(DISTINCT user_id)::BIGINT AS n_users,
        |  min(lat_us // 1000000)::BIGINT AS fastest_secs,
        |  max(lat_us // 1000000)::BIGINT AS slowest_secs
        |FROM conv""".stripMargin),
      "Time-bounded strict funnel (click -> view -> purchase inside " +
        "24 h): funnel_conversion checks order only; this adds the " +
        "completion deadline real funnel reports use, via conditional " +
        "running-min times over one user window — no self-joins, no " +
        "per-step passes, deadline checked in the same projection. " +
        "Window is per-user, so the operator partitions cleanly at " +
        "any event volume."),

    // --------------------------------------- seasonality profile
    QueryDef(
      "seasonality_profile",
      (s, d) => {
        val marked = Tables.events(s, d).select(
          (dayofweek(col("ts")) - 1).cast("long").as("dow"), // 0 = Sunday
          hour(col("ts")).cast("long").as("hod"))
        marked.groupBy(col("dow"), col("hod"))
          .agg(count(lit(1)).as("n"))
          .withColumn("total", sum(col("n")).over(
            org.apache.spark.sql.expressions.Window.partitionBy()))
          .select(col("dow"), col("hod"), col("n"),
            expr("(100000 * n) div total").as("share_e5"))
      },
      Some("""WITH marked AS (SELECT dayofweek(ts)::BIGINT AS dow,
        |        hour(ts)::BIGINT AS hod FROM events),
        |g AS (SELECT dow, hod, count(*)::BIGINT AS n
        |      FROM marked GROUP BY dow, hod)
        |SELECT dow, hod, n,
        |  ((100000 * n) // sum(n) OVER ())::BIGINT AS share_e5
        |FROM g""".stripMargin),
      "Seasonality profile: event mass by (day-of-week, hour-of-day) " +
        "with exact integer shares — the calendar fingerprint that " +
        "detects ingest gaps and drives window sizing (Spark's " +
        "dayofweek is 1-based Sunday, DuckDB's 0-based; the engine " +
        "normalizes to 0 = Sunday, both under the session's UTC " +
        "clock). One partial-agg over at most 168 keys; the share " +
        "window runs on those 168 rows, not events."),

    // --------------------------------------- churn hazard table
    QueryDef(
      "churn_hazard_table",
      (s, d) => {
        val horizon = Tables.events(s, d)
          .agg(max(unix_micros(col("ts"))).as("horizon_us"))
        val silent = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(max(unix_micros(col("ts"))).as("last_us"))
          .crossJoin(broadcast(horizon))
          .select(expr("(horizon_us - last_us) div 86400000000")
            .as("days_silent"))
        val byDay = silent.groupBy(col("days_silent"))
          .agg(count(lit(1)).as("n_exit"))
        // at risk at day t = users whose silence reached t (suffix sum)
        byDay
          .withColumn("n_at_risk", sum(col("n_exit")).over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("days_silent").desc)
              .rowsBetween(org.apache.spark.sql.expressions.Window
                .unboundedPreceding, org.apache.spark.sql.expressions.Window
                .currentRow)))
          .select(col("days_silent"), col("n_at_risk"), col("n_exit"),
            expr("(1000 * n_exit) div n_at_risk").as("hazard_permille"))
      },
      Some("""WITH h AS (SELECT max(epoch_us(ts::TIMESTAMP)) AS horizon_us
        |        FROM events),
        |silent AS (SELECT
        |    ((h.horizon_us - max(epoch_us(ts::TIMESTAMP))) // 86400000000)
        |      ::BIGINT AS days_silent
        |  FROM events CROSS JOIN h GROUP BY user_id, h.horizon_us),
        |byday AS (SELECT days_silent, count(*)::BIGINT AS n_exit
        |          FROM silent GROUP BY days_silent)
        |SELECT days_silent,
        |  sum(n_exit) OVER (ORDER BY days_silent DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |    AS n_at_risk,
        |  n_exit,
        |  ((1000 * n_exit) // sum(n_exit) OVER (ORDER BY days_silent DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
        |    AS hazard_permille
        |FROM byday""".stripMargin),
      "Discrete-time churn hazard table: users grouped by final " +
        "silence duration, at-risk counts via a suffix sum over the " +
        "day axis, hazard = exits/at-risk per day — the life-table " +
        "form of survival analysis whose Kaplan-Meier curve is the " +
        "running product downstream (kept out of the engine contract " +
        "because float cumulative products are order-sensitive; the " +
        "hazard column is exact integer). Day-axis cardinality is " +
        "bounded by the observation span, so the window is tiny at " +
        "any user count."),
  )
}
