package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 30: growth-analytics operators over the event log — activity
  * depth curves, usage concentration, new-vs-returning decomposition,
  * and weekday-baseline anomaly flags.  Per-user and per-day state
  * only; the raw log is scanned once per query.
  */
object Curation36Queries {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------ power-user curve
    QueryDef(
      "power_user_curve",
      (s, d) => {
        val activeDays = Tables.events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_active_days"))
        val hist = activeDays.groupBy(col("n_active_days"))
          .agg(count(lit(1)).as("n_users"))
        val tot = activeDays.agg(count(lit(1)).as("n_total"))
        hist.crossJoin(broadcast(tot))
          .withColumn("cum_users", sum(col("n_users")).over(
            Window.orderBy(col("n_active_days").desc)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("n_active_days"), col("n_users"),
            expr("(1000 * cum_users) div n_total")
              .as("at_least_permille"))
      },
      Some("""WITH ad AS (SELECT user_id, count(*)::BIGINT AS n_active_days
        |  FROM (SELECT DISTINCT user_id, ts::DATE AS day FROM events)
        |  GROUP BY user_id),
        |hist AS (SELECT n_active_days, count(*)::BIGINT AS n_users
        |         FROM ad GROUP BY 1),
        |tot AS (SELECT count(*)::BIGINT AS n_total FROM ad)
        |SELECT n_active_days, n_users,
        |  ((1000 * sum(n_users) OVER (ORDER BY n_active_days DESC
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |   // tot.n_total)::BIGINT AS at_least_permille
        |FROM hist, tot""".stripMargin),
      "Power-user curve (the L28-style engagement histogram): users " +
        "bucketed by distinct active days, with the survival form " +
        "'share of users active at least N days'.  The shape of this " +
        "curve — smile vs decay — is the standard engagement-quality " +
        "diagnostic; computing it is two tiny aggs on (user, day) " +
        "distinct pairs."),

    // ------------------------------------------- usage concentration
    QueryDef(
      "lorenz_user_concentration",
      (s, d) => {
        val perUser = Tables.events(s, d)
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
        val tot = perUser.agg(sum(col("n_events")).as("ev_total"),
          count(lit(1)).as("u_total"))
        // global volume rank via ScalableIndex (range partition on the
        // (n_events desc, user_id) order + per-partition offsets), not an
        // unpartitioned row_number window: the rank input is the per-user
        // aggregate, unbounded at 100 TB. idx is the 0-based row_number-1.
        val ranked = graft.operators.ScalableIndex
          .withDenseIndex(perUser,
            Seq(col("n_events").desc, col("user_id")), 8, "idx")
          .crossJoin(broadcast(tot.select(col("u_total"))))
          .withColumn("dec", expr("(idx * 10) div u_total + 1"))
        ranked.groupBy(col("dec"))
          .agg(count(lit(1)).as("n_users"), sum(col("n_events")).as("ev"))
          .crossJoin(broadcast(tot))
          .withColumn("cum_ev", sum(col("ev")).over(
            Window.orderBy(col("dec"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("dec").as("decile"), col("n_users"),
            expr("(1000 * ev) div ev_total").as("share_permille"),
            expr("(1000 * cum_ev) div ev_total").as("cum_share_permille"))
      },
      Some("""WITH pu AS (SELECT user_id, count(*)::BIGINT AS n_events
        |  FROM events GROUP BY user_id),
        |rk AS (SELECT n_events,
        |    (((row_number() OVER (ORDER BY n_events DESC, user_id) - 1)
        |       * 10) // (count(*) OVER ()) + 1)::BIGINT AS dec
        |  FROM pu),
        |tot AS (SELECT sum(n_events)::BIGINT AS ev_total FROM pu),
        |db AS (SELECT dec, count(*)::BIGINT AS n_users,
        |         sum(n_events)::BIGINT AS ev FROM rk GROUP BY dec)
        |SELECT dec AS decile, n_users,
        |  ((1000 * ev) // tot.ev_total)::BIGINT AS share_permille,
        |  ((1000 * sum(ev) OVER (ORDER BY dec
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |   // tot.ev_total)::BIGINT AS cum_share_permille
        |FROM db, tot""".stripMargin),
      "Lorenz concentration of activity: users ranked by volume into " +
        "deciles (heaviest first), each decile's share and the " +
        "cumulative curve in permille.  'Top 10% of users generate " +
        "X% of events' read straight off decile 1 — the usage twin of " +
        "gini_length_concentration, and the table capacity planning " +
        "reads before per-user rate limits (Streams.rateLimiter) are " +
        "set."),

    // ----------------------------------------- new vs returning
    QueryDef(
      "new_vs_returning_daily",
      (s, d) => {
        val ud = Tables.events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        val firstDay = ud.groupBy(col("user_id"))
          .agg(min(col("day")).as("first_day"))
        ud.join(broadcast(firstDay), Seq("user_id"))
          .groupBy(col("day"))
          .agg(count(lit(1)).as("active_users"),
            sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
              .as("new_users"))
          .select(unix_micros(col("day").cast("timestamp")).as("day_us"),
            col("active_users"), col("new_users"),
            (col("active_users") - col("new_users")).as("returning_users"),
            expr("(1000 * new_users) div active_users")
              .as("new_share_permille"))
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id, ts::DATE AS day
        |        FROM events),
        |fd AS (SELECT user_id, min(day) AS first_day FROM ud
        |       GROUP BY user_id)
        |SELECT epoch_us(day::TIMESTAMP) AS day_us,
        |  count(*)::BIGINT AS active_users,
        |  sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)::BIGINT
        |    AS new_users,
        |  (count(*) - sum(CASE WHEN day = first_day THEN 1 ELSE 0 END))
        |    ::BIGINT AS returning_users,
        |  ((1000 * sum(CASE WHEN day = first_day THEN 1 ELSE 0 END))
        |   // count(*))::BIGINT AS new_share_permille
        |FROM ud JOIN fd USING (user_id)
        |GROUP BY day""".stripMargin),
      "Daily new-vs-returning decomposition: each active (user, day) " +
        "pair classified by whether the day is the user's first — the " +
        "growth-accounting split (acquisition vs retention) every DAU " +
        "chart should carry.  The first-day table is one agg and " +
        "broadcasts; at 100 TB it becomes the incrementally-maintained " +
        "user dimension and the daily pass stays a single scan."),

    // ------------------------------------- weekday-baseline anomaly
    QueryDef(
      "anomaly_dow_baseline",
      (s, d) => {
        val daily = Curation26Queries.typedDaily(s, d)
          .groupBy(col("di")).agg(sum(col("cnt")).as("cnt"))
          .withColumn("dow", pmod(col("di"), lit(7L)))
        val ranked = daily
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("dow"))
              .orderBy(col("cnt"), col("di"))).cast("long"))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy(col("dow"))))
        val med = ranked
          .groupBy(col("dow"))
          .agg(max(col("n")).as("n_days"),
            sum(when(col("rk") === expr("(n + 1) div 2") ||
              col("rk") === expr("(n + 2) div 2"), col("cnt"))
              .otherwise(0L)).as("med_x2_raw"))
          .withColumn("med_x2",
            when(expr("(n_days + 1) div 2 = (n_days + 2) div 2"),
              col("med_x2_raw") * 2).otherwise(col("med_x2_raw")))
          .select(col("dow"), col("n_days"), col("med_x2"))
        daily.join(broadcast(med), Seq("dow"))
          .select(col("di"), col("dow"), col("cnt"), col("med_x2"),
            when(col("cnt") * 4 > col("med_x2") * 3, 1L).otherwise(0L)
              .as("high_anomaly"),
            when(col("cnt") * 4 < col("med_x2"), 1L).otherwise(0L)
              .as("low_anomaly"))
      },
      Some(s"""WITH ${Curation26Queries.typedDailySql},
        |dtot2 AS (SELECT di, sum(cnt)::BIGINT AS cnt
        |          FROM series GROUP BY di),
        |dw AS (SELECT di, cnt, (di % 7)::BIGINT AS dow FROM dtot2),
        |rkd AS (SELECT *,
        |    row_number() OVER (PARTITION BY dow ORDER BY cnt, di)
        |      ::BIGINT AS rk,
        |    count(*) OVER (PARTITION BY dow)::BIGINT AS n
        |  FROM dw),
        |med AS (SELECT dow, max(n)::BIGINT AS n_days,
        |    (CASE WHEN (max(n) + 1) // 2 = (max(n) + 2) // 2
        |          THEN 2 * sum(CASE WHEN rk = (n + 1) // 2
        |                 OR rk = (n + 2) // 2 THEN cnt ELSE 0 END)
        |          ELSE sum(CASE WHEN rk = (n + 1) // 2
        |                 OR rk = (n + 2) // 2 THEN cnt ELSE 0 END)
        |     END)::BIGINT AS med_x2
        |  FROM rkd GROUP BY dow)
        |SELECT di, dw.dow, cnt, med_x2,
        |  CASE WHEN cnt * 4 > med_x2 * 3 THEN 1 ELSE 0 END::BIGINT
        |    AS high_anomaly,
        |  CASE WHEN cnt * 4 < med_x2 THEN 1 ELSE 0 END::BIGINT
        |    AS low_anomaly
        |FROM dw JOIN med ON med.dow = dw.dow""".stripMargin),
      "Weekday-baseline anomaly detection: each day's total volume " +
        "compared against the exact median for its day-of-week " +
        "(doubled-median integers; flags via cross-multiplication — " +
        "high if cnt > 1.5x median, low if cnt < 0.5x median).  " +
        "Calendar-conditioned baselines catch what trailing z-scores " +
        "(anomaly_zscore_trailing) miss: a normal Saturday looks like " +
        "a crashed Tuesday to any un-conditioned detector.  State is " +
        "7 medians."),
  )
}
