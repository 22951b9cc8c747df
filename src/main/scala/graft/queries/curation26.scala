package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 20: sequential time-series operators — exponential-smoothing
  * forecasts, survival curves, and changepoint detection over the event
  * log.  Each recurrence is an exact integer fold (e6/e3 fixed point,
  * portable floor-division) so Spark's array-fold and DuckDB's recursive
  * CTE produce bit-identical trajectories; the per-series state is
  * O(days), never O(events), which is what makes these viable as a
  * reduce step over a 100 TB log.
  */
object Curation26Queries {

  /** Portable floor(x/2): Spark `%` and DuckDB `%` are both
    * truncation-signed, so subtracting the canonical non-negative
    * remainder first makes the halving exact for either sign. */
  private def f2k(x: String) = s"((($x) - ((($x) % 2 + 2) % 2)) div 2)"
  private def f2d(x: String) = s"((($x) - ((($x) % 2 + 2) % 2)) // 2)"

  /** Zero-filled per-(event_type, day-index) daily counts. */
  private[queries] def typedDaily(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"))
    val bounds = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = bounds.select(
      explode(sequence(col("d0"), col("d1"))).as("day"), col("d0"))
    val types = ev.select(col("event_type")).distinct()
    val daily = ev.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
    types.crossJoin(broadcast(spine))
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"),
        datediff(col("day"), col("d0")).cast("long").as("di"),
        coalesce(col("n"), lit(0L)).as("cnt"))
  }

  private[queries] val typedDailySql =
    """days AS (SELECT event_type, ts::DATE AS day FROM events),
      |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM days),
      |spine AS (SELECT d0 + (i.i::INT) AS day, d0
      |  FROM bounds, (SELECT range AS i FROM range(0, 4096)) i
      |  WHERE d0 + (i.i::INT) <= d1),
      |types AS (SELECT DISTINCT event_type FROM days),
      |daily AS (SELECT event_type, day, count(*)::BIGINT AS n
      |          FROM days GROUP BY 1, 2),
      |series AS (SELECT t.event_type, (s.day - s.d0)::BIGINT AS di,
      |    coalesce(daily.n, 0)::BIGINT AS cnt
      |  FROM types t CROSS JOIN spine s
      |  LEFT JOIN daily ON daily.event_type = t.event_type
      |                 AND daily.day = s.day)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------ Holt linear trend
    QueryDef(
      "holt_linear_forecast",
      (s, d) => {
        val lNew = f2k("x * 1000000 + acc.l + acc.b")
        val bNew = f2k(s"$lNew - acc.l + acc.b")
        typedDaily(s, d)
          .groupBy(col("event_type"))
          .agg(sort_array(collect_list(struct(col("di"), col("cnt"))))
            .as("pairs"))
          .withColumn("cnts", expr("transform(pairs, e -> e.cnt)"))
          .withColumn("st", expr(
            s"""aggregate(slice(cnts, 3, size(cnts)),
               |  named_struct(
               |    'l', element_at(cnts, 1) * 1000000,
               |    'b', (element_at(cnts, 2) - element_at(cnts, 1)) * 1000000),
               |  (acc, x) -> named_struct('l', $lNew, 'b', $bNew))""".stripMargin))
          .select(col("event_type"),
            col("st.l").as("level_e6"), col("st.b").as("trend_e6"),
            (col("st.l") + col("st.b")).as("fc1_e6"),
            (col("st.l") + lit(2L) * col("st.b")).as("fc2_e6"),
            (col("st.l") + lit(3L) * col("st.b")).as("fc3_e6"))
      },
      Some {
        val lNew = f2d("s.cnt * 1000000 + r.l + r.b")
        val bNew = f2d(s"$lNew - r.l + r.b")
        s"""WITH RECURSIVE $typedDailySql,
           |nd AS (SELECT max(di) AS tmax FROM series),
           |rec AS (
           |  SELECT s0.event_type, 1::BIGINT AS t,
           |    (s0.cnt * 1000000)::BIGINT AS l,
           |    ((s1.cnt - s0.cnt) * 1000000)::BIGINT AS b
           |  FROM series s0
           |  JOIN series s1 ON s1.event_type = s0.event_type AND s1.di = 1
           |  WHERE s0.di = 0
           |  UNION ALL
           |  SELECT r.event_type, r.t + 1,
           |    ($lNew)::BIGINT, ($bNew)::BIGINT
           |  FROM rec r JOIN series s
           |    ON s.event_type = r.event_type AND s.di = r.t + 1)
           |SELECT event_type, l AS level_e6, b AS trend_e6,
           |  (l + b)::BIGINT AS fc1_e6, (l + 2 * b)::BIGINT AS fc2_e6,
           |  (l + 3 * b)::BIGINT AS fc3_e6
           |FROM rec, nd WHERE t = tmax""".stripMargin
      },
      "Holt's linear-trend exponential smoothing (alpha = beta = 1/2) " +
        "over zero-filled daily counts per event type, with a 3-day " +
        "forecast. The level/trend recurrence runs in e6 fixed point " +
        "with an explicit canonical-remainder floor-halving, so the " +
        "whole trajectory is exact integer arithmetic — Spark's " +
        "array fold and the oracle's recursive CTE agree bit-for-bit. " +
        "Per-series state is two longs regardless of history length: " +
        "the daily pre-aggregation does the 100 TB work, the fold " +
        "touches O(days) rows."),

    // ------------------------------------------- Kaplan-Meier retention
    QueryDef(
      "kaplan_meier_retention",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            to_date(col("ts")).as("day"))
        val u = ev.groupBy(col("user_id"))
          .agg(min(col("day")).as("firstd"),
            min(when(col("event_type") === "purchase", col("day")))
              .as("purd"))
        val h = ev.agg(max(col("day")).as("hday"))
        val lab = u.crossJoin(broadcast(h))
          .select(
            when(col("purd").isNotNull,
              datediff(col("purd"), col("firstd")))
              .otherwise(datediff(col("hday"), col("firstd")))
              .cast("long").as("dur"),
            when(col("purd").isNotNull, 1L).otherwise(0L).as("ev"))
        val times = lab.groupBy(col("dur").as("t"))
          .agg(sum(col("ev")).as("d"), count(lit(1)).as("c"))
        val tot = lab.agg(count(lit(1)).as("n_total"))
        val wAll = Window.orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val tt = times
          .withColumn("cumc", coalesce(sum(col("c")).over(wAll), lit(0L)))
          .crossJoin(broadcast(tot))
          .select(col("t"), col("d"), (col("n_total") - col("cumc")).as("n"))
          .filter(col("d") > 0)
        tt.groupBy()
          .agg(sort_array(collect_list(struct(col("t"), col("d"),
            col("n")))).as("arr"))
          .withColumn("steps", expr(
            """aggregate(arr,
              |  cast(array() as array<struct<t:bigint,d:bigint,n:bigint,s:bigint>>),
              |  (acc, x) -> concat(acc, array(named_struct(
              |    't', x.t, 'd', x.d, 'n', x.n,
              |    's', (if(size(acc) = 0, 1000000L,
              |            element_at(acc, size(acc)).s)
              |          * (x.n - x.d)) div x.n))))""".stripMargin))
          .select(explode(col("steps")).as("st"))
          .select(col("st.t").as("t_day"), col("st.n").as("n_at_risk"),
            col("st.d").as("d_churned"), col("st.s").as("surv_e6"))
      },
      Some("""WITH RECURSIVE ud AS (SELECT user_id, event_type,
        |        ts::DATE AS day FROM events),
        |u AS (SELECT user_id, min(day) AS firstd,
        |        min(CASE WHEN event_type = 'purchase' THEN day END) AS purd
        |      FROM ud GROUP BY user_id),
        |h AS (SELECT max(day) AS hday FROM ud),
        |lab AS (SELECT
        |    CASE WHEN purd IS NOT NULL THEN (purd - firstd)
        |         ELSE (hday - firstd) END::BIGINT AS dur,
        |    CASE WHEN purd IS NOT NULL THEN 1 ELSE 0 END::BIGINT AS ev
        |  FROM u, h),
        |times AS (SELECT dur AS t, sum(ev)::BIGINT AS d,
        |    count(*)::BIGINT AS c FROM lab GROUP BY dur),
        |tot AS (SELECT count(*)::BIGINT AS n_total FROM lab),
        |tt AS (SELECT t, d,
        |    (n_total - coalesce(sum(c) OVER (ORDER BY t
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT
        |      AS n
        |  FROM times, tot),
        |evt AS (SELECT t, d, n, row_number() OVER (ORDER BY t) AS rn
        |        FROM tt WHERE d > 0),
        |rec AS (
        |  SELECT t, d, n, rn, ((1000000 * (n - d)) // n)::BIGINT AS s
        |  FROM evt WHERE rn = 1
        |  UNION ALL
        |  SELECT e.t, e.d, e.n, e.rn, ((r.s * (e.n - e.d)) // e.n)::BIGINT
        |  FROM rec r JOIN evt e ON e.rn = r.rn + 1)
        |SELECT t AS t_day, n AS n_at_risk, d AS d_churned, s AS surv_e6
        |FROM rec""".stripMargin),
      "Kaplan-Meier time-to-conversion curve: duration = days from a " +
        "user's first event to their first purchase; users who never " +
        "purchase before the data horizon are right-CENSORED (they " +
        "leave the risk set without counting as converted) — the " +
        "estimator funnel dashboards should use instead of naive " +
        "ratios, which silently treat censored users as converted-" +
        "never.  The product-limit S(t) multiplies (n-d)/n per event " +
        "time in e6 integer steps; at-risk counts come from one " +
        "suffix-sum window, so the whole curve is two tiny shuffles " +
        "on top of the per-user agg."),

    // ------------------------------------------- batch CUSUM changepoint
    QueryDef(
      "cusum_changepoint_batch",
      (s, d) => {
        val daily = typedDaily(s, d)
          .groupBy(col("di")).agg(sum(col("cnt")).as("cnt"))
        val params = daily.filter(col("di") < 7)
          .agg(sum(col("cnt")).as("c7"))
          .select(expr("(c7 * 1000) div 7").as("ref_e3"))
          .select(col("ref_e3"), expr("ref_e3 div 20").as("slack_e3"),
            expr("ref_e3 div 2").as("thr_e3"))
        daily.groupBy()
          .agg(sort_array(collect_list(struct(col("di"),
            (col("cnt") * 1000L).as("x")))).as("arr"))
          .crossJoin(broadcast(params))
          .withColumn("steps", expr(
            """aggregate(arr,
              |  cast(array() as
              |    array<struct<di:bigint,x:bigint,s:bigint,alarm:bigint,carry:bigint>>),
              |  (acc, e) -> concat(acc, array(
              |    named_struct(
              |      'di', e.di, 'x', e.x,
              |      's', greatest(0L,
              |        if(size(acc) = 0, 0L, element_at(acc, size(acc)).carry)
              |          + e.x - ref_e3 - slack_e3),
              |      'alarm', if(greatest(0L,
              |        if(size(acc) = 0, 0L, element_at(acc, size(acc)).carry)
              |          + e.x - ref_e3 - slack_e3) > thr_e3, 1L, 0L),
              |      'carry', if(greatest(0L,
              |        if(size(acc) = 0, 0L, element_at(acc, size(acc)).carry)
              |          + e.x - ref_e3 - slack_e3) > thr_e3, 0L,
              |        greatest(0L,
              |          if(size(acc) = 0, 0L, element_at(acc, size(acc)).carry)
              |            + e.x - ref_e3 - slack_e3))))))""".stripMargin))
          .select(explode(col("steps")).as("st"))
          .select(col("st.di").as("di"), col("st.x").as("x_e3"),
            col("st.s").as("s_e3"), col("st.alarm").as("alarm"))
      },
      Some(s"""WITH RECURSIVE $typedDailySql,
        |dtot AS (SELECT di, sum(cnt)::BIGINT AS cnt
        |          FROM series GROUP BY di),
        |params AS (SELECT ((sum(cnt) * 1000) // 7)::BIGINT AS ref_e3
        |           FROM dtot WHERE di < 7),
        |p AS (SELECT ref_e3, (ref_e3 // 20)::BIGINT AS slack_e3,
        |             (ref_e3 // 2)::BIGINT AS thr_e3 FROM params),
        |rec AS (
        |  SELECT d.di, (d.cnt * 1000)::BIGINT AS x,
        |    greatest(0, d.cnt * 1000 - p.ref_e3 - p.slack_e3)::BIGINT AS s,
        |    CASE WHEN greatest(0, d.cnt * 1000 - p.ref_e3 - p.slack_e3)
        |              > p.thr_e3 THEN 1 ELSE 0 END::BIGINT AS alarm,
        |    CASE WHEN greatest(0, d.cnt * 1000 - p.ref_e3 - p.slack_e3)
        |              > p.thr_e3 THEN 0
        |         ELSE greatest(0, d.cnt * 1000 - p.ref_e3 - p.slack_e3)
        |         END::BIGINT AS carry
        |  FROM dtot d, p WHERE d.di = 0
        |  UNION ALL
        |  SELECT d.di, (d.cnt * 1000)::BIGINT,
        |    greatest(0, r.carry + d.cnt * 1000 - p.ref_e3 - p.slack_e3)::BIGINT,
        |    CASE WHEN greatest(0, r.carry + d.cnt * 1000 - p.ref_e3
        |              - p.slack_e3) > p.thr_e3 THEN 1 ELSE 0 END::BIGINT,
        |    CASE WHEN greatest(0, r.carry + d.cnt * 1000 - p.ref_e3
        |              - p.slack_e3) > p.thr_e3 THEN 0
        |         ELSE greatest(0, r.carry + d.cnt * 1000 - p.ref_e3
        |              - p.slack_e3) END::BIGINT
        |  FROM rec r JOIN dtot d ON d.di = r.di + 1, p)
        |SELECT di, x AS x_e3, s AS s_e3, alarm FROM rec""".stripMargin),
      "Batch CUSUM changepoint detection over total daily volume: " +
        "S_t = max(0, S_{t-1} + x_t - ref - slack) with ref = the first " +
        "week's mean (e3 fixed point), slack = 5% and threshold = 50% " +
        "of ref, alarm-and-reset semantics identical to the streaming " +
        "twin Streams.cusumDrift — the batch backfill and the live " +
        "monitor provably compute the same alarms.  One day-level " +
        "pre-agg does all the heavy lifting; the fold is O(days)."),

    // --------------------------------------------- seasonal-naive skill
    QueryDef(
      "seasonal_naive_eval",
      (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
        typedDaily(s, d)
          .withColumn("lag7", lag(col("cnt"), 7).over(w))
          .withColumn("lag1", lag(col("cnt"), 1).over(w))
          .filter(col("di") >= 7)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_scored"),
            sum(abs(col("cnt") - col("lag7"))).as("sae_seasonal"),
            sum(abs(col("cnt") - col("lag1"))).as("sae_naive"))
          .withColumn("skill_permille",
            expr("(1000 * sae_seasonal) div greatest(sae_naive, 1)"))
      },
      Some(s"""WITH $typedDailySql,
        |lagged AS (SELECT event_type, di, cnt,
        |    lag(cnt, 7) OVER (PARTITION BY event_type ORDER BY di) AS lag7,
        |    lag(cnt, 1) OVER (PARTITION BY event_type ORDER BY di) AS lag1
        |  FROM series)
        |SELECT event_type, count(*)::BIGINT AS n_scored,
        |  sum(abs(cnt - lag7))::BIGINT AS sae_seasonal,
        |  sum(abs(cnt - lag1))::BIGINT AS sae_naive,
        |  ((1000 * sum(abs(cnt - lag7))) //
        |    greatest(sum(abs(cnt - lag1)), 1))::BIGINT AS skill_permille
        |FROM lagged WHERE di >= 7 GROUP BY event_type""".stripMargin),
      "Seasonal-naive forecast evaluation: predict each day's count per " +
        "event type from the same weekday last week (lag 7) and score " +
        "absolute error against the persistence baseline (lag 1); " +
        "skill_permille < 1000 means weekly seasonality carries real " +
        "signal.  This is the sanity gate that should run BEFORE " +
        "shipping any fancier forecaster — two lag windows over the " +
        "day-level aggregate, nothing touches raw events twice."),
  )
}
