package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 29: event-sequence mining — subsequence pattern support, per-
  * transition dwell times, absorbing-state detection, and weekly
  * autocorrelation strength.  The sequence substrate is the per-user
  * event stream; every operator reduces to (user x type) or
  * (type x type) state, so the mining passes survive event logs of any
  * depth.
  */
object Curation35Queries {

  val defs: Seq[QueryDef] = Seq(

    // ----------------------------------- subsequence pattern support
    QueryDef(
      "sequential_pattern_support",
      (s, d) => {
        val occ = Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .groupBy(col("user_id"), col("event_type"))
          .agg(min(col("us")).as("first_us"), max(col("us")).as("last_us"))
        val users = occ.select(col("user_id")).distinct()
          .agg(count(lit(1)).as("n_users"))
        occ.as("a")
          .join(occ.as("b"), col("a.user_id") === col("b.user_id") &&
            col("a.event_type") =!= col("b.event_type") &&
            col("a.first_us") < col("b.last_us"))
          .groupBy(col("a.event_type").as("src"),
            col("b.event_type").as("dst"))
          .agg(count(lit(1)).as("support"))
          .crossJoin(broadcast(users))
          .select(col("src"), col("dst"), col("support"),
            expr("(1000 * support) div n_users").as("support_permille"))
      },
      Some("""WITH occ AS (SELECT user_id, event_type,
        |    min(epoch_us(ts::TIMESTAMP)) AS first_us,
        |    max(epoch_us(ts::TIMESTAMP)) AS last_us
        |  FROM events GROUP BY 1, 2),
        |u AS (SELECT count(DISTINCT user_id)::BIGINT AS n_users FROM occ)
        |SELECT a.event_type AS src, b.event_type AS dst,
        |  count(*)::BIGINT AS support,
        |  ((1000 * count(*)) // max(u.n_users))::BIGINT
        |    AS support_permille
        |FROM occ a
        |JOIN occ b ON b.user_id = a.user_id
        |          AND b.event_type <> a.event_type
        |          AND a.first_us < b.last_us, u
        |GROUP BY 1, 2""".stripMargin),
      "Sequential-pattern support (PrefixSpan length-2): a user " +
        "supports pattern a->b iff some a-occurrence precedes some " +
        "b-occurrence, which reduces EXACTLY to first(a) < last(b) — " +
        "so the miner needs only the (user, type) first/last table, " +
        "never the raw sequences.  That reduction is what makes " +
        "2-sequence mining on a 100 TB event log a pair of aggs plus " +
        "a per-user type-pair join (bounded by |types|^2 per user)."),

    // -------------------------------------------- transition dwell
    QueryDef(
      "dwell_time_transition",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        val gaps = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("dst", lead(col("event_type"), 1).over(w))
          .withColumn("gap_s",
            expr("(lead(us, 1) over (partition by user_id " +
              "order by us, event_id) - us) div 1000000"))
          .filter(col("dst").isNotNull)
          .select(col("event_type").as("src"), col("dst"), col("gap_s"),
            col("event_id"))
        val ranked = gaps
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("src"), col("dst"))
              .orderBy(col("gap_s"), col("event_id"))).cast("long"))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy(col("src"), col("dst"))))
        ranked.groupBy(col("src"), col("dst"))
          .agg(max(col("n")).as("n_transitions"),
            min(col("gap_s")).as("min_gap_s"),
            max(col("gap_s")).as("max_gap_s"),
            sum(when(col("rk") === expr("(n + 1) div 2") ||
              col("rk") === expr("(n + 2) div 2"), col("gap_s"))
              .otherwise(0L)).as("median_gap_x2"))
          .withColumn("median_gap_x2",
            when(expr("(n_transitions + 1) div 2 = (n_transitions + 2) div 2"),
              col("median_gap_x2") * 2).otherwise(col("median_gap_x2")))
      },
      Some("""WITH ev AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts::TIMESTAMP) AS us FROM events),
        |gaps AS (SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) AS dst,
        |    ((lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      - us) // 1000000)::BIGINT AS gap_s,
        |    event_id
        |  FROM ev),
        |g2 AS (SELECT * FROM gaps WHERE dst IS NOT NULL),
        |rkd AS (SELECT src, dst, gap_s,
        |    row_number() OVER (PARTITION BY src, dst
        |      ORDER BY gap_s, event_id)::BIGINT AS rk,
        |    count(*) OVER (PARTITION BY src, dst)::BIGINT AS n
        |  FROM g2)
        |SELECT src, dst, max(n)::BIGINT AS n_transitions,
        |  min(gap_s)::BIGINT AS min_gap_s, max(gap_s)::BIGINT AS max_gap_s,
        |  (CASE WHEN (max(n) + 1) // 2 = (max(n) + 2) // 2
        |        THEN 2 * sum(CASE WHEN rk = (n + 1) // 2
        |               OR rk = (n + 2) // 2 THEN gap_s ELSE 0 END)
        |        ELSE sum(CASE WHEN rk = (n + 1) // 2
        |               OR rk = (n + 2) // 2 THEN gap_s ELSE 0 END)
        |   END)::BIGINT AS median_gap_x2
        |FROM rkd GROUP BY src, dst""".stripMargin),
      "Per-transition dwell-time profile: for each consecutive " +
        "(src -> dst) event pair, the gap distribution's min/max and " +
        "EXACT median (doubled so odd/even counts stay integer — the " +
        "two middle order statistics summed).  Long-dwell transitions " +
        "are where sessionization timeouts and UX funnels leak; the " +
        "per-pair median is robust against the heavy tail that " +
        "poisons mean-based dwell reports.  One lead window + one " +
        "rank window, both user/pair-partitioned."),

    // ---------------------------------------- absorbing-state audit
    QueryDef(
      "absorbing_state_audit",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        val trans = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("dst", lead(col("event_type"), 1).over(w))
          .filter(col("dst").isNotNull)
          .select(col("event_type").as("src"), col("dst"))
        val ends = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("us").desc, col("event_id").desc)))
          .filter(col("rn") === 1)
          .groupBy(col("event_type").as("src"))
          .agg(count(lit(1)).as("n_terminal"))
        trans.groupBy(col("src"))
          .agg(count(lit(1)).as("out_total"),
            sum(when(col("dst") === col("src"), 1L).otherwise(0L))
              .as("self_loops"),
            countDistinct(col("dst")).as("n_distinct_dst"))
          .join(ends, Seq("src"), "left")
          .select(col("src"), col("out_total"), col("self_loops"),
            col("n_distinct_dst"),
            coalesce(col("n_terminal"), lit(0L)).as("n_terminal"),
            expr("(1000 * self_loops) div out_total")
              .as("self_loop_permille"))
      },
      Some("""WITH ev AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts::TIMESTAMP) AS us FROM events),
        |tr AS (SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) AS dst
        |  FROM ev),
        |t2 AS (SELECT * FROM tr WHERE dst IS NOT NULL),
        |ends AS (SELECT event_type AS src, count(*)::BIGINT AS n_terminal
        |  FROM (SELECT event_type, row_number() OVER (
        |          PARTITION BY user_id ORDER BY us DESC, event_id DESC)
        |          AS rn FROM ev)
        |  WHERE rn = 1 GROUP BY 1)
        |SELECT t.src, count(*)::BIGINT AS out_total,
        |  sum(CASE WHEN dst = t.src THEN 1 ELSE 0 END)::BIGINT
        |    AS self_loops,
        |  count(DISTINCT dst)::BIGINT AS n_distinct_dst,
        |  coalesce(max(ends.n_terminal), 0)::BIGINT AS n_terminal,
        |  ((1000 * sum(CASE WHEN dst = t.src THEN 1 ELSE 0 END))
        |    // count(*))::BIGINT AS self_loop_permille
        |FROM t2 t LEFT JOIN ends ON ends.src = t.src
        |GROUP BY t.src""".stripMargin),
      "Absorbing-state audit of the event-type Markov chain: per " +
        "state, outgoing volume, self-loop share, fan-out cardinality, " +
        "and how many user journeys TERMINATE there.  States that " +
        "dominate terminations while self-looping are the chain's " +
        "absorbing set — in pipeline terms, where jobs get stuck; the " +
        "terminal-count join catches absorption that transition " +
        "probabilities alone miss (a rare state can still be where " +
        "everything ends)."),

    // ------------------------------------ weekly autocorrelation
    QueryDef(
      "weekly_autocorr_strength",
      (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
        Curation26Queries.typedDaily(s, d)
          .withColumn("lag7", lag(col("cnt"), 7).over(w))
          .filter(col("lag7").isNotNull)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("cnt")).as("sx"), sum(col("lag7")).as("sy"),
            sum(col("cnt") * col("lag7")).as("sxy"),
            sum(col("cnt") * col("cnt")).as("sxx"),
            sum(col("lag7") * col("lag7")).as("syy"))
          .select(col("event_type"), col("n_pairs"),
            (col("n_pairs") * col("sxy") - col("sx") * col("sy"))
              .as("cov_num"),
            (col("n_pairs") * col("sxx") - col("sx") * col("sx"))
              .as("var_x_num"),
            (col("n_pairs") * col("syy") - col("sy") * col("sy"))
              .as("var_y_num"))
      },
      Some(s"""WITH ${Curation26Queries.typedDailySql},
        |lagged AS (SELECT event_type, cnt,
        |    lag(cnt, 7) OVER (PARTITION BY event_type ORDER BY di)
        |      AS lag7
        |  FROM series)
        |SELECT event_type, count(*)::BIGINT AS n_pairs,
        |  (count(*) * sum(cnt * lag7) - sum(cnt) * sum(lag7))::BIGINT
        |    AS cov_num,
        |  (count(*) * sum(cnt * cnt) - sum(cnt) * sum(cnt))::BIGINT
        |    AS var_x_num,
        |  (count(*) * sum(lag7 * lag7) - sum(lag7) * sum(lag7))::BIGINT
        |    AS var_y_num
        |FROM lagged WHERE lag7 IS NOT NULL GROUP BY event_type""".stripMargin),
      "Weekly seasonality strength: lag-7 autocorrelation of zero-" +
        "filled daily counts per event type, reported as exact integer " +
        "cross-moments (r = cov / sqrt(varx*vary) is the caller's one " +
        "IEEE op).  The quantitative companion to seasonal_naive_eval: " +
        "skill said the lag-7 forecast beats persistence, this says " +
        "how much linear structure is actually there — and its " +
        "day-level pre-agg is shared with the whole forecasting " +
        "family."),
  )
}
