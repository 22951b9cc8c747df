package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 36: engagement stickiness (DAU/WAU), a Wald-Wolfowitz runs
  * test on daily deltas, reciprocal-nearest-neighbor pair mining, and
  * session-scoped event-type co-occurrence — product-analytics and
  * graph readouts over the existing event/kNN substrates.
  */
object Curation42Queries {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------ DAU/WAU stickiness
    QueryDef(
      "stickiness_dau_wau",
      (s, d) => {
        val active = Tables.events(s, d)
          .select(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
          .distinct()
        val dau = active.groupBy(col("day"))
          .agg(count(lit(1)).as("dau"))
        val wau = active
          .select(col("user_id"), explode(sequence(col("day"),
            col("day") + expr("INTERVAL 6 DAYS"),
            expr("INTERVAL 1 DAY"))).as("wend"))
          .distinct()
          .groupBy(col("wend")).agg(count(lit(1)).as("wau"))
        dau.join(wau, dau("day") === wau("wend"))
          .select(unix_micros(col("day")).as("day_us"),
            col("dau"), col("wau"),
            expr("(1000 * dau) div wau").as("stickiness_permille"))
      },
      Some("""WITH active AS (SELECT DISTINCT user_id,
        |    date_trunc('day', ts)::TIMESTAMP AS day FROM events),
        |dau AS (SELECT day, count(*)::BIGINT AS dau FROM active
        |        GROUP BY 1),
        |w0 AS (SELECT user_id, unnest(generate_series(day,
        |    day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS wend FROM active),
        |w1 AS (SELECT DISTINCT user_id, wend FROM w0),
        |wau AS (SELECT wend, count(*)::BIGINT AS wau FROM w1 GROUP BY 1)
        |SELECT epoch_us(day) AS day_us, dau, wau,
        |  ((1000 * dau) // wau)::BIGINT AS stickiness_permille
        |FROM dau JOIN wau ON day = wend""".stripMargin),
      "DAU/WAU stickiness per day: distinct daily actives over distinct " +
        "7-day-window actives (window ENDING that day), in permille — " +
        "the standard engagement-intensity ratio.  Exact sliding " +
        "count-distinct without buffering per-window user sets: each " +
        "active (user, day) row fans out to the <= 7 window-ends it can " +
        "influence, and one distinct + count per window end does the " +
        "rest — the explode-to-window-ends trick that turns a sliding " +
        "distinct into two hash aggs (the approx twin at unbounded " +
        "cardinality is sliding_distinct_users' HLL form)."),

    // ------------------------------- Wald-Wolfowitz runs randomness
    QueryDef(
      "runs_test_randomness",
      (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        val daily = Tables.events(s, d)
          .select(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("c"))
        val signs = daily
          .withColumn("delta", col("c") - lag(col("c"), 1).over(w))
          .filter(col("delta").isNotNull && col("delta") =!= 0)
          .withColumn("sgn", signum(col("delta")).cast("long"))
        signs
          .withColumn("chg",
            when(lag(col("sgn"), 1).over(w).isNull, 1L)
              .when(lag(col("sgn"), 1).over(w) =!= col("sgn"), 1L)
              .otherwise(0L))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_obs"),
            count(when(col("sgn") === 1, lit(1))).as("n_up"),
            count(when(col("sgn") === -1, lit(1))).as("n_down"),
            sum(col("chg")).as("n_runs"))
          .withColumn("expected_runs_e3",
            lit(1000L) + expr("(2000 * n_up * n_down) div (n_up + n_down)"))
      },
      Some("""WITH daily AS (SELECT event_type,
        |    date_trunc('day', ts) AS day, count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2),
        |dl AS (SELECT event_type, day,
        |    c - lag(c) OVER (PARTITION BY event_type ORDER BY day)
        |      AS delta
        |  FROM daily),
        |sg AS (SELECT event_type, day, sign(delta)::BIGINT AS sgn
        |  FROM dl WHERE delta IS NOT NULL AND delta != 0),
        |ch AS (SELECT event_type, sgn,
        |    (CASE WHEN lag(sgn) OVER (PARTITION BY event_type
        |            ORDER BY day) IS NULL THEN 1
        |          WHEN lag(sgn) OVER (PARTITION BY event_type
        |            ORDER BY day) != sgn THEN 1
        |          ELSE 0 END)::BIGINT AS chg
        |  FROM sg)
        |SELECT event_type, count(*)::BIGINT AS n_obs,
        |  count(CASE WHEN sgn = 1 THEN 1 END)::BIGINT AS n_up,
        |  count(CASE WHEN sgn = -1 THEN 1 END)::BIGINT AS n_down,
        |  sum(chg)::BIGINT AS n_runs,
        |  (1000 + ((2000 * count(CASE WHEN sgn = 1 THEN 1 END)
        |    * count(CASE WHEN sgn = -1 THEN 1 END))
        |    // (count(CASE WHEN sgn = 1 THEN 1 END)
        |       + count(CASE WHEN sgn = -1 THEN 1 END))))::BIGINT
        |    AS expected_runs_e3
        |FROM ch GROUP BY event_type""".stripMargin),
      "Wald-Wolfowitz runs test on the up/down moves of each type's " +
        "daily volume (ties dropped): observed run count vs the exact " +
        "expected count 1 + 2*n1*n2/(n1+n2) in e3 fixed point — too " +
        "few runs means the series is trending/sticky, too many means " +
        "oscillation; together with mann_kendall_trend this is the " +
        "randomness half of the drift toolbox.  Daily aggregation " +
        "first, so the quadratic-free window passes run on ~30 rows " +
        "per type regardless of corpus size."),

    // ------------------------------ reciprocal nearest neighbors
    QueryDef(
      "reciprocal_nn_pairs",
      (s, d) => {
        val e = GraphQueries.knnEdges(s, d)
        e.as("f").join(e.as("r"),
            col("f.src") === col("r.dst") && col("f.dst") === col("r.src"))
          .filter(col("f.src") < col("f.dst"))
          .select(col("f.src").as("a"), col("f.dst").as("b"))
      },
      Some(s"""WITH ${GraphQueries.knnEdgesSql}
        |SELECT f.src AS a, f.dst AS b
        |FROM edges f JOIN edges r ON f.src = r.dst AND f.dst = r.src
        |WHERE f.src < f.dst""".stripMargin),
      "Reciprocal nearest-neighbor pairs on the kNN digraph: (a, b) " +
        "where each is in the other's top-3 — the high-precision " +
        "mutual-match criterion used for near-dup canonicalization and " +
        "RNN-based clustering (a one-sided kNN hit is often asymmetric " +
        "hubness noise; graph_reciprocity measures the aggregate rate, " +
        "this emits the pairs).  One self-equi-join of the edge list " +
        "on the reversed key; at 100 TB the same join rides whatever " +
        "bucketed candidate generation built the kNN edges."),

    // ------------------------- session-scoped type co-occurrence
    QueryDef(
      "session_type_cooccurrence",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val sess = Tables.events(s, d)
          .withColumn("gap",
            unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
          .withColumn("brk",
            when(col("gap").isNull || col("gap") > 600000000L, 1L)
              .otherwise(0L))
          .withColumn("sid", sum(col("brk")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        val types = sess
          .select(col("user_id"), col("sid"), col("event_type"))
          .distinct()
        val nSess = types.select(col("user_id"), col("sid")).distinct()
          .agg(count(lit(1)).as("n_total"))
        types.as("x").join(types.as("y"),
            col("x.user_id") === col("y.user_id") &&
              col("x.sid") === col("y.sid") &&
              col("x.event_type") < col("y.event_type"))
          .groupBy(col("x.event_type").as("type_a"),
            col("y.event_type").as("type_b"))
          .agg(count(lit(1)).as("n_sessions"))
          .crossJoin(broadcast(nSess))
          .select(col("type_a"), col("type_b"), col("n_sessions"),
            expr("(1000 * n_sessions) div n_total")
              .as("support_permille"))
      },
      Some("""WITH g AS (SELECT user_id, event_id, ts, event_type,
        |    epoch_us(ts::TIMESTAMP) - epoch_us(lag(ts::TIMESTAMP) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id)) AS gap
        |  FROM events),
        |sess AS (SELECT user_id, event_type,
        |    sum(CASE WHEN gap IS NULL OR gap > 600000000 THEN 1
        |             ELSE 0 END) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g),
        |types AS (SELECT DISTINCT user_id, sid, event_type FROM sess),
        |ns AS (SELECT count(*)::BIGINT AS n_total FROM
        |       (SELECT DISTINCT user_id, sid FROM types)),
        |pairs AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
        |    count(*)::BIGINT AS n_sessions
        |  FROM types x JOIN types y ON x.user_id = y.user_id
        |   AND x.sid = y.sid AND x.event_type < y.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, n_sessions,
        |  ((1000 * n_sessions) // n_total)::BIGINT AS support_permille
        |FROM pairs, ns""".stripMargin),
      "Market-basket co-occurrence at SESSION granularity: sessionize " +
        "by 10-minute inactivity gaps (the same kernel as " +
        "sessionize_user), reduce each session to its distinct type " +
        "set, and count sessions containing each unordered type pair " +
        "with permille support — association_rules_lift's user-level " +
        "baskets re-scoped to the behavioral unit that matters for " +
        "journey analysis.  The pair join is an equi-join on (user, " +
        "sid) over <= |types| rows per session, and every window runs " +
        "on the user partitioning — one shuffle end to end."),
  )
}
