package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Behavioral event analytics: interval-union merging, first-touch
  * attribution, inter-event gap profiling, decile lift tables, and the
  * Zipf coverage curve of the vocabulary.  These complete the event-
  * sequence family (sessionize_user, funnel_conversion,
  * event_runs_rle) with the remaining classic shapes a usage pipeline
  * reports on.  The reference's run-state polling
  * (train_adapters/create_all_models.py:48-76) produces exactly this
  * kind of event log; its evaluation sweeps
  * (rag_evaluation/test_all_models.py:34-35) are ranked comparisons of
  * scored populations — a lift table is that report as an operator.
  */
object BehaviorQueries {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------- interval union / merge
    QueryDef(
      "timeline_overlap_merge",
      (s, d) => {
        // each event opens a 10-minute activity interval; merge overlaps
        val iv = Tables.events(s, d).select(col("user_id"),
          unix_micros(col("ts")).as("st"),
          (unix_micros(col("ts")) + lit(600000000L)).as("en"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("st"), col("en"))
        val islands = iv
          .withColumn("prev_max_en", max(col("en")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("new_island",
            when(col("prev_max_en").isNull ||
              col("st") > col("prev_max_en"), 1L).otherwise(0L))
          .withColumn("island", sum(col("new_island")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        islands.groupBy(col("user_id"), col("island"))
          .agg(min(col("st")).as("mst"), max(col("en")).as("men"),
            count(lit(1)).as("n_ev"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_intervals"),
            sum(col("n_ev")).as("n_events"),
            sum(col("men") - col("mst")).as("span_us"))
          .select(col("user_id"), col("n_intervals"), col("n_events"),
            expr("span_us div 1000000").as("active_secs"))
      },
      Some("""WITH iv AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS st,
        |        epoch_us(ts::TIMESTAMP) + 600000000 AS en FROM events),
        |marked AS (SELECT user_id, st, en,
        |    CASE WHEN max(en) OVER (PARTITION BY user_id ORDER BY st, en
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |         OR st > max(en) OVER (PARTITION BY user_id ORDER BY st, en
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |         THEN 1 ELSE 0 END AS new_island
        |  FROM iv),
        |isl AS (SELECT user_id, st, en,
        |    sum(new_island) OVER (PARTITION BY user_id ORDER BY st, en
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM marked),
        |merged AS (SELECT user_id, island, min(st) AS mst, max(en) AS men,
        |        count(*)::BIGINT AS n_ev
        |      FROM isl GROUP BY user_id, island)
        |SELECT user_id, count(*)::BIGINT AS n_intervals,
        |  sum(n_ev)::BIGINT AS n_events,
        |  (sum(men - mst) // 1000000)::BIGINT AS active_secs
        |FROM merged GROUP BY user_id""".stripMargin),
      "Interval-union merge (overlapping activity windows coalesced per " +
        "user): the running-max island technique — an interval starts a " +
        "new island iff its start exceeds the max end of everything " +
        "before it — turns interval union into one sort + two window " +
        "passes + one agg, all integer epoch-micros. The classic " +
        "alternative (self-join on overlap) is quadratic per user; " +
        "this is O(n log n) in the per-user sort and partitions by " +
        "user, so 100 TB of events merge without any pairwise stage."),

    // ---------------------------------- first-touch attribution
    QueryDef(
      "first_touch_attribution",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, d)
          .withColumn("touch_id", last(
            when(col("event_type").isin("click", "view"), col("event_id")),
            ignoreNulls = true).over(w))
          .withColumn("touch_ts", last(
            when(col("event_type").isin("click", "view"), col("ts")),
            ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("touch_id"),
            expr("(unix_micros(ts) - unix_micros(touch_ts)) div 1000000")
              .as("latency_secs"))
      },
      Some("""WITH attributed AS (SELECT event_id, user_id, event_type, ts,
        |    last_value(CASE WHEN event_type IN ('click', 'view')
        |                    THEN event_id END IGNORE NULLS) OVER w AS touch_id,
        |    last_value(CASE WHEN event_type IN ('click', 'view')
        |                    THEN ts END IGNORE NULLS) OVER w AS touch_ts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id AS purchase_id, user_id, touch_id,
        |  ((epoch_us(ts::TIMESTAMP) - epoch_us(touch_ts::TIMESTAMP))
        |   // 1000000)::BIGINT AS latency_secs
        |FROM attributed WHERE event_type = 'purchase'""".stripMargin),
      "First-touch attribution: each purchase is credited to the most " +
        "recent preceding click/view of the same user (NULL when the " +
        "purchase is organic), with conversion latency. One window " +
        "pass — the conditional last(ignoreNulls) over a preceding " +
        "frame is the same LOCF kernel as forward_fill_locf pointed at " +
        "a marketing question; the asof-join formulation of the same " +
        "query needs a second table and a range join."),

    // --------------------------------------- gap-time histogram
    QueryDef(
      "gap_time_histogram",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val gaps = Tables.events(s, d)
          .withColumn("gap_us",
            unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
          .filter(col("gap_us").isNotNull)
        gaps.select(
            when(col("gap_us") < 60000000L, "a_under_1m")
              .when(col("gap_us") < 600000000L, "b_1m_to_10m")
              .when(col("gap_us") < 3600000000L, "c_10m_to_1h")
              .when(col("gap_us") < 86400000000L, "d_1h_to_1d")
              .otherwise("e_over_1d").as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("n_gaps"))
      },
      Some("""WITH gaps AS (SELECT
        |    epoch_us(ts::TIMESTAMP) - epoch_us(lag(ts) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id)::TIMESTAMP) AS gap_us
        |  FROM events)
        |SELECT CASE WHEN gap_us < 60000000 THEN 'a_under_1m'
        |            WHEN gap_us < 600000000 THEN 'b_1m_to_10m'
        |            WHEN gap_us < 3600000000 THEN 'c_10m_to_1h'
        |            WHEN gap_us < 86400000000 THEN 'd_1h_to_1d'
        |            ELSE 'e_over_1d' END AS bucket,
        |  count(*)::BIGINT AS n_gaps
        |FROM gaps WHERE gap_us IS NOT NULL
        |GROUP BY 1""".stripMargin),
      "Inter-event gap histogram with human-scale buckets — the " +
        "distribution that picks the sessionization timeout " +
        "(sessionize_user's 10-minute gap is defensible exactly when " +
        "the b/c bucket boundary shows a valley). One lag window + " +
        "5-key agg; boundaries are integer microsecond constants, no " +
        "log-scale float bucketing."),

    // -------------------------------------------- decile lift
    QueryDef(
      "decile_lift_table",
      (s, d) => {
        val users = Tables.events(s, d).groupBy(col("user_id")).agg(
          sum(floor(col("value") * 100).cast("long")).as("score_e2"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("converted"))
        // user count is unbounded at 100 TB: exact ntile(10) arithmetic
        // on the ScalableIndex dense rank, not a global ntile window
        val n = Tables.events(s, d).select(col("user_id")).distinct().count()
        val k = 10L
        val q = n / k
        val r = n % k
        val bucket =
          if (q == 0L) "idx + 1"
          else s"if(idx < ${r * (q + 1)}L, idx div ${q + 1}L, " +
            s"$r + (idx - ${r * (q + 1)}L) div ${q}L) + 1"
        val ranked = graft.operators.ScalableIndex.withDenseIndex(users,
            Seq(col("score_e2").desc, col("user_id")), 8, "idx")
          .withColumn("decile", expr(s"cast($bucket AS bigint)"))
        val per = ranked.groupBy(col("decile")).agg(
          count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
        val w = Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        per
          .withColumn("cum_users", sum(col("n_users")).over(w))
          .withColumn("cum_conv", sum(col("n_conv")).over(w))
          .withColumn("tot_users", sum(col("n_users")).over(
            Window.partitionBy()))
          .withColumn("tot_conv", sum(col("n_conv")).over(
            Window.partitionBy()))
          // cumulative lift = (cum_conv/cum_users) / (tot_conv/tot_users)
          .select(col("decile"), col("n_users"), col("n_conv"),
            expr("(1000 * cum_conv * tot_users) div (cum_users * tot_conv)")
              .as("cum_lift_permille"))
      },
      Some("""WITH users AS (SELECT user_id,
        |    sum(floor(value * 100)::BIGINT)::BIGINT AS score_e2,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
        |      AS converted
        |  FROM events GROUP BY user_id),
        |ranked AS (SELECT user_id, converted,
        |    ntile(10) OVER (ORDER BY score_e2 DESC, user_id)::BIGINT AS decile
        |  FROM users),
        |per AS (SELECT decile, count(*)::BIGINT AS n_users,
        |        sum(converted)::BIGINT AS n_conv
        |      FROM ranked GROUP BY decile)
        |SELECT decile, n_users, n_conv,
        |  ((1000 * sum(n_conv) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    * sum(n_users) OVER ())
        |   // (sum(n_users) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    * sum(n_conv) OVER ()))::BIGINT AS cum_lift_permille
        |FROM per""".stripMargin),
      "Decile lift table — the standard model-evaluation gains report: " +
        "users ranked by an engagement score, cumulative conversion " +
        "rate per decile vs the population rate, cross-multiplied to " +
        "integer permille. The global ntile sorts only the USER-level " +
        "aggregate (one row per user), not events; at 100 TB user " +
        "count still warrants range-partitioned ranking " +
        "(ScalableIndex.withDenseIndex shows that path), with the " +
        "10-row lift math unchanged."),

    // --------------------------------------- Zipf coverage curve
    QueryDef(
      "zipf_coverage_curve",
      (s, d) => {
        val freq = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
        // Vocabulary grows with the corpus (Heaps), so the rank AND the
        // cumulative mass both come from ONE ScalablePrefix pass over
        // (freq desc, tok): running count = dense 1-based rank, running
        // freq sum = coverage. The corpus total broadcasts from a plain
        // aggregate — no unpartitioned window anywhere.
        val tot = freq.agg(sum(col("freq")).as("total"))
        graft.operators.ScalablePrefix.withRunningAggs(
            freq.withColumn("one", lit(1L)),
            Seq(col("freq").desc, col("tok")),
            Seq("one" -> "sum", "freq" -> "sum"), 8)
          .crossJoin(broadcast(tot))
          .select(col("cum_one").as("rank"), col("tok"), col("freq"),
            expr("(1000 * cum_freq) div total").as("cum_permille"),
            (col("cum_one") * col("freq")).as("rank_x_freq"))
      },
      Some("""WITH freq AS (SELECT tok, count(*)::BIGINT AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok),
        |ranked AS (SELECT tok, freq,
        |    row_number() OVER (ORDER BY freq DESC, tok)::BIGINT AS rank
        |  FROM freq)
        |SELECT rank, tok, freq,
        |  ((1000 * sum(freq) OVER (ORDER BY rank
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |   // sum(freq) OVER ())::BIGINT AS cum_permille,
        |  (rank * freq)::BIGINT AS rank_x_freq
        |FROM ranked""".stripMargin),
      "Zipf rank-frequency curve with cumulative coverage: how much of " +
        "the token mass the top-k vocabulary covers (the tokenizer-" +
        "sizing question vocab_oov_rate answers pointwise) plus the " +
        "rank x freq product whose constancy is the Zipf diagnostic. " +
        "The global window runs on the VOCABULARY (distinct terms), " +
        "not the corpus — the token-mass agg upstream is " +
        "partial-aggregatable, and vocabulary cardinality is what " +
        "makes the single-partition tail affordable at any corpus " +
        "size (a BPE vocab is <=100k rows)."),
  )
}
