package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** §2.5 aggregations (A1–A8).  A1/A2 (rank metrics) live with the
  * retrieval-eval flagship in VectorQueries; here are the general agg
  * surface queries. */
object AggQueries {
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)
  private def events(s: SparkSession, d: String) = Tables.events(s, d)

  val defs: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- A3
    QueryDef(
      "count_outputs",
      (s, d) => docs(s, d).groupBy(col("source"))
        .agg(count(lit(1)).as("n_outputs")),
      Some("SELECT source, count(*) AS n_outputs FROM documents GROUP BY source"),
      "ls $OUT | wc -l output counting (run_data_generation_sophia.sh:61-65) " +
        "per corpus dir; partial aggregation makes this a map-side combine."),

    // ---------------------------------------------------------------- A4
    QueryDef(
      "count_by_group",
      (s, d) => events(s, d).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users")),
      Some("""SELECT event_type, count(*) AS n,
        | count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type""".stripMargin),
      "status.count('testmodel') run-state gauges " +
        "(test_all_models_llm_eval_sophia.py:15; create_all_models_narrative" +
        ".py:11) generalized to per-type counts."),

    // ---------------------------------------------------------------- A5
    QueryDef(
      "collect_list_ranks",
      (s, d) => docs(s, d)
        .filter(col("text").rlike("(?:^|\\W)agg(?:$|\\W)"))
        .groupBy(col("lang"))
        .agg(
          concat_ws(",",
            transform(sort_array(collect_list(col("doc_id"))),
              x => x.cast("string"))).as("hit_docs"),
          count(lit(1)).as("n_hits")),
      Some("""SELECT lang,
        | array_to_string(list(doc_id ORDER BY doc_id), ',') AS hit_docs,
        | count(*) AS n_hits
        |FROM documents WHERE regexp_matches(text, '(?:^|\W)agg(?:$|\W)')
        |GROUP BY lang""".stripMargin),
      "Per-query accumulated match positions index_list " +
        "(RAG-eval-test_model.py:132-143); sorted then joined so the " +
        "result is order-insensitive to shuffle layout."),

    // ---------------------------------------------------------------- A6
    QueryDef(
      "pivot_scores",
      (s, d) => {
        val scored = Grids.adapters(s).crossJoin(Grids.tasks(s))
          .select(col("adapter"), col("task"),
            (length(col("adapter")) * 7 + length(col("task")) * 3 +
              col("num_shot")).cast("bigint").as("score"))
        scored.groupBy(col("adapter"))
          .pivot("task", Grids.taskShots.map(_._1))
          .agg(first(col("score")))
      },
      Some(s"""SELECT adapter,
        | max(CASE WHEN task = 'winogrande' THEN score END) AS winogrande,
        | max(CASE WHEN task = 'truthfulqa' THEN score END) AS truthfulqa,
        | max(CASE WHEN task = 'arc_challenge' THEN score END) AS arc_challenge,
        | max(CASE WHEN task = 'hellaswag' THEN score END) AS hellaswag,
        | max(CASE WHEN task = 'mmlu' THEN score END) AS mmlu,
        | max(CASE WHEN task = 'gsm8k' THEN score END) AS gsm8k
        |FROM (SELECT adapter, task,
        |        (length(adapter)*7 + length(task)*3 + num_shot)::BIGINT AS score
        |      FROM ${Grids.adaptersSql} CROSS JOIN ${Grids.tasksSql})
        |GROUP BY adapter""".stripMargin),
      "Result matrix adapter x task (test_all_models_llm_eval_sophia.py:38-53 " +
        "file grid) as an explicit pivot; explicit value list so the plan " +
        "needs no extra distinct-values job."),

    // ---------------------------------------------------------------- A7
    QueryDef(
      "distinct_dedupe",
      (s, d) => docs(s, d)
        .select(col("lang"), col("source")).distinct(),
      Some("SELECT DISTINCT lang, source FROM documents"),
      "Idempotence via unique keys (generate_narratives_from_data.py:95-96); " +
        "full dedup family in DedupQueries."),

    // ---------------------------------------------------------------- A8
    QueryDef(
      "grouping_sets_rollup",
      (s, d) => docs(s, d)
        .rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars")),
      Some("""SELECT lang, source, count(*) AS n_docs,
        | sum(n_chars)::BIGINT AS chars
        |FROM documents GROUP BY ROLLUP (lang, source)""".stripMargin),
      "Per-task / per-adapter / grand-total eval summaries as ROLLUP " +
        "(grid dims of test_all_models_llm_eval_sophia.py:38-39)."),

    // ---------------------------------------------- A8a (grouping_id)
    QueryDef(
      "rollup_grouping_id",
      (s, d) => docs(s, d)
        .rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          grouping(col("lang")).cast("bigint").as("lang_is_total"),
          grouping(col("source")).cast("bigint").as("source_is_total")),
      Some("""SELECT lang, source, count(*) AS n_docs,
        | GROUPING(lang)::BIGINT AS lang_is_total,
        | GROUPING(source)::BIGINT AS source_is_total
        |FROM documents GROUP BY ROLLUP (lang, source)""".stripMargin),
      "ROLLUP with GROUPING() markers: distinguishes a genuine NULL " +
        "group value from the NULL that means 'total across this " +
        "column' — without it, subtotal rows are ambiguous the moment " +
        "a dimension is nullable. Same one-shuffle plan as " +
        "grouping_sets_rollup; the marker is free metadata."),

    // ------------------------------------------------------ A8b (CUBE)
    QueryDef(
      "cube_lang_source",
      (s, d) => docs(s, d)
        .cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), max(col("n_chars")).as("max_chars")),
      Some("""SELECT lang, source, count(*) AS n_docs,
        | max(n_chars) AS max_chars
        |FROM documents GROUP BY CUBE (lang, source)""".stripMargin),
      "All marginal summaries at once: CUBE emits the four grouping " +
        "sets {(lang,source),(lang),(source),()} in one pass — one " +
        "shuffle with map-side partials per set, versus four separate " +
        "scans of a 100 TB corpus."),

    // ---------------------------------------------------------------- A9 (extra surface: approx distinct at scale)
    QueryDef(
      "approx_count_users",
      (s, d) => events(s, d).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users")),
      Some("SELECT event_type, count(DISTINCT user_id) AS exact_users " +
        "FROM events GROUP BY event_type"),
      "Cardinality gauge; exact here for oracle parity — at 100 TB swap in " +
        "approx_count_distinct(user_id, 0.01) (HLL++, no exact shuffle)."),

    // ------------------------------------------------- bitmask rollup
    QueryDef(
      "bitmask_event_types",
      (s, d) => {
        // stable bit index per type: alphabetical rank over the closed
        // set — the dictionary a real pipeline would keep in a dim table
        val typeBit = map(
          lit("click"), lit(1L), lit("error"), lit(2L),
          lit("purchase"), lit(4L), lit("signup"), lit(8L),
          lit("view"), lit(16L))
        events(s, d)
          .select(col("user_id"), element_at(typeBit, col("event_type")).as("b"))
          .groupBy(col("user_id"))
          .agg(bit_or(col("b")).as("type_mask"),
            bit_count(bit_or(col("b"))).cast("bigint").as("n_types"))
      },
      Some("""SELECT user_id,
        | bit_or(CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
        |   WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
        |   WHEN 'view' THEN 16 END)::BIGINT AS type_mask,
        | bit_count(bit_or(CASE event_type WHEN 'click' THEN 1
        |   WHEN 'error' THEN 2 WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
        |   WHEN 'view' THEN 16 END))::BIGINT AS n_types
        |FROM events GROUP BY user_id""".stripMargin),
      "Bitmask rollup: bit_or folds each user's event-type set into one " +
        "int64 — set-membership aggregation at 8 bytes per group " +
        "instead of a collect_set, and downstream subset tests are one " +
        "AND. Order-independent and mergeable, so partial aggregation " +
        "applies like any sum."),

    // ------------------------------------------- exact moment statistics
    QueryDef(
      "variance_fixed_point",
      (s, d) => events(s, d)
        .select(col("event_type"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s1"),
          sum(col("v") * col("v")).as("s2"))
        .select(col("event_type"), col("n"),
          // population variance from exact integer moments, assembled
          // with explicit double casts so both engines run the same
          // IEEE op sequence (long*long would overflow under ANSI;
          // DuckDB would promote to HUGEINT with different rounding).
          // Builtin var_pop folds doubles in partition-merge order and
          // drifts across partitionings; this is one mul/div/sub/div.
          ((col("s2").cast("double") -
            col("s1").cast("double") * col("s1").cast("double") /
              col("n").cast("double")) / col("n").cast("double"))
            .as("var_pop_e4"),
          (col("s1").cast("double") / col("n").cast("double")).as("mean_e2")),
      Some("""SELECT event_type, n,
        | ((s2::DOUBLE - s1::DOUBLE * s1::DOUBLE / n::DOUBLE) / n::DOUBLE)
        |   AS var_pop_e4,
        | (s1::DOUBLE / n::DOUBLE) AS mean_e2
        |FROM (SELECT event_type, count(*)::BIGINT AS n,
        |        sum(v)::BIGINT AS s1, sum(v * v)::BIGINT AS s2
        |      FROM (SELECT event_type, floor(value * 100)::BIGINT AS v
        |            FROM events)
        |      GROUP BY event_type)""".stripMargin),
      "Second-moment statistics the order-independent way: exact " +
        "integer sums of v and v^2 (fixed-point), variance assembled " +
        "by a final scalar expression. Builtin var_pop/stddev merge " +
        "running double moments in partition order — bit-drift across " +
        "cluster sizes and AQE re-plans; integer moments make the " +
        "result reproducible anywhere, same trick as Det.fixedSum."),

    // ------------------------------------------------- min_by / max_by
    QueryDef(
      "minby_maxby_events",
      (s, d) => {
        // composite int64 key (fixed-point value, event_id) makes the
        // argmin/argmax pick deterministic under value ties — bare
        // max_by(x, value) is pick-any on ties, which would hash-differ
        // between engines
        val key = expr("floor(value * 100)").cast("long") * lit(100000000L) +
          col("event_id")
        events(s, d)
          .select(col("user_id"), col("event_id"), key.as("k"))
          .groupBy(col("user_id"))
          .agg(max_by(col("event_id"), col("k")).as("top_event"),
            min_by(col("event_id"), col("k")).as("bottom_event"))
      },
      Some("""SELECT user_id,
        | max_by(event_id, floor(value * 100)::BIGINT * 100000000
        |        + event_id) AS top_event,
        | min_by(event_id, floor(value * 100)::BIGINT * 100000000
        |        + event_id) AS bottom_event
        |FROM events GROUP BY user_id""".stripMargin),
      "Aggregate-form argmax/argmin (max_by / min_by): the highest- and " +
        "lowest-valued event per user in ONE aggregation pass — no " +
        "window, no self-join (contrast argmax_event_per_user, the " +
        "window form that keeps the whole row). The composite " +
        "fixed-point key breaks value ties by event_id so the pick is " +
        "deterministic on any engine or partitioning."),

    // ---------------------------------------------- boolean aggregates
    QueryDef(
      "bool_agg_user_flags",
      (s, d) => events(s, d)
        .groupBy(col("user_id"))
        .agg(bool_or(col("event_type") === "purchase").as("ever_purchased"),
          bool_and(col("value") >= 0).as("all_nonneg"),
          count_if(col("event_type") === "error").as("n_errors")),
      Some("""SELECT user_id,
        | bool_or(event_type = 'purchase') AS ever_purchased,
        | bool_and(value >= 0) AS all_nonneg,
        | count(CASE WHEN event_type = 'error' THEN 1 END)::BIGINT
        |   AS n_errors
        |FROM events GROUP BY user_id""".stripMargin),
      "Boolean aggregates (bool_or / bool_and / count_if): predicate " +
        "rollups without CASE-sum gymnastics; mergeable partials like " +
        "any agg, so they survive AQE re-plans untouched."),

    // ------------------------------------------------ calendar gap-fill
    QueryDef(
      "date_spine_gapfill",
      (s, d) => {
        val ev = events(s, d).select(to_date(col("ts")).as("day"))
        val bounds = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        val spine = bounds.select(
          explode(sequence(col("d0"), col("d1"))).as("day"))
        val daily = ev.groupBy(col("day")).agg(count(lit(1)).as("n"))
        spine.join(daily, Seq("day"), "left")
          .select(col("day"), coalesce(col("n"), lit(0L)).as("n_events"))
      },
      Some("""WITH days AS (SELECT ts::DATE AS day FROM events),
        |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM days),
        |spine AS (SELECT d0 + (i.i::INT) AS day
        |  FROM bounds, (SELECT range AS i FROM range(0, 4096)) i
        |  WHERE d0 + (i.i::INT) <= d1),
        |daily AS (SELECT day, count(*)::BIGINT AS n FROM days GROUP BY day)
        |SELECT spine.day, coalesce(daily.n, 0)::BIGINT AS n_events
        |FROM spine LEFT JOIN daily ON daily.day = spine.day""".stripMargin),
      "Calendar-spine gap filling: generate the full day range from the " +
        "data's own bounds (sequence over a 1-row agg — no driver " +
        "round-trip) and left-join daily counts so silent days surface " +
        "as zeros — the missing-data guard every scheduled-pipeline " +
        "health dashboard needs. Spine is O(days) and broadcast; the " +
        "event side aggregates before the join."),

    // ----------------------------------------------------- histogram
    QueryDef(
      "histogram_event_values",
      (s, d) => events(s, d)
        .select(col("event_type"),
          // floor (not integer div): div truncates toward zero, so the
          // two would disagree on negative values
          floor(col("value")).cast("bigint").as("bucket"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n")),
      Some("""SELECT event_type, floor(value)::BIGINT AS bucket,
        | count(*)::BIGINT AS n
        |FROM events GROUP BY event_type, bucket""".stripMargin),
      "Equi-width value histogram per event type: bucket assignment is a " +
        "stateless floor expression, so the histogram is one map-side- " +
        "partial groupBy — the distribution profile that sizes skew " +
        "salts and AQE thresholds before running the heavy joins."),

    // -------------------------------------- map-typed aggregation state
    QueryDef(
      "map_event_type_counts",
      (s, d) => {
        val per = events(s, d).groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        per.groupBy(col("user_id"))
          .agg(map_from_entries(array_sort(
            collect_list(struct(col("event_type"), col("n"))))).as("m"))
          .select(col("user_id"),
            size(map_keys(col("m"))).cast("bigint").as("n_types"),
            aggregate(map_values(col("m")), lit(0L), (a, b) => a + b)
              .as("n_events"),
            array_join(transform(map_entries(col("m")),
              e => concat(e.getField("key"), lit(":"), e.getField("value"))),
              ",").as("serialized"))
      },
      Some("""WITH per AS (SELECT user_id, event_type, count(*)::BIGINT AS n
        |  FROM events GROUP BY user_id, event_type)
        |SELECT user_id, count(*)::BIGINT AS n_types,
        |       sum(n)::BIGINT AS n_events,
        |       string_agg(event_type || ':' || n, ','
        |                  ORDER BY event_type) AS serialized
        |FROM per GROUP BY user_id""".stripMargin),
      "MapType as first-class aggregation state: per-user event_type -> " +
        "count maps built with map_from_entries over a sorted entry " +
        "list, consumed with map_keys/map_values/map_entries HOFs (the " +
        "open-key-set record model of SURVEY §1.1's genome JSON). The " +
        "map column itself is serialized key:value for the oracle; the " +
        "two-level agg keeps the first shuffle partial (map-side " +
        "combine on (user, type)) so the collect_list only ever sees " +
        "pre-aggregated rows — collect_list over raw events would " +
        "buffer unboundedly at 100 TB."),

    // --------------------------------------------- map value transform
    QueryDef(
      "map_share_permille",
      (s, d) => {
        val per = events(s, d).groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        per.groupBy(col("user_id"))
          .agg(map_from_entries(array_sort(
            collect_list(struct(col("event_type"), col("n"))))).as("m"))
          .withColumn("total",
            aggregate(map_values(col("m")), lit(0L), (a, b) => a + b))
          // transform_values rescales inside the map — counts become
          // permille shares without ever exploding the map to rows
          .withColumn("shares",
            expr("transform_values(m, (k, v) -> (v * 1000) div total)"))
          .select(col("user_id"), col("total"),
            expr("array_join(transform(map_entries(shares), " +
              "e -> concat(e.key, ':', e.value)), ',')").as("serialized"))
      },
      Some("""WITH per AS (SELECT user_id, event_type, count(*)::BIGINT AS n
        |  FROM events GROUP BY user_id, event_type),
        |tot AS (SELECT user_id, sum(n)::BIGINT AS total FROM per
        |        GROUP BY user_id)
        |SELECT per.user_id, tot.total,
        |       string_agg(event_type || ':' || ((n * 1000) // total), ','
        |                  ORDER BY event_type) AS serialized
        |FROM per JOIN tot ON tot.user_id = per.user_id
        |GROUP BY per.user_id, tot.total""".stripMargin),
      "Map-value transformation HOF: transform_values rescales every " +
        "count to its permille share in place, keyed arithmetic " +
        "referencing a sibling column (total) — the normalization step " +
        "of any mixture/profile map without an explode-aggregate " +
        "round-trip (which would add a shuffle at 100 TB)."),
  )
}

/** §2.6 window functions (W1–W4). */
object WindowQueries {
  private def events(s: SparkSession, d: String) = Tables.events(s, d)

  val defs: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- W1
    QueryDef(
      "rank_positions",
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        row_number().over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey")))
          .cast("bigint").as("rank")),
      Some("""SELECT o_orderkey, o_custkey,
        | row_number() OVER (PARTITION BY o_custkey
        |                    ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |FROM orders""".stripMargin),
      "Sequential 1-based rank assignment over retrieved docs " +
        "(RAG-eval-test_model.py:132-142); partitioned window — one shuffle " +
        "by key, sort within partition."),

    // ---------------------------------------------------------------- W2
    QueryDef(
      "lag_prev_gap",
      (s, d) => events(s, d).select(
        col("event_id"), col("user_id"),
        coalesce(
          unix_micros(col("ts")) - unix_micros(
            lag(col("ts"), 1).over(
              Window.partitionBy(col("user_id"))
                .orderBy(col("ts"), col("event_id")))),
          lit(-1L)).as("gap_us")),
      Some("""SELECT event_id, user_id, coalesce(
        | epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
        |                                       ORDER BY ts, event_id)),
        | -1) AS gap_us
        |FROM events""".stripMargin),
      "Previous-row lookup (create_all_models.py:54-57 checkpoint chain) " +
        "over the event stream: inter-event gap per user."),

    // ---------------------------------------------------------------- W3
    QueryDef(
      "ntile_length_buckets",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        ntile(8).over(Window.orderBy(length(col("text")), col("doc_id")))
          .cast("bigint").as("bucket")),
      Some("""SELECT doc_id, ntile(8) OVER (ORDER BY length(text), doc_id)
        | AS bucket FROM documents""".stripMargin),
      "group_by_length batch buckets (RAG-eval-create_model.py:142)."),

    // ------------------------------------------------------- W3 at scale
    QueryDef(
      "ntile_length_buckets_scalable",
      (s, d) => {
        // The 100 TB form of ntile_length_buckets: dense global rank via
        // range-partition + zipWithIndex offsets (no single-partition
        // window sort), then ntile's exact bucket arithmetic on the rank.
        // The (length, doc_id) order collapses into one unique long sort
        // key (doc_id < 1e7 in every fixture; FixtureBoundsSpec pins the
        // length cap), so ScalableIndex's single-column contract holds.
        val keyed = Tables.documents(s, d).select(
          col("doc_id"),
          (length(col("text")).cast("long") * 10000000L + col("doc_id"))
            .as("sortkey"))
        // n comes from the base table BEFORE the indexed frame exists: a
        // parquet count is one metadata-served job, whereas counting the
        // zipWithIndex-backed frame would replay the whole range
        // partition + sort once for the count and again for the result
        val n = Tables.documents(s, d).count()
        val indexed = graft.operators.ScalableIndex
          .withDenseIndex(keyed, "sortkey", 8)
        // ntile(k) over n rows: first (n mod k) buckets hold n/k + 1 rows
        val k = 8L
        val q = n / k
        val r = n % k
        val bucket =
          if (q == 0L) "idx + 1" // fewer rows than buckets: one row each
          else s"if(idx < ${r * (q + 1)}L, idx div ${q + 1}L, " +
            s"$r + (idx - ${r * (q + 1)}L) div ${q}L) + 1"
        indexed.selectExpr("doc_id", s"cast($bucket AS bigint) AS bucket")
      },
      Some("""SELECT doc_id, ntile(8) OVER (ORDER BY length(text), doc_id)
        | AS bucket FROM documents""".stripMargin),
      "Scale form of ntile_length_buckets: the global window sort is " +
        "replaced by ScalableIndex (range partition on the fused " +
        "(length, doc_id) sort key + per-partition offsets) and ntile's " +
        "first-r-buckets-get-one-extra arithmetic applied to the dense " +
        "rank — bit-identical buckets, no task ever holds more than its " +
        "range partition. The count() driver lookup is one metadata-" +
        "served job (parquet aggregate pushdown), not a data collect."),

    // ---------------------------------------------------------------- W4
    QueryDef(
      "running_delta",
      (s, d) => events(s, d).select(
        col("event_id"), col("user_id"),
        (sum(floor(col("value") * 100)).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ts"), col("event_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          / 100.0).as("running_value")),
      Some("""SELECT event_id, user_id,
        | sum(floor(value * 100)) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) / 100.0
        | AS running_value
        |FROM events""".stripMargin),
      "Before/after output-count deltas (run_data_generation_sophia.sh:61-65) " +
        "generalized: running totals; fixed-point so partial sums are " +
        "order-exact."),

    // ------------------------------------------------------- W8 (extra)
    QueryDef(
      "moving_avg_last5",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(-4, Window.currentRow)
        events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"),
            floor(col("value") * 100).cast("long").as("v"))
          .select(col("event_id"), col("user_id"),
            (sum(col("v")).over(w).cast("double") /
              count(lit(1)).over(w).cast("double")).as("avg5_e2"))
      },
      Some("""SELECT event_id, user_id,
        | ((sum(v) OVER w)::DOUBLE / (count(*) OVER w)::DOUBLE) AS avg5_e2
        |FROM (SELECT event_id, user_id, ts,
        |        floor(value * 100)::BIGINT AS v FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin),
      "Bounded-ROWS moving average (last 5 events per user): the third " +
        "frame type next to unbounded (running_delta) and value-RANGE " +
        "(range_frame_hour_sum). Fixed-point sum over the frame with " +
        "one final double division; the frame's row count divides, so " +
        "warm-up rows (fewer than 5 predecessors) average what exists " +
        "instead of null-padding."),

    // ------------------------------------------------------- W7 (extra)
    QueryDef(
      "first_last_event_per_user",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        events(s, d)
          .select(col("user_id"),
            first(col("event_type")).over(w).as("first_type"),
            last(col("event_type")).over(w).as("last_type"),
            nth_value(col("event_type"), 2).over(w).as("second_type"))
          .distinct()
          .select(col("user_id"), col("first_type"), col("last_type"),
            coalesce(col("second_type"), lit("none")).as("second_type"))
      },
      Some("""SELECT DISTINCT user_id,
        |  first_value(event_type) OVER w AS first_type,
        |  last_value(event_type) OVER w AS last_type,
        |  coalesce(nth_value(event_type, 2) OVER w, 'none') AS second_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin),
      "Value-picking windows (first/last/nth over the full partition " +
        "frame): each user's entry, exit, and second event — the " +
        "lifecycle summary of the reference's submit..done polling " +
        "loops. Deterministic because the frame is unbounded on both " +
        "sides and the order key is unique."),

    // ------------------------------------------------------- W6 (extra)
    QueryDef(
      "range_frame_hour_sum",
      (s, d) => {
        // integer seconds: Column `/` would be IEEE double division
        val sec = expr("unix_micros(ts) div 1000000")
        events(s, d)
          .select(col("event_id"), col("user_id"), sec.as("t_sec"),
            floor(col("value") * 100).cast("long").as("v100"))
          .withColumn("hour_sum_e2",
            sum(col("v100")).over(
              Window.partitionBy(col("user_id")).orderBy(col("t_sec"))
                .rangeBetween(-3600L, Window.currentRow)))
          .select(col("event_id"), col("user_id"), col("hour_sum_e2"))
      },
      Some("""SELECT event_id, user_id,
        |  (sum(v100) OVER (PARTITION BY user_id ORDER BY t_sec
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW))::BIGINT
        |    AS hour_sum_e2
        |FROM (SELECT event_id, user_id,
        |        epoch_us(ts::TIMESTAMP) // 1000000 AS t_sec,
        |        floor(value * 100)::BIGINT AS v100
        |      FROM events)""".stripMargin),
      "RANGE-framed window: per-user trailing-hour sum where the frame " +
        "is bounded by the ORDER BY value (event-time seconds), not row " +
        "count — rows landing in the same second share a frame, unlike " +
        "ROWS. Fixed-point sum keeps the running total exact under any " +
        "partitioning; one shuffle on the partition key."),

    // ------------------------------------------------------- W5 (extra)
    QueryDef(
      "percent_rank_cume",
      (s, d) => {
        // (doc_id tiebreak makes the order total, so rank == row index
        // and cume_dist == rank / n).  Executes through ScalableGroups:
        // one range exchange on (lang, n_chars, doc_id) + a broadcast
        // per-lang (first index, count) — no enum-partitioned window
        // concentrating corpus/|lang| rows on single tasks.
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("n_chars"))
        graft.operators.ScalableGroups.withGroupRank(
            docs, Seq("lang"), Seq(col("n_chars"), col("doc_id")), 8,
            rankCol = "r", sizeCol = "n")
          .select(col("doc_id"), col("lang"),
            when(col("n") === 1, lit(0.0)).otherwise(
              (col("r") - 1).cast("double") /
                (col("n") - 1).cast("double")).as("pct_rank"),
            (col("r").cast("double") / col("n").cast("double")).as("cume"))
      },
      Some("""SELECT doc_id, lang,
        | percent_rank() OVER (PARTITION BY lang
        |                      ORDER BY n_chars, doc_id) AS pct_rank,
        | cume_dist() OVER (PARTITION BY lang
        |                   ORDER BY n_chars, doc_id) AS cume
        |FROM documents""".stripMargin),
      "Relative standing within a partition: percent_rank ((rank-1)/(n-1)) " +
        "and cume_dist (rank/n) — each a single IEEE division of exact " +
        "integers, so cross-engine bit-parity holds without fixed-point. " +
        "The rank is a ScalableGroups dense index (range exchange + " +
        "broadcast per-lang offsets), valid because the doc_id tiebreak " +
        "makes the order total — flat at any corpus size."),
  )
}

/** §2.9 streaming analogs, batch shadows (T1–T4).  The same computations
  * are wired as true Structured Streaming jobs in graft.streaming, tested
  * with MemoryStream in ScalaTest; the oracle checks the batch-equivalent
  * semantics here. */
object EventQueries {
  private def events(s: SparkSession, d: String) = Tables.events(s, d)

  val defs: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- T1
    QueryDef(
      "tumbling_window_counts",
      (s, d) => events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n")),
      Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
        | count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin),
      "Per-poll-interval run-state counts (create_all_models.py:76 15s tick) " +
        "as tumbling event-time windows."),

    // ---------------------------------------------------------------- T2
    QueryDef(
      "sliding_window_agg",
      (s, d) => events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n")),
      Some("""SELECT make_timestamp(((floor(epoch(ts)/900)::BIGINT * 900
        |   - j.j * 900) * 1000000)::BIGINT) AS window_start,
        | event_type, count(*) AS n
        |FROM events CROSS JOIN (SELECT range AS j FROM range(0, 4)) j
        |GROUP BY 1, 2""".stripMargin),
      "Capacity gauge over a recent sliding window " +
        "(test_all_models_llm_eval_sophia.py:15): 1h window, 15min slide — " +
        "each event lands in 4 windows."),

    // ---------------------------------------------------------------- T3
    QueryDef(
      "sessionize_user",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val flagged = events(s, d).withColumn("new_session",
          when(lag(col("ts"), 1).over(w).isNull
            .or(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
              > 600000000L), 1L).otherwise(0L))
        flagged
          .withColumn("session_id",
            sum(col("new_session")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"))
      },
      Some("""WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 600000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    (sum(new_session) OVER (PARTITION BY user_id
        |       ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING))::BIGINT
        |      AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM sess GROUP BY 1, 2""".stripMargin),
      "Job lifecycle as burst-until-idle sessions (create_all_models.py:48-76 " +
        "submit-poll-done cycle): 10-minute-gap sessionization; streaming " +
        "twin uses session_window."),

    // ---------------------------------------------------------------- T4
    QueryDef(
      "watermark_late_data",
      (s, d) => events(s, d)
        .dropDuplicates("event_id")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_unique")),
      Some("""SELECT event_type, count(*) AS n_unique
        |FROM (SELECT DISTINCT ON (event_id) event_id, event_type FROM events
        |      ORDER BY event_id)
        |GROUP BY event_type""".stripMargin),
      "At-most-once with tombstones (test_all_models_llm_eval_sophia.py:50-53 " +
        "output-or-.debug skip): batch shadow of " +
        "dropDuplicatesWithinWatermark; event_id is unique in the fixture so " +
        "DISTINCT ON is deterministic."),

    // --------------------------------------------------------------- T5
    QueryDef(
      "interval_join_start_done",
      (s, d) => {
        val ev = events(s, d)
        val starts = ev.filter(col("event_type") === "signup")
          .select(col("event_id").as("start_id"), col("user_id"),
            col("ts").as("start_ts"))
        val dones = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("done_id"),
            col("user_id").as("done_user"), col("ts").as("done_ts"))
        starts.join(dones,
            col("user_id") === col("done_user") &&
              col("done_ts") >= col("start_ts") &&
              col("done_ts") <= col("start_ts") + expr("INTERVAL 1 HOUR"))
          .select(col("user_id"), col("start_id"), col("done_id"),
            (unix_micros(col("done_ts")) - unix_micros(col("start_ts")))
              .as("latency_us"))
      },
      Some("""SELECT s.user_id, s.event_id AS start_id, p.event_id AS done_id,
        |  (epoch_us(p.ts::TIMESTAMP) - epoch_us(s.ts::TIMESTAMP))
        |    AS latency_us
        |FROM events s JOIN events p
        |  ON p.user_id = s.user_id
        | AND s.event_type = 'signup' AND p.event_type = 'purchase'
        | AND epoch_us(p.ts::TIMESTAMP) >= epoch_us(s.ts::TIMESTAMP)
        | AND epoch_us(p.ts::TIMESTAMP)
        |     <= epoch_us(s.ts::TIMESTAMP) + 3600000000""".stripMargin),
      "Batch shadow of Streams.correlateStartDone: start events matched " +
        "to completions of the same user within [start, start+1h]. " +
        "Equi-join on user_id carries the shuffle; the interval " +
        "predicate filters inside the matched group — at 100 TB the " +
        "bucket-quantized form (range_join_bucketed) replaces the " +
        "in-group filter when per-key event counts are large."),

    // --------------------------------------------------------------- T6
    QueryDef(
      "capacity_gate_state",
      (s, d) => {
        import s.implicits._
        // restrict to the gate-relevant event types BEFORE keying, so the
        // Spark side sees exactly the oracle CTE's user set by
        // construction (a user with only other-typed events must not
        // surface as an all-zero state row)
        val ev = events(s, d)
          .filter(col("event_type")
            .isin("signup", "click", "purchase", "error"))
          .select(col("event_id"), col("user_id"), col("event_type"))
          .as[graft.streaming.JobEvent]
        graft.streaming.Streams.capacityGate(ev, 3).toDF()
          .select(col("user_id"), col("in_flight").cast("bigint"),
            col("admitted").cast("bigint"), col("rejected").cast("bigint"))
      },
      Some("""WITH RECURSIVE ev AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events
        |  WHERE event_type IN ('signup','click','purchase','error')),
        |rec AS (
        |  SELECT user_id, 0::BIGINT AS rn, 0::BIGINT AS in_flight,
        |         0::BIGINT AS admitted, 0::BIGINT AS rejected
        |  FROM (SELECT DISTINCT user_id FROM ev)
        |  UNION ALL
        |  SELECT r.user_id, r.rn + 1,
        |    CASE WHEN e.event_type IN ('signup','click')
        |         THEN CASE WHEN r.in_flight < 3
        |              THEN r.in_flight + 1 ELSE r.in_flight END
        |         ELSE CASE WHEN r.in_flight > 0
        |              THEN r.in_flight - 1 ELSE r.in_flight END END,
        |    r.admitted + CASE WHEN e.event_type IN ('signup','click')
        |                        AND r.in_flight < 3 THEN 1 ELSE 0 END,
        |    r.rejected + CASE WHEN e.event_type IN ('signup','click')
        |                        AND r.in_flight >= 3 THEN 1 ELSE 0 END
        |  FROM rec r JOIN ev e ON e.user_id = r.user_id AND e.rn = r.rn + 1)
        |SELECT user_id, in_flight, admitted, rejected FROM rec
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY rn DESC) = 1"""
        .stripMargin),
      "Batch twin of Streams.capacityGate (mapGroupsWithState runs in " +
        "batch mode with empty initial state): per-user admission gate " +
        "with capacity 3, folded in event_id order — signup/click admit " +
        "while under capacity, purchase/error release. The sequential " +
        "clamp [0, cap] has no window-function form, so the oracle " +
        "replays the fold as a recursive CTE; one shuffle on user_id, " +
        "O(1) state per key."),

    // --------------------------------------------------------------- T7
    QueryDef(
      "retry_gate_ladder",
      (s, d) => {
        import s.implicits._
        val ev = events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"))
          .as[graft.streaming.JobEvent]
        graft.streaming.Streams.retryGate(ev, 5).toDF()
          .select(col("user_id"), col("event_id"),
            col("failures").cast("bigint"),
            col("willRetry").as("will_retry"))
      },
      Some("""SELECT user_id, event_id, rn AS failures, rn <= 5 AS will_retry
        |FROM (SELECT user_id, event_id,
        |        (row_number() OVER (PARTITION BY user_id
        |           ORDER BY event_id))::BIGINT AS rn
        |      FROM events WHERE event_type = 'error')""".stripMargin),
      "Batch twin of Streams.retryGate (flatMapGroupsWithState in batch " +
        "mode): per-user failure ladder over error events in event_id " +
        "order — one decision per failure, retried while failures <= 5, " +
        "dead-lettered after. Equivalent to a per-user row_number over " +
        "errors, which is exactly the oracle."),
  )
}
