package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Rank-based statistics: weighted median, Mann-Whitney U, and Spearman
  * rank correlation — the nonparametric layer over corpus statistics,
  * where distributional assumptions fail (document lengths are heavy-
  * tailed, so mean/stddev tests mislead; the reference's evaluation
  * reduces to rank lists for exactly this reason,
  * rag_evaluation/RAG-eval-test_model.py:145-158).
  *
  * All ranks use the average-rank tie convention DOUBLED to stay in
  * exact integers (the average of a consecutive integer run times 2 is
  * an integer), so every statistic is order-independent and engine-
  * portable without a single float until the final fixed IEEE tail.
  */
object Stats2Queries {

  val defs: Seq[QueryDef] = Seq(

    // -------------------------------------------- weighted median
    QueryDef(
      "weighted_median_length",
      (s, d) => {
        val rows = Tables.documents(s, d).select(col("source"),
          col("doc_id"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("w"))
        // per-source running weight via ScalableGroups (range exchange
        // on (source, n_chars, doc_id) + broadcast source offsets) and
        // the 5-row per-source total broadcast back — no enum window
        val totals = rows.groupBy(col("source"))
          .agg(sum(col("w")).as("totw"))
        val cum = graft.operators.ScalableGroups.withGroupRunningSums(
            rows, Seq("source"), Seq(col("n_chars"), col("doc_id")),
            Seq("w"), 8, prefix = "cumw_")
          .withColumnRenamed("cumw_w", "cumw")
          .join(broadcast(totals), "source")
        // qualifying rows form a suffix of the sort order, so min() over
        // them is the boundary value — the weighted lower median
        cum.filter(col("cumw") * 2 >= col("totw"))
          .groupBy(col("source"))
          .agg(min(col("n_chars")).as("weighted_median"),
            max(col("totw")).as("total_weight"))
      },
      Some("""WITH rows_ AS (SELECT source, doc_id, n_chars,
        |    len(string_split(text, ' '))::BIGINT AS w FROM documents),
        |cum AS (SELECT source, n_chars,
        |    sum(w) OVER (PARTITION BY source ORDER BY n_chars, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |    sum(w) OVER (PARTITION BY source) AS totw
        |  FROM rows_)
        |SELECT source, min(n_chars) AS weighted_median,
        |  max(totw)::BIGINT AS total_weight
        |FROM cum WHERE cumw * 2 >= totw GROUP BY source""".stripMargin),
      "Token-weighted median document length per source: the median " +
        "where each document votes with its token count — the length " +
        "statistic that matches how a token-budgeted training run " +
        "actually consumes the corpus. One windowed cumulative weight " +
        "per source + a suffix-min; all integer. The unweighted " +
        "median (quantile_by_lang) and this differ exactly when long " +
        "docs dominate token mass — the gap is itself a skew signal."),

    // -------------------------------------------- Mann-Whitney U
    QueryDef(
      "mann_whitney_u",
      (s, d) => {
        val vals = Tables.documents(s, d)
          .filter(col("lang").isin("en", "de"))
          .select(col("lang"), col("n_chars").as("v"))
        // Rank sums only ever consume the VALUE HISTOGRAM, so compact to
        // distinct v first (one shuffle, partial-aggregated), then take
        // running totals with ScalablePrefix — the merged-histogram rank.
        // Min-rank of v = cum_cnt(<v) + 1, so the doubled average rank is
        // ar2 = 2*min_rank + cnt - 1 = 2*cum_cnt(<=v) - cnt + 1; no row
        // of the corpus ever passes through an unpartitioned window.
        val hist = vals.groupBy(col("v")).agg(
          count(when(col("lang") === "en", 1)).as("ce"),
          count(lit(1)).as("cnt"))
        val cum = graft.operators.ScalablePrefix
          .withRunningSums(hist, Seq(col("v")), Seq("cnt"), 8)
        val agg = cum.groupBy().agg(
          sum(col("ce") * (col("cum_cnt") * 2 - col("cnt") + 1)).as("r1x2"),
          sum(col("ce")).as("n1"),
          sum(col("cnt") - col("ce")).as("n2"))
        agg.select(col("n1"), col("n2"),
            (col("r1x2") - col("n1") * (col("n1") + 1)).as("u1_x2"))
          .select(col("n1"), col("n2"), col("u1_x2"),
            (col("n1") * col("n2") * 2 - col("u1_x2")).as("u2_x2"),
            expr("(1000 * (u1_x2 - (n1 * n2 * 2 - u1_x2))) div (2 * n1 * n2)")
              .as("rank_biserial_e3"))
      },
      Some("""WITH vals AS (SELECT lang, n_chars AS v FROM documents
        |        WHERE lang IN ('en', 'de')),
        |ranked AS (SELECT lang,
        |    rank() OVER (ORDER BY v)::BIGINT * 2
        |      + count(*) OVER (PARTITION BY v) - 1 AS ar2
        |  FROM vals),
        |agg AS (SELECT
        |    sum(CASE WHEN lang = 'en' THEN ar2 END)::BIGINT AS r1x2,
        |    count(CASE WHEN lang = 'en' THEN 1 END)::BIGINT AS n1,
        |    count(CASE WHEN lang = 'de' THEN 1 END)::BIGINT AS n2
        |  FROM ranked),
        |u AS (SELECT n1, n2, (r1x2 - n1 * (n1 + 1))::BIGINT AS u1_x2
        |      FROM agg)
        |SELECT n1, n2, u1_x2, (n1 * n2 * 2 - u1_x2)::BIGINT AS u2_x2,
        |  ((1000 * (u1_x2 - (n1 * n2 * 2 - u1_x2))) // (2 * n1 * n2))
        |    ::BIGINT AS rank_biserial_e3
        |FROM u""".stripMargin),
      "Mann-Whitney U (two-sample rank test, en vs de lengths) with " +
        "the rank-biserial effect size: doubled average ranks keep tie " +
        "handling in exact integers, so U is reproducible to the last " +
        "bit — the nonparametric alternative to two_proportion_ztest " +
        "for ordinal comparisons. Executed as the merged-histogram " +
        "rank: compact to distinct values (partial-aggregated), then " +
        "ScalablePrefix running counts over the value order — no " +
        "unpartitioned window, no task ever holds more than its range " +
        "partition of the (bounded) value support."),

    // ------------------------------- native bounded top-k aggregate
    QueryDef(
      "topk_lengths_agg",
      (s, d) => Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(graft.functions.TopKLongsAgg
          .topkLongs(col("n_chars"), 5).as("top5_arr"))
        // CSV-stringified top-k: scalar-sortable rows for the oracle
        // hash-compare (pandas can't sort ndarray cells).
        .select(col("lang"),
          expr("array_join(transform(top5_arr, x -> cast(x AS string)), ',')")
            .as("top5_chars")),
      Some("""SELECT lang,
        |  array_to_string((list(n_chars ORDER BY n_chars DESC, doc_id))[1:5], ',')
        |    AS top5_chars
        |FROM documents GROUP BY lang""".stripMargin),
      "Grouped top-k through the native TopKLongsAgg " +
        "TypedImperativeAggregate: a k-bounded min-heap per group, " +
        "serialized between partial and final aggregation, so each " +
        "map task ships at most k longs per group — no sort, no " +
        "window buffering, the aggregate-function form of the " +
        "two-phase WindowGroupLimit shape (topk_terms_per_lang shows " +
        "the window form; this one composes into any agg list). " +
        "Value-identical to the sorted-list oracle because ties are " +
        "interchangeable values."),

    // ------------------------------------ incremental stats merge
    QueryDef(
      "incremental_moments_merge",
      (s, d) => {
        // yesterday's summary (even doc_ids) + today's increment (odd):
        // merged moments must equal a full rescan — the algebraic
        // identity that lets daily stats update in O(increment)
        def moments(pred: org.apache.spark.sql.Column) =
          Tables.documents(s, d).filter(pred)
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s1"),
              sum(col("n_chars") * col("n_chars")).as("s2"))
        val old = moments(pmod(col("doc_id"), lit(2)) === 0)
        val inc = moments(pmod(col("doc_id"), lit(2)) === 1)
        old.unionByName(inc)
          .groupBy(col("lang"))
          .agg(sum(col("n")).as("n"), sum(col("s1")).as("s1"),
            sum(col("s2")).as("s2"))
          .select(col("lang"), col("n"),
            expr("(1000 * s1) div n").as("mean_e3"),
            expr("(1000000 * (n * s2 - s1 * s1)) div (n * n)").as("var_e6"))
      },
      Some("""WITH m AS (SELECT lang, doc_id % 2 AS half,
        |    count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS s1,
        |    sum(n_chars * n_chars)::BIGINT AS s2
        |  FROM documents GROUP BY lang, doc_id % 2),
        |merged AS (SELECT lang, sum(n)::BIGINT AS n, sum(s1)::BIGINT AS s1,
        |        sum(s2)::BIGINT AS s2
        |      FROM m GROUP BY lang)
        |SELECT lang, n,
        |  ((1000 * s1) // n)::BIGINT AS mean_e3,
        |  ((1000000 * (n * s2 - s1 * s1)) // (n * n))::BIGINT AS var_e6
        |FROM merged""".stripMargin),
      "Incremental statistics maintenance: yesterday's per-group moment " +
        "summary (n, sum, sum-of-squares) merges with today's increment " +
        "by plain addition, and the merged mean/variance are exactly " +
        "what a full rescan computes — the algebraic property (moments " +
        "form a commutative monoid) that turns daily 100 TB stat " +
        "refreshes into O(increment) jobs. StatsSpec pins merged == " +
        "direct; the same identity is why every agg in this engine " +
        "partial-aggregates map-side."),

    // -------------------------------------------- Spearman rho
    QueryDef(
      "spearman_rho_lang",
      (s, d) => {
        val base = Tables.documents(s, d).select(col("lang"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("x"),
          col("n_chars").as("y"))
        // Doubled average ranks from the per-(lang, value) HISTOGRAM —
        // the merged-histogram rank (mann_whitney_u pattern), here
        // per-lang: compact to distinct values first, take per-lang
        // running counts via ScalableGroups (range exchange + broadcast
        // lang offsets), then ar2 = 2*cum(<=v) - cnt + 1 joins back on
        // the fine-grained (lang, value) key.  No corpus row ever
        // passes through a lang-partitioned window.
        def ar2(c: String, out: String) = {
          val hist = base.groupBy(col("lang"), col(c))
            .agg(count(lit(1)).as("cnt"))
          graft.operators.ScalableGroups.withGroupRunningSums(
              hist, Seq("lang"), Seq(col(c)), Seq("cnt"), 8)
            .select(col("lang"), col(c),
              (col("cum_cnt") * 2 - col("cnt") + 1).as(out))
        }
        val ranked = base
          .join(ar2("x", "rx"), Seq("lang", "x"))
          .join(ar2("y", "ry"), Seq("lang", "y"))
        val m = ranked.groupBy(col("lang")).agg(
          count(lit(1)).as("n"),
          sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
          sum(col("rx") * col("ry")).as("sxy"),
          sum(col("rx") * col("rx")).as("sxx"),
          sum(col("ry") * col("ry")).as("syy"))
        m.select(col("lang"), col("n").as("n_docs"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
              sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
            .as("spearman_rho"))
      },
      Some("""WITH base AS (SELECT lang, doc_id,
        |    len(string_split(text, ' '))::BIGINT AS x, n_chars AS y
        |  FROM documents),
        |ranked AS (SELECT lang,
        |    rank() OVER (PARTITION BY lang ORDER BY x)::BIGINT * 2
        |      + count(*) OVER (PARTITION BY lang, x) - 1 AS rx,
        |    rank() OVER (PARTITION BY lang ORDER BY y)::BIGINT * 2
        |      + count(*) OVER (PARTITION BY lang, y) - 1 AS ry
        |  FROM base),
        |m AS (SELECT lang, count(*)::BIGINT AS n,
        |    sum(rx)::BIGINT AS sx, sum(ry)::BIGINT AS sy,
        |    sum(rx*ry)::BIGINT AS sxy, sum(rx*rx)::BIGINT AS sxx,
        |    sum(ry*ry)::BIGINT AS syy
        |  FROM ranked GROUP BY lang)
        |SELECT lang, n AS n_docs,
        |  (n*sxy - sx*sy)::BIGINT::DOUBLE
        |    / (sqrt((n*sxx - sx*sx)::BIGINT::DOUBLE)
        |       * sqrt((n*syy - sy*sy)::BIGINT::DOUBLE)) AS spearman_rho
        |FROM m""".stripMargin),
      "Spearman rank correlation per language (token count vs char " +
        "length): Pearson machinery applied to doubled average ranks — " +
        "tie-exact integers end to end, with the same fixed 4-op IEEE " +
        "tail as pearson_corr_lang. Monotone-but-nonlinear association " +
        "that Pearson understates shows up here first; ranks come from " +
        "the per-(lang, value) histogram through ScalableGroups " +
        "running counts — value-bounded state, fine-grained join keys, " +
        "no enum-partitioned window over corpus rows."),
  )
}
