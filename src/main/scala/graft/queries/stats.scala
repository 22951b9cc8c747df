package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Statistical profiling over the corpus and event tables: grouped OLS
  * trend, Pearson correlation, a two-proportion z-test, Gini
  * concentration, Benford first-digit profiling, and MAD-based robust
  * outlier flagging.  The reference's evaluation layer reduces every
  * sweep to summary statistics over per-run tables
  * (rag_evaluation/RAG-eval-test_model.py:149-158 aggregates rank lists
  * to means; train_adapters/create_all_models.py:39-40 sweeps a grid
  * whose output is inspected as a trend over the epoch axis) — these
  * operators are that layer as engine primitives.
  *
  * Determinism contract (see [[graft.Det]]): every statistic is built
  * from exact integer moments (sums of products of integer columns),
  * order-independent under any partitioning; the only floating-point
  * steps are a fixed sequence of IEEE ops (casts, one division, sqrt)
  * applied identically in Spark and the DuckDB oracle, so results are
  * bit-identical without banning floats entirely.
  */
object StatsQueries {

  /** (lang, x=token count, y=n_chars) substrate for trend/correlation. */
  private def xy(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("lang"),
      size(split(col("text"), " ")).cast("long").as("x"),
      col("n_chars").as("y"))

  private val xySql =
    """xy AS (SELECT lang, len(string_split(text, ' '))::BIGINT AS x,
      |              n_chars AS y FROM documents)""".stripMargin

  /** Integer moments per lang: n, Sx, Sy, Sxy, Sxx, Syy — one shuffle,
    * partial-aggregatable, exact in int64 well past sf1 (operand bound
    * ~1e15 vs int64 max 9.2e18). */
  private def moments(s: SparkSession, d: String): DataFrame =
    xy(s, d).groupBy(col("lang")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))

  private val momentsSql =
    s"""$xySql,
      |m AS (SELECT lang, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
      |        sum(y)::BIGINT AS sy, sum(x*y)::BIGINT AS sxy,
      |        sum(x*x)::BIGINT AS sxx, sum(y*y)::BIGINT AS syy
      |      FROM xy GROUP BY lang)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------ grouped OLS
    QueryDef(
      "grouped_ols_trend",
      (s, d) => moments(s, d).select(
        col("lang"), col("n").as("n_docs"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("slope"),
        ((col("sy").cast("double") -
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            col("sx").cast("double")) / col("n").cast("double"))
          .as("intercept")),
      Some(s"""WITH $momentsSql
        |SELECT lang, n AS n_docs,
        |  (n*sxy - sx*sy)::BIGINT::DOUBLE
        |    / (n*sxx - sx*sx)::BIGINT::DOUBLE AS slope,
        |  (sy::DOUBLE - ((n*sxy - sx*sy)::BIGINT::DOUBLE
        |      / (n*sxx - sx*sx)::BIGINT::DOUBLE) * sx::DOUBLE)
        |    / n::DOUBLE AS intercept
        |FROM m""".stripMargin),
      "Closed-form per-group OLS (chars-per-token trend per language) " +
        "from one pass of integer cross-moments: slope = (nSxy-SxSy)/" +
        "(nSxx-Sx^2). The moment sums are exact int64 and partial-" +
        "aggregatable (one shuffle on lang, map-side combine); the " +
        "slope/intercept are a fixed IEEE op sequence over exact " +
        "integers, bit-identical cross-engine. At 100 TB this is the " +
        "same single groupBy — regression over a trillion rows costs " +
        "one agg, no iterative solver."),

    // ------------------------------------------- Pearson correlation
    QueryDef(
      "pearson_corr_lang",
      (s, d) => moments(s, d).select(
        col("lang"), col("n").as("n_docs"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("pearson_r")),
      Some(s"""WITH $momentsSql
        |SELECT lang, n AS n_docs,
        |  (n*sxy - sx*sy)::BIGINT::DOUBLE
        |    / (sqrt((n*sxx - sx*sx)::BIGINT::DOUBLE)
        |       * sqrt((n*syy - sy*sy)::BIGINT::DOUBLE)) AS pearson_r
        |FROM m""".stripMargin),
      "Per-group Pearson r between token count and char length from the " +
        "same one-pass integer moments as grouped_ols_trend (Catalyst " +
        "dedups the shared agg subtree when both run). corr() built-ins " +
        "stream float partials whose merge order varies run to run; the " +
        "integer-moment form is order-independent by construction, with " +
        "a fixed 4-op IEEE tail (2 casts+sqrt, mul, div)."),

    // --------------------------------------- two-proportion z-test
    QueryDef(
      "two_proportion_ztest",
      (s, d) => {
        val e = Tables.events(s, d)
        val agg = e.agg(
          count(when(pmod(col("user_id"), lit(2)) === 0 &&
            col("event_type") === "purchase", 1)).as("x1"),
          count(when(pmod(col("user_id"), lit(2)) === 0, 1)).as("n1"),
          count(when(pmod(col("user_id"), lit(2)) === 1 &&
            col("event_type") === "purchase", 1)).as("x2"),
          count(when(pmod(col("user_id"), lit(2)) === 1, 1)).as("n2"))
        agg.select(col("x1"), col("n1"), col("x2"), col("n2"),
          (((col("x1") * col("n2") - col("x2") * col("n1")).cast("double") *
            (col("x1") * col("n2") - col("x2") * col("n1")).cast("double") *
            (col("n1") + col("n2")).cast("double")) /
            ((col("n1") * col("n2")).cast("double") *
              (col("x1") + col("x2")).cast("double") *
              (col("n1") + col("n2") - col("x1") - col("x2")).cast("double")))
            .as("z2"))
      },
      Some("""WITH agg AS (SELECT
        |  count(*) FILTER (WHERE user_id % 2 = 0 AND event_type = 'purchase')::BIGINT AS x1,
        |  count(*) FILTER (WHERE user_id % 2 = 0)::BIGINT AS n1,
        |  count(*) FILTER (WHERE user_id % 2 = 1 AND event_type = 'purchase')::BIGINT AS x2,
        |  count(*) FILTER (WHERE user_id % 2 = 1)::BIGINT AS n2
        |  FROM events)
        |SELECT x1, n1, x2, n2,
        |  (x1*n2 - x2*n1)::BIGINT::DOUBLE * (x1*n2 - x2*n1)::BIGINT::DOUBLE
        |    * (n1 + n2)::BIGINT::DOUBLE
        |  / ((n1*n2)::BIGINT::DOUBLE * (x1 + x2)::BIGINT::DOUBLE
        |     * (n1 + n2 - x1 - x2)::BIGINT::DOUBLE) AS z2
        |FROM agg""".stripMargin),
      "A/B conversion significance (pooled two-proportion z^2, the " +
        "square of the z statistic): cross-multiplied so the only " +
        "inputs to floating point are four exact int64 counts from one " +
        "conditional-count pass — no per-row float ever aggregated. " +
        "z2 = (x1n2-x2n1)^2 (n1+n2) / (n1 n2 x (n-x)). One full scan, " +
        "one 4-counter partial agg: unchanged at 100 TB."),

    // --------------------------------------------- Gini coefficient
    QueryDef(
      "gini_length_concentration",
      (s, d) => {
        // per-source ascending rank via ScalableGroups (range exchange
        // on (source, n_chars, doc_id) + broadcast per-source offsets)
        // — the source-partitioned row_number window would concentrate
        // corpus/|source| rows per task
        val ranked = graft.operators.ScalableGroups.withGroupRank(
            Tables.documents(s, d)
              .select(col("source"), col("n_chars"), col("doc_id")),
            Seq("source"), Seq(col("n_chars"), col("doc_id")), 8,
            rankCol = "i", sizeCol = "__gn")
        ranked.groupBy(col("source")).agg(
            count(lit(1)).as("n"),
            sum(col("n_chars")).as("sx"),
            sum(col("i") * col("n_chars")).as("six"))
          .select(col("source"), col("n").as("n_docs"),
            expr("(1000000 * (2*six - (n+1)*sx)) div (n * sx)")
              .as("gini_e6"))
      },
      Some("""WITH ranked AS (SELECT source, n_chars, row_number() OVER (
        |    PARTITION BY source ORDER BY n_chars, doc_id)::BIGINT AS i
        |  FROM documents),
        |m AS (SELECT source, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS sx,
        |        sum(i * n_chars)::BIGINT AS six
        |      FROM ranked GROUP BY source)
        |SELECT source, n AS n_docs,
        |  ((1000000 * (2*six - (n+1)*sx)) // (n * sx))::BIGINT AS gini_e6
        |FROM m""".stripMargin),
      "Gini concentration of document length per source — detects " +
        "sources whose length mass is dominated by a few documents " +
        "(a curation skew signal). Sorted-rank formula G = " +
        "(2 Sum(i x_i) - (n+1) Sum(x)) / (n Sum(x)) over ascending " +
        "order statistics; all-integer, numerator provably >= 0 " +
        "and the 1e6 scale keeps div exact-floor on both " +
        "engines (operands positive). The rank IS ScalableGroups' " +
        "range-partitioned dense index minus a broadcast per-source " +
        "offset — every source splits across tasks, so a 100 TB " +
        "source costs one range exchange, never a single-task sort."),

    // --------------------------------------- Benford digit profile
    QueryDef(
      "benford_first_digit",
      (s, d) => {
        val digits = Tables.orders(s, d).select(
          substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
            .cast("long").as("digit"))
        digits.groupBy(col("digit"))
          .agg(count(lit(1)).as("cnt"))
          // total via a window over the <=9-row grouped result — never
          // a driver action or a full-table single-partition shuffle
          .withColumn("total", sum(col("cnt")).over(Window.partitionBy()))
          .select(col("digit"), col("cnt"),
            expr("(1000 * cnt) div total").as("permille"))
      },
      Some("""WITH digits AS (SELECT
        |    substr(floor(o_totalprice)::BIGINT::VARCHAR, 1, 1)::BIGINT AS digit
        |  FROM orders),
        |g AS (SELECT digit, count(*)::BIGINT AS cnt FROM digits GROUP BY digit)
        |SELECT digit, cnt,
        |  ((1000 * cnt) // sum(cnt) OVER ())::BIGINT AS permille
        |FROM g""".stripMargin),
      "Benford first-digit profile of order totals — the classic " +
        "anomaly screen for fabricated or truncated numeric columns in " +
        "an ingested corpus. Digit extraction via exact int64 floor + " +
        "string head (both engines render integers identically); the " +
        "denominator is a count scalar (driver-side here; a scalar " +
        "subquery/broadcast at scale, never a per-row shuffle)."),

    // ------------------------------------------- MAD outlier flag
    QueryDef(
      "mad_outlier_flag",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("n_chars"))
        // exact per-lang lower median via ScalableGroups rank (range
        // exchange + broadcast lang offsets) — the lang-partitioned
        // row_number would funnel corpus/|lang| rows per task
        def lowerMedian(in: DataFrame, valueCol: String, out: String): DataFrame =
          graft.operators.ScalableGroups.withGroupRank(in, Seq("lang"),
              Seq(col(valueCol), col("doc_id")), 8, "rn", "cnt")
            .filter(col("rn") === expr("(cnt + 1) div 2")) // lower median
            .select(col("lang"), col(valueCol).as(out))
        val med = lowerMedian(docs, "n_chars", "med")
        val dev = docs.join(med, "lang")
          .withColumn("dev", abs(col("n_chars") - col("med")))
        val mad = lowerMedian(
          dev.select(col("doc_id"), col("lang"), col("dev")), "dev", "mad")
        dev.join(mad, "lang")
          .filter(col("dev") * 2 > lit(3) * col("mad"))
          .select(col("doc_id"), col("lang"), col("dev"), col("mad"))
      },
      Some("""WITH docs AS (SELECT doc_id, lang, n_chars FROM documents),
        |med AS (SELECT lang, n_chars AS med FROM (
        |    SELECT lang, n_chars, doc_id,
        |      row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
        |      count(*) OVER (PARTITION BY lang) AS cnt
        |    FROM docs) WHERE rn = (cnt + 1) // 2),
        |dev AS (SELECT d.doc_id, d.lang, abs(d.n_chars - m.med) AS dev
        |        FROM docs d JOIN med m USING (lang)),
        |mad AS (SELECT lang, dev AS mad FROM (
        |    SELECT lang, dev, doc_id,
        |      row_number() OVER (PARTITION BY lang ORDER BY dev, doc_id) AS rn,
        |      count(*) OVER (PARTITION BY lang) AS cnt
        |    FROM dev) WHERE rn = (cnt + 1) // 2)
        |SELECT v.doc_id, v.lang, v.dev, a.mad
        |FROM dev v JOIN mad a USING (lang)
        |WHERE v.dev * 2 > 3 * a.mad""".stripMargin),
      "Robust outlier detection: flag documents whose |len - median| " +
        "exceeds 1.5x the median absolute deviation, per language " +
        "(cross-multiplied 2*dev > 3*MAD, integer-exact). " +
        "Medians are exact lower order statistics ((n+1) div 2, ties " +
        "broken by doc_id — value-identical under any tiebreak), so " +
        "the whole operator is integer-exact. Two rank passes + two " +
        "small broadcast joins of the 5-row per-lang statistics; at " +
        "100 TB the exact median swaps to approx_percentile with the " +
        "filter unchanged (length_outlier_filter shows that path)."),

    // ----------------------------------- deterministic bootstrap CI
    QueryDef(
      "bootstrap_ci_mean_length",
      (s, d) => {
        // 16 deterministic half-sample replicas: doc d enters replica b
        // iff md5(d*31+b) is even — a subsampling bootstrap whose draws
        // are pure expressions (no RNG state, engine-portable)
        val reps = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .crossJoin(broadcast(
            s.range(0, 16).select(col("id").as("b"))))
          .filter(
            pmod(conv(substring(md5(
              (col("doc_id") * 31 + col("b")).cast("string")), 1, 8), 16, 10)
              .cast("long"), lit(2)) === 0)
        val means = reps.groupBy(col("lang"), col("b"))
          .agg(expr("(1000 * sum(n_chars)) div count(*)").as("mean_e3"))
        means.groupBy(col("lang")).agg(
          count(lit(1)).as("n_replicas"),
          min(col("mean_e3")).as("mean_lo_e3"),
          max(col("mean_e3")).as("mean_hi_e3"),
          (max(col("mean_e3")) - min(col("mean_e3"))).as("spread_e3"))
      },
      Some("""WITH reps AS (SELECT d.lang, d.n_chars, b.b
        |  FROM documents d, (SELECT range AS b FROM range(0, 16)) b
        |  WHERE (('0x' || substr(md5((d.doc_id * 31 + b.b)::VARCHAR), 1, 8))
        |         ::BIGINT % 2) = 0),
        |means AS (SELECT lang, b,
        |    ((1000 * sum(n_chars)) // count(*))::BIGINT AS mean_e3
        |  FROM reps GROUP BY lang, b)
        |SELECT lang, count(*)::BIGINT AS n_replicas,
        |  min(mean_e3) AS mean_lo_e3, max(mean_e3) AS mean_hi_e3,
        |  (max(mean_e3) - min(mean_e3))::BIGINT AS spread_e3
        |FROM means GROUP BY lang""".stripMargin),
      "Resampling-based uncertainty for a pipeline statistic: 16 " +
        "deterministic half-sample replicas (membership = parity of an " +
        "md5 over (doc, replica) — reproducible on any engine or " +
        "cluster, unlike rand()-seeded draws), per-replica exact " +
        "integer means, envelope reported as the CI proxy. The replica " +
        "fan-out is a broadcast of 16 ids — the scan cost is 16x but " +
        "embarrassingly parallel and partial-aggregated; at 100 TB " +
        "replicas ride ONE scan as 16 conditional aggregates instead " +
        "(sum(case when parity(b) ...)), same algebra."),
  )
}
