package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 38: warehouse staples and series diagnostics — vocabulary
  * confusable-pair mining (bounded Levenshtein), a generated calendar
  * dimension, the Durbin-Watson residual-autocorrelation statistic,
  * and ABC inventory classification.
  */
object Curation44Queries {

  val defs: Seq[QueryDef] = Seq(

    // ----------------------------------- confusable phrase pairs
    QueryDef(
      "confusable_token_pairs",
      (s, d) => {
        // Adjacent-bigram phrase vocabulary, blocked on the shared
        // first word: within a block, phrase distance reduces to edit
        // distance between the second tokens.
        val toks = split(col("text"), " ")
        val n = size(toks)
        val vocab = Tables.documents(s, d)
          .filter(n >= 2)
          .select(explode(zip_with(slice(toks, lit(1), n - 1),
            slice(toks, lit(2), n - 1),
            (a, b) => concat(a, lit("_"), b))).as("phrase"))
          .distinct()
          .withColumn("blk",
            substring_index(col("phrase"), "_", 1))
          .withColumn("len", length(col("phrase")))
        vocab.as("x").join(vocab.as("y"),
            col("x.blk") === col("y.blk") &&
              col("x.phrase") < col("y.phrase") &&
              abs(col("x.len") - col("y.len")) <= 2)
          .select(col("x.phrase").as("a"), col("y.phrase").as("b"),
            levenshtein(col("x.phrase"), col("y.phrase")).cast("long")
              .as("dist"))
          .filter(col("dist") <= 2)
      },
      Some("""WITH ph AS (SELECT DISTINCT
        |    concat(toks[i.i+1], '_', toks[i.i+2]) AS phrase
        |  FROM (SELECT string_split(text, ' ') AS toks FROM documents),
        |       (SELECT range AS i FROM range(0, 4096)) i
        |  WHERE len(toks) >= 2 AND i.i <= len(toks) - 2),
        |v AS (SELECT phrase, string_split(phrase, '_')[1] AS blk,
        |      len(phrase) AS l FROM ph)
        |SELECT x.phrase AS a, y.phrase AS b,
        |  levenshtein(x.phrase, y.phrase)::BIGINT AS dist
        |FROM v x JOIN v y ON x.blk = y.blk AND x.phrase < y.phrase
        | AND abs(x.l - y.l) <= 2
        |WHERE levenshtein(x.phrase, y.phrase) <= 2""".stripMargin),
      "Confusable-phrase mining: distinct adjacent-bigram phrases " +
        "within Levenshtein distance 2 of each other, " +
        "candidate-blocked on the shared first word (plus a length " +
        "band) so the quadratic runs per tiny block, never over the " +
        "cross product — the variant-clustering pass behind phrase " +
        "normalization dictionaries (the generate-all-edits dual of " +
        "did_you_mean_edit1: that probes a known query, this mines " +
        "the vocabulary).  Both engines evaluate the classic DP edit " +
        "distance — an exact integer.  Blocking keys shuffle the " +
        "DISTINCT phrase vocabulary, orders of magnitude smaller than " +
        "the corpus at 100 TB."),

    // ---------------------------------------- calendar dimension
    QueryDef(
      "calendar_dim_build",
      (s, d) => {
        val b = Tables.orders(s, d)
          .agg(min(col("o_orderdate")).as("d0"),
            max(col("o_orderdate")).as("d1"))
        b.select(explode(sequence(col("d0"), col("d1"),
            expr("INTERVAL 1 DAY"))).as("day"))
          .select(unix_micros(col("day").cast("timestamp")).as("date_us"),
            year(col("day")).cast("long").as("yr"),
            expr("(month(day) - 1) div 3 + 1").as("qtr"),
            month(col("day")).cast("long").as("mo"),
            dayofmonth(col("day")).cast("long").as("dom"),
            // day-of-week via epoch-day arithmetic (0 = Monday):
            // 1970-01-01 was a Thursday, hence the +3 offset — no
            // engine/locale WEEKDAY conventions involved.
            expr("(unix_micros(cast(day as timestamp))" +
              " div 86400000000 + 3) % 7").as("dow"))
          .withColumn("is_weekend", col("dow") >= 5)
          .withColumn("is_month_start", col("dom") === 1)
      },
      Some("""WITH b AS (SELECT min(o_orderdate) AS d0,
        |    max(o_orderdate) AS d1 FROM orders),
        |spine AS (SELECT unnest(generate_series(d0, d1,
        |    INTERVAL 1 DAY)) AS day FROM b)
        |SELECT epoch_us(day::TIMESTAMP) AS date_us,
        |  year(day)::BIGINT AS yr,
        |  ((month(day) - 1) // 3 + 1)::BIGINT AS qtr,
        |  month(day)::BIGINT AS mo,
        |  day(day)::BIGINT AS dom,
        |  ((epoch_us(day::TIMESTAMP) // 86400000000 + 3) % 7)::BIGINT
        |    AS dow,
        |  ((epoch_us(day::TIMESTAMP) // 86400000000 + 3) % 7) >= 5
        |    AS is_weekend,
        |  (day(day) = 1) AS is_month_start
        |FROM spine""".stripMargin),
      "Generated calendar dimension spanning the fact table's date " +
        "range: year/quarter/month/day plus a day-of-week computed by " +
        "EPOCH-DAY ARITHMETIC (0 = Monday) rather than any engine " +
        "WEEKDAY function — locale/ISO convention differences are the " +
        "classic cross-engine calendar trap, and modular arithmetic on " +
        "epoch days sidesteps them entirely.  The spine generates from " +
        "a broadcast 1-row min/max; a date dim is the canonical " +
        "broadcast-side table for every calendar rollup downstream " +
        "(date_spine_gapfill, seasonality_profile)."),

    // ------------------------------------ Durbin-Watson statistic
    QueryDef(
      "durbin_watson_daily",
      (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        val daily = Tables.events(s, d)
          .select(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("c"))
        // residuals vs the per-type mean, cross-multiplied by n so
        // everything stays integer: e_t = n*c_t - S.  The common n^2
        // factor cancels in the DW ratio, so numerator uses n^2*(dc)^2.
        val stats = daily
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy(col("event_type"))))
          .withColumn("ssum", sum(col("c")).over(
            Window.partitionBy(col("event_type"))))
          .withColumn("dc", col("c") - lag(col("c"), 1).over(w))
        stats.groupBy(col("event_type"))
          .agg(max(col("n")).as("n_days"),
            sum(when(col("dc").isNotNull,
              col("n") * col("n") * col("dc") * col("dc"))).as("num"),
            sum((col("n") * col("c") - col("ssum")) *
              (col("n") * col("c") - col("ssum"))).as("den"))
          .select(col("event_type"), col("n_days"),
            expr("(1000 * num) div greatest(den, 1)").as("dw_e3"))
      },
      Some("""WITH daily AS (SELECT event_type,
        |    date_trunc('day', ts) AS day, count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, day, c,
        |    count(*) OVER (PARTITION BY event_type)::BIGINT AS n,
        |    sum(c) OVER (PARTITION BY event_type)::BIGINT AS ssum,
        |    c - lag(c) OVER (PARTITION BY event_type ORDER BY day) AS dc
        |  FROM daily)
        |SELECT event_type, max(n)::BIGINT AS n_days,
        |  ((1000 * sum(CASE WHEN dc IS NOT NULL
        |                    THEN n * n * dc * dc END))
        |   // greatest(sum((n * c - ssum) * (n * c - ssum)), 1))::BIGINT
        |    AS dw_e3
        |FROM st GROUP BY event_type""".stripMargin),
      "Durbin-Watson statistic of each type's daily-count residuals " +
        "(vs the series mean): DW = sum((e_t - e_{t-1})^2) / " +
        "sum(e_t^2), ~2000 e3 for no autocorrelation, toward 0 for " +
        "positive, toward 4000 for negative — the lag-1 dependence " +
        "diagnostic that says whether day-over-day noise is " +
        "independent (autocorr_lag1 reports the correlation itself; " +
        "DW is the regression-residual test form).  Residuals are " +
        "cross-multiplied by n so the whole statistic is exact " +
        "integer arithmetic; the mean's n^2 scale cancels in the " +
        "ratio.  Daily reduction first — the windows run on ~30 rows " +
        "per type."),

    // ---------------------------------- ABC inventory classification
    QueryDef(
      "abc_part_classification",
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .select(col("l_partkey"),
            (floor(col("l_extendedprice") * 100).cast("long") *
              (lit(100L) - floor(col("l_discount") * 100).cast("long")))
              .as("rev_e4"))
          .groupBy(col("l_partkey"))
          .agg(sum(col("rev_e4")).as("revenue_e4"))
        // |parts| grows with the catalog: the cumulative pass executes
        // as ScalablePrefix (range partition + offsets) and the total
        // broadcasts from a plain aggregate — no single-partition window
        val tot = rev.agg(sum(col("revenue_e4")).as("tot_e4"))
        graft.operators.ScalablePrefix.withRunningSums(rev,
            Seq(col("revenue_e4").desc, col("l_partkey")),
            Seq("revenue_e4"), 8)
          .withColumnRenamed("cum_revenue_e4", "cum_e4")
          .crossJoin(broadcast(tot))
          .select(col("l_partkey"), col("revenue_e4"),
            expr("(1000 * cum_e4) div tot_e4").as("cum_share_permille"),
            when(expr("100 * cum_e4 <= 80 * tot_e4"), lit("A"))
              .when(expr("100 * cum_e4 <= 95 * tot_e4"), lit("B"))
              .otherwise(lit("C")).as("abc_class"))
      },
      Some("""WITH rev AS (SELECT l_partkey,
        |    sum((floor(l_extendedprice * 100)::BIGINT)
        |        * (100 - floor(l_discount * 100)::BIGINT))::BIGINT
        |      AS revenue_e4
        |  FROM lineitem GROUP BY 1),
        |cum AS (SELECT l_partkey, revenue_e4,
        |    sum(revenue_e4) OVER (ORDER BY revenue_e4 DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      ::BIGINT AS cum_e4,
        |    sum(revenue_e4) OVER ()::BIGINT AS tot_e4
        |  FROM rev)
        |SELECT l_partkey, revenue_e4,
        |  ((1000 * cum_e4) // tot_e4)::BIGINT AS cum_share_permille,
        |  (CASE WHEN 100 * cum_e4 <= 80 * tot_e4 THEN 'A'
        |        WHEN 100 * cum_e4 <= 95 * tot_e4 THEN 'B'
        |        ELSE 'C' END) AS abc_class
        |FROM cum""".stripMargin),
      "ABC inventory classification: parts ranked by exact e4 revenue, " +
        "cumulative-share cutoffs at 80% (A) and 95% (B) decided by " +
        "CROSS-MULTIPLIED integer comparisons — the Pareto " +
        "segmentation every supply-chain rollup starts from " +
        "(lorenz_user_concentration's cousin on the parts ledger).  " +
        "The per-part agg is distributed; the cumulative pass EXECUTES " +
        "as the two-phase range-partitioned cumsum (ScalablePrefix), " +
        "so the |parts| table — millions at 100 TB — never lands on " +
        "one task."),
  )
}
