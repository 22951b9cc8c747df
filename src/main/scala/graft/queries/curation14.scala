package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Round-4 continuation batch 8: distribution testing and calibrated
  * gating — the exact two-sample Kolmogorov-Smirnov statistic and a
  * split-conformal quality threshold.
  */
object Curation14Queries {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------ two-sample KS
    QueryDef(
      "ks_two_sample",
      (s, d) => {
        val lens = Tables.documents(s, d)
          .filter(col("lang").isin("en", "de"))
          .select(col("lang"), length(col("text")).cast("long").as("v"))
        val counts = lens.groupBy(col("v")).agg(
          count(when(col("lang") === "en", 1)).as("ce"),
          count(when(col("lang") === "de", 1)).as("cd"))
        // Cumulative CDFs over the value support via ScalablePrefix
        // (range partition + per-partition offsets), not an unpartitioned
        // window: the support is already compacted by the groupBy, and
        // the running sums never collapse it onto one task.
        val cum = graft.operators.ScalablePrefix
          .withRunningSums(counts, Seq(col("v")), Seq("ce", "cd"), 8)
          .withColumnRenamed("cum_ce", "fe")
          .withColumnRenamed("cum_cd", "fd")
        val totals = lens.agg(
          count(when(col("lang") === "en", 1)).as("n"),
          count(when(col("lang") === "de", 1)).as("m"))
        cum.crossJoin(broadcast(totals))
          .select(col("n"), col("m"),
            abs(col("fe") * col("m") - col("fd") * col("n")).as("dist"))
          .groupBy(col("n"), col("m"))
          .agg(max(col("dist")).as("d_scaled"))
          .select(col("n"), col("m"), col("d_scaled"),
            expr("(d_scaled * 1000) div (n * m)").as("d_permille"))
      },
      Some("""WITH lens AS (
        |  SELECT lang, length(text)::BIGINT AS v FROM documents
        |  WHERE lang IN ('en', 'de')),
        |counts AS (SELECT v,
        |    count(CASE WHEN lang = 'en' THEN 1 END)::BIGINT AS ce,
        |    count(CASE WHEN lang = 'de' THEN 1 END)::BIGINT AS cd
        |  FROM lens GROUP BY v),
        |cum AS (SELECT v,
        |    (sum(ce) OVER (ORDER BY v))::BIGINT AS fe,
        |    (sum(cd) OVER (ORDER BY v))::BIGINT AS fd
        |  FROM counts),
        |tot AS (SELECT
        |    count(CASE WHEN lang = 'en' THEN 1 END)::BIGINT AS n,
        |    count(CASE WHEN lang = 'de' THEN 1 END)::BIGINT AS m
        |  FROM lens)
        |SELECT n, m, max(abs(fe * m - fd * n))::BIGINT AS d_scaled,
        |       (max(abs(fe * m - fd * n)) * 1000) // (n * m) AS d_permille
        |FROM cum, tot GROUP BY n, m""".stripMargin),
      "Exact two-sample Kolmogorov-Smirnov statistic between the 'en' " +
        "and 'de' length distributions: D = max |F_en - F_de| over the " +
        "pooled support, cross-multiplied to |F_e*m - F_d*n| so the " +
        "CDF compare is pure integer — no float CDF ever exists. One " +
        "value-keyed agg, then ScalablePrefix running counts over the " +
        "compacted support (range partition + offsets — no " +
        "unpartitioned window anywhere in the plan). The distribution-equality test behind every " +
        "domain-shift gate that TV-histogram screening (histogram_" +
        "drift_l1) approximates with buckets."),

    // ------------------------------------------------ conformal gate
    QueryDef(
      "conformal_threshold",
      (s, d) => {
        // nonconformity = the quality score's TTR term, negated so
        // HIGHER = worse; calibration split = md5 bucket < 50
        val scored = Tables.documents(s, d)
          .select(col("doc_id"),
            expr("1000 - ((size(array_distinct(split(text, ' '))) * 1000)" +
              " div size(split(text, ' ')))").as("nonconf"),
            (pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8),
              16, 10).cast("long"), lit(100L)) < 50).as("is_cal"))
        // calibration order statistic via ScalableIndex — the rank input
        // is half the corpus, so no unpartitioned row_number window
        val cal = graft.operators.ScalableIndex.withDenseIndex(
          scored.filter(col("is_cal")),
          Seq(col("nonconf"), col("doc_id")), 8, "idx")
          .withColumn("rk", col("idx") + 1L)
        val nCal = cal.agg(count(lit(1)).as("ncal"))
        // split-conformal 90% threshold: the ceil(0.9*(n+1))-th order
        // statistic of calibration nonconformity (integer arithmetic)
        val thr = cal.crossJoin(broadcast(nCal))
          .filter(col("rk") === expr("((ncal + 1) * 9 + 9) div 10"))
          .select(col("nonconf").as("q90"), col("ncal"))
        scored.filter(!col("is_cal"))
          .crossJoin(broadcast(thr))
          .agg(
            max(col("q90")).as("threshold"),
            max(col("ncal")).as("n_cal"),
            count(lit(1)).as("n_test"),
            count(when(col("nonconf") <= col("q90"), 1)).as("n_covered"))
          .select(col("threshold"), col("n_cal"), col("n_test"),
            col("n_covered"),
            expr("(n_covered * 1000) div n_test").as("coverage_permille"))
      },
      Some("""WITH scored AS (
        |  SELECT doc_id,
        |    1000 - ((len(list_distinct(string_split(text, ' '))) * 1000)
        |            // len(string_split(text, ' '))) AS nonconf,
        |    (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100)
        |      < 50 AS is_cal
        |  FROM documents),
        |cal AS (SELECT nonconf, row_number() OVER (
        |          ORDER BY nonconf, doc_id) AS rk
        |        FROM scored WHERE is_cal),
        |nc AS (SELECT count(*)::BIGINT AS ncal FROM cal),
        |thr AS (SELECT nonconf AS q90, ncal FROM cal, nc
        |        WHERE rk = ((ncal + 1) * 9 + 9) // 10)
        |SELECT q90 AS threshold, ncal AS n_cal,
        |  count(*)::BIGINT AS n_test,
        |  count(CASE WHEN nonconf <= q90 THEN 1 END)::BIGINT AS n_covered,
        |  (count(CASE WHEN nonconf <= q90 THEN 1 END) * 1000) // count(*)
        |    AS coverage_permille
        |FROM scored, thr WHERE NOT is_cal
        |GROUP BY q90, ncal""".stripMargin),
      "Split-conformal threshold (Vovk et al.; Angelopoulos & Bates " +
        "2023 tutorial form): the ceil(0.9*(n+1))-th order statistic of " +
        "calibration-split nonconformity (low type-token ratio) gives " +
        "a finite-sample-valid 90% gate, and the held-out split " +
        "measures realized coverage — the calibrated way to turn ANY " +
        "quality score into a keep/drop gate with a guarantee. All " +
        "order statistics exact (rank on integers, md5 split); " +
        "coverage is an integer ratio. One sort-window on the " +
        "calibration half; threshold broadcast to the test scan."),
  )
}
