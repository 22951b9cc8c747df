package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.{QueryDef, Tables}

/** Batch 61: categorical hypothesis tests and resampling variance — the
  * statistical layer a curation pipeline uses to DECIDE, not just
  * measure.  The engine already carries rank/distribution tests
  * (Mann-Whitney, KS, Spearman/Kendall); this batch adds the
  * categorical-association side: Pearson chi-square independence with
  * pinned critical values (is document length independent of language,
  * or does a per-lang length policy leak into the corpus?), Cramér's V
  * effect size (a corpus-scale chi-square is ALWAYS "significant" — V
  * says whether the association is big enough to act on), one-way
  * ANOVA (does mean length differ across languages at all?), and
  * jackknife leave-one-source-out influence (which single source drags
  * the corpus mean, and how stable is the estimate under source
  * removal — the source-level analog of per-record influence
  * functions).
  *
  * Scale shape: every query is ONE map-side-combinable aggregate over
  * the scan — groupBy on enum keys (lang x 3-way length bucket <= 15
  * cells; source <= 20 rows) with count/sum/sum-of-squares partials —
  * followed by arithmetic on broadcast-sized frames.  The contingency
  * is completed to the full margin cross product (zero cells restored
  * via cross-join + left join) because Pearson's statistic sums over
  * EVERY cell, observed or not.  Nothing here shuffles more than the
  * enum-cardinality partial-agg rows, so the plans are scan-bound at
  * any corpus size.  The small cell/moment frames are persisted
  * (tens of rows) because several margin consumers derive from each;
  * without persist each consumer's lineage re-runs the corpus scan
  * (QueryDef cache contract, core.scala).
  *
  * Determinism: all statistics are integer fixed-point (the [[graft.Det]]
  * doctrine) — observed counts, margins and sums of squares are exact
  * BIGINTs, expected counts and statistics are floor divisions at e3/e6
  * scale, and the chi-square critical values are a pinned lookup
  * (alpha=0.05, dof 1..12), so no float path exists in either engine.
  * The e6-scaled products stay far inside int64 at bench scales; at a
  * corpus where count*1e6 approaches 2^63 the same expressions move to
  * DECIMAL(38,0) unchanged (Spark and DuckDB both widen exactly).
  *
  * Reference: the RAG-eval harness compares per-model/per-epoch answer
  * accuracy tables (rag_evaluation/test_all_models.py:30-41 collects
  * per-model score rows; RAG-eval-test_model.py:200-214 aggregates
  * them) but never asks whether the differences it tabulates are
  * significant or material — exactly the gap a chi-square + effect-size
  * + ANOVA layer closes at corpus scale.
  */
object Curation61Queries {

  /** 3-way document-length bucket on fixed breakpoints (the corpus
    * n_chars support is ~[44, 577], mean ~298 — fixed cuts keep the
    * bucket a pure scan-side expression, no quantile pass). */
  private def lenBucket: Column =
    when(col("n_chars") < 250, lit("short"))
      .when(col("n_chars") < 350, lit("mid"))
      .otherwise(lit("long"))

  private val lenBucketSql =
    "CASE WHEN n_chars < 250 THEN 'short' " +
      "WHEN n_chars < 350 THEN 'mid' ELSE 'long' END"

  /** Full lang x bucket grid with margins and expected counts: the
    * observed cells (one enum-keyed scan aggregate, persisted — three
    * margin consumers derive from it) completed to the margin cross
    * product so zero cells carry their expected-count contribution.
    * Columns: (lang, len_bucket, o, r, c, n, nr, nc, e_e3,
    * cell_chi2_e3). */
  private def chiCells(s: SparkSession, d: String): DataFrame = {
    val obs = Tables.documents(s, d)
      .groupBy(col("lang"), lenBucket.as("len_bucket"))
      .agg(count(lit(1)).as("o"))
      .persist()
    val rowT = obs.groupBy(col("lang")).agg(sum(col("o")).as("r"))
    val colT = obs.groupBy(col("len_bucket")).agg(sum(col("o")).as("c"))
    val tot = obs.agg(sum(col("o")).as("n"),
      countDistinct(col("lang")).as("nr"),
      countDistinct(col("len_bucket")).as("nc"))
    rowT.crossJoin(colT)
      .join(obs, Seq("lang", "len_bucket"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("e_e3", expr("(r * c * 1000) div n"))
      // greatest(e_e3, 1): a margin product small enough to floor E to
      // zero at e3 must not turn its cell contribution into a NULL that
      // sum() silently drops (understating chi-square); clamping the
      // denominator to 1 keeps the cell finite and large, which is the
      // conservative direction for an independence REJECTION test
      .withColumn("cell_chi2_e3",
        expr("((o * 1000 - e_e3) * (o * 1000 - e_e3)) " +
          "div (greatest(e_e3, 1) * 1000)"))
  }

  private val chiCellsSql =
    s"""obs AS (SELECT lang, $lenBucketSql AS len_bucket,
       |          count(*)::BIGINT AS o
       |        FROM documents GROUP BY 1, 2),
       |rt AS (SELECT lang, sum(o)::BIGINT AS r FROM obs GROUP BY 1),
       |ct AS (SELECT len_bucket, sum(o)::BIGINT AS c FROM obs GROUP BY 1),
       |tot AS (SELECT sum(o)::BIGINT AS n,
       |               count(DISTINCT lang)::BIGINT AS nr,
       |               count(DISTINCT len_bucket)::BIGINT AS nc
       |        FROM obs),
       |cells AS (SELECT rt.lang, ct.len_bucket,
       |    coalesce(o, 0)::BIGINT AS o, r, c, n, nr, nc,
       |    (r * c * 1000) // n AS e_e3,
       |    ((coalesce(o, 0) * 1000 - (r * c * 1000) // n)
       |     * (coalesce(o, 0) * 1000 - (r * c * 1000) // n))
       |      // (greatest((r * c * 1000) // n, 1) * 1000) AS cell_chi2_e3
       |  FROM rt CROSS JOIN ct
       |  LEFT JOIN obs ON obs.lang = rt.lang
       |              AND obs.len_bucket = ct.len_bucket, tot)""".stripMargin

  /** Pinned upper-tail chi-square critical values at alpha=0.05 for the
    * dofs reachable from small contingency tables (e3 fixed point),
    * parameterized on the dof expression. */
  private def chiCritCase(dof: String): String =
    s"CASE $dof WHEN 1 THEN 3841 WHEN 2 THEN 5991 WHEN 3 THEN 7815 " +
      "WHEN 4 THEN 9488 WHEN 5 THEN 11070 WHEN 6 THEN 12592 " +
      "WHEN 7 THEN 14067 WHEN 8 THEN 15507 WHEN 9 THEN 16919 " +
      "WHEN 10 THEN 18307 WHEN 11 THEN 19675 ELSE 21026 END"

  /** Per-group n / sum / sum-of-squares moment frame over n_chars,
    * keyed by an enum column (one map-side-combinable pass). */
  private def moments(s: SparkSession, d: String, key: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col(key))
      .agg(
        count(lit(1)).as("ng"),
        sum(col("n_chars")).as("sg"),
        sum(col("n_chars") * col("n_chars")).as("qg"))

  private def momentsSql(key: String): String =
    s"""g AS (SELECT $key, count(*)::BIGINT AS ng,
       |         sum(n_chars)::BIGINT AS sg,
       |         sum(n_chars * n_chars)::BIGINT AS qg
       |       FROM documents GROUP BY 1)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------- chi-square contingency cells
    QueryDef(
      "chi_square_cells",
      (s, d) => chiCells(s, d)
        .select(col("lang"), col("len_bucket"), col("o"), col("e_e3"),
          col("cell_chi2_e3"))
        .orderBy(col("lang"), col("len_bucket")),
      Some(s"""WITH $chiCellsSql
        |SELECT lang, len_bucket, o, e_e3, cell_chi2_e3
        |FROM cells ORDER BY lang, len_bucket""".stripMargin),
      "The lang x length-bucket contingency table with expected counts " +
        "under independence (E = row*col/N at e3) and per-cell Pearson " +
        "chi-square contributions — the residual readout that says " +
        "WHICH (lang, length) cell deviates, not just that some cell " +
        "does.  The observed cells are completed to the full margin " +
        "cross product so zero cells contribute E like Pearson " +
        "requires.  One enum-keyed count over the scan; margins derive " +
        "from the persisted <=15-row cell frame, so the corpus is read " +
        "once.  All arithmetic is integer floor division at e3 — " +
        "bit-identical across engines and partitionings."),

    // ------------------------------------- chi-square statistic + gate
    QueryDef(
      "chi_square_independence",
      (s, d) => chiCells(s, d)
        .agg(
          max(col("n")).as("n"),
          max(expr("(nr - 1) * (nc - 1)")).as("dof"),
          sum(col("cell_chi2_e3")).as("chi2_e3"))
        .withColumn("crit_e3", expr(chiCritCase("dof")).cast("long"))
        .withColumn("reject_independence", col("chi2_e3") > col("crit_e3")),
      Some(s"""WITH $chiCellsSql
        |SELECT max(n)::BIGINT AS n,
        |  max((nr - 1) * (nc - 1))::BIGINT AS dof,
        |  sum(cell_chi2_e3)::BIGINT AS chi2_e3,
        |  (${chiCritCase("max((nr - 1) * (nc - 1))")})::BIGINT AS crit_e3,
        |  sum(cell_chi2_e3) > (${chiCritCase("max((nr - 1) * (nc - 1))")})
        |    AS reject_independence
        |FROM cells""".stripMargin),
      "Pearson chi-square test of independence between language and " +
        "document-length bucket: sum of per-cell contributions over the " +
        "completed grid, degrees of freedom from the observed table " +
        "shape, and a pinned alpha=0.05 critical-value lookup " +
        "(dof 1..12) deciding the reject flag — no chi-square CDF " +
        "evaluation, so the gate is exact integer end to end.  The " +
        "whole test is one enum-keyed aggregate plus arithmetic on a " +
        "<=15-row frame: scan-bound at 100 TB, and the decision it " +
        "automates (does a per-language length policy leak into the " +
        "corpus?) is a real curation gate."),

    // ------------------------------------- Cramer's V effect size
    QueryDef(
      "cramers_v_assoc",
      (s, d) => {
        def assoc(b: Column, pairName: String): DataFrame = {
          val obs = Tables.documents(s, d)
            .groupBy(col("lang"), b.as("b")).agg(count(lit(1)).as("o"))
            .persist()
          val rowT = obs.groupBy(col("lang")).agg(sum(col("o")).as("r"))
          val colT = obs.groupBy(col("b")).agg(sum(col("o")).as("c"))
          val tot = obs.agg(sum(col("o")).as("n"),
            countDistinct(col("lang")).as("nr"),
            countDistinct(col("b")).as("nc"))
          rowT.crossJoin(colT)
            .join(obs, Seq("lang", "b"), "left")
            .withColumn("o", coalesce(col("o"), lit(0L)))
            .crossJoin(broadcast(tot))
            .withColumn("e_e3", expr("(r * c * 1000) div n"))
            .withColumn("cell_e3",
              // same zero-expected-cell clamp as chiCells
              expr("((o * 1000 - e_e3) * (o * 1000 - e_e3)) " +
                "div (greatest(e_e3, 1) * 1000)"))
            .agg(
              max(col("n")).as("n"),
              max(expr("least(nr - 1, nc - 1)")).as("min_dim"),
              sum(col("cell_e3")).as("chi2_e3"))
            .select(lit(pairName).as("pair"), col("n"), col("chi2_e3"),
              expr("(chi2_e3 * 1000) div (n * min_dim)").as("v2_e6"))
        }
        assoc(lenBucket, "lang_x_len_bucket")
          .unionByName(assoc(col("source"), "lang_x_source"))
          .orderBy(col("pair"))
      },
      Some(s"""WITH pairs AS (
        |  SELECT lang, $lenBucketSql AS b, 'lang_x_len_bucket' AS pair
        |  FROM documents
        |  UNION ALL
        |  SELECT lang, source AS b, 'lang_x_source' AS pair FROM documents),
        |obs AS (SELECT pair, lang, b, count(*)::BIGINT AS o
        |        FROM pairs GROUP BY 1, 2, 3),
        |rt AS (SELECT pair, lang, sum(o)::BIGINT AS r FROM obs GROUP BY 1, 2),
        |ct AS (SELECT pair, b, sum(o)::BIGINT AS c FROM obs GROUP BY 1, 2),
        |tot AS (SELECT pair, sum(o)::BIGINT AS n,
        |               count(DISTINCT lang)::BIGINT AS nr,
        |               count(DISTINCT b)::BIGINT AS nc
        |        FROM obs GROUP BY 1),
        |cells AS (SELECT rt.pair, coalesce(o, 0)::BIGINT AS o, r, c,
        |    n, nr, nc, (r * c * 1000) // n AS e_e3
        |  FROM rt JOIN ct ON rt.pair = ct.pair
        |  LEFT JOIN obs ON obs.pair = rt.pair AND obs.lang = rt.lang
        |              AND obs.b = ct.b
        |  JOIN tot ON tot.pair = rt.pair),
        |stat AS (SELECT pair, max(n)::BIGINT AS n,
        |    max(least(nr - 1, nc - 1)) AS min_dim,
        |    sum(((o * 1000 - e_e3) * (o * 1000 - e_e3))
        |        // (greatest(e_e3, 1) * 1000))::BIGINT AS chi2_e3
        |  FROM cells GROUP BY pair)
        |SELECT pair, n, chi2_e3,
        |       (chi2_e3 * 1000) // (n * min_dim) AS v2_e6
        |FROM stat ORDER BY pair""".stripMargin),
      "Cramer's V-squared effect size (chi2 / (N * min(r-1, c-1)) at " +
        "e6) for two categorical pairs — lang x length-bucket and " +
        "lang x source.  The companion to chi_square_independence: at " +
        "corpus N every chi-square rejects, so the actionable number " +
        "is V (0 = independent, 1e6 = fully determined), which is " +
        "N-invariant.  Both pairs are enum x enum: the whole query is " +
        "two scan aggregates over <=100-cell completed grids."),

    // ------------------------------------- one-way ANOVA F
    QueryDef(
      "anova_f_oneway",
      (s, d) => {
        val g = moments(s, d, "lang").persist()
        val tot = g.agg(
          count(lit(1)).as("k"),
          sum(col("ng")).as("n"),
          sum(col("sg")).as("s"),
          sum(col("qg")).as("q"))
        g.crossJoin(broadcast(tot))
          .agg(
            max(col("k")).as("k"),
            max(col("n")).as("n"),
            (sum(expr("(sg * sg) div ng")) - max(expr("(s * s) div n")))
              .as("ssb"),
            (max(col("q")) - sum(expr("(sg * sg) div ng"))).as("ssw"))
          .select(col("k"), col("n"), col("ssb"), col("ssw"),
            expr("(ssb * (n - k) * 1000) div (ssw * (k - 1))").as("f_e3"))
      },
      Some(s"""WITH ${momentsSql("lang")},
        |tot AS (SELECT count(*)::BIGINT AS k, sum(ng)::BIGINT AS n,
        |               sum(sg)::BIGINT AS s, sum(qg)::BIGINT AS q
        |        FROM g),
        |parts AS (SELECT max(k) AS k, max(n) AS n,
        |    (sum((sg * sg) // ng) - max((s * s) // n))::BIGINT AS ssb,
        |    (max(q) - sum((sg * sg) // ng))::BIGINT AS ssw
        |  FROM g, tot)
        |SELECT k, n, ssb, ssw,
        |       (ssb * (n - k) * 1000) // (ssw * (k - 1)) AS f_e3
        |FROM parts""".stripMargin),
      "One-way ANOVA of document length across languages: " +
        "between-group and within-group sums of squares from per-group " +
        "(n, sum, sum-of-squares) moments — one enum-keyed aggregate " +
        "pass, no per-row mean subtraction — and the F statistic at e3. " +
        "The floor divisions in SSB and SSW use the SAME s^2/n terms, " +
        "so SSB + SSW == SST exactly (the floors cancel; pinned by " +
        "spec).  The omnibus 'does mean length differ by language at " +
        "all' answer that pairwise Mann-Whitney tests can't give " +
        "without multiple-comparison inflation."),

    // ------------------------------------- jackknife LOSO influence
    QueryDef(
      "jackknife_source_influence",
      (s, d) => {
        val g = moments(s, d, "source")
        val tot = g.agg(sum(col("ng")).as("n"), sum(col("sg")).as("s"))
        g.crossJoin(broadcast(tot))
          .select(col("source"), col("ng").as("n_docs"),
            expr("((s - sg) * 1000000) div (n - ng)").as("theta_loso_e6"),
            expr("(s * 1000000) div n - ((s - sg) * 1000000) div (n - ng)")
              .as("influence_e6"))
          .orderBy(col("source"))
      },
      Some(s"""WITH ${momentsSql("source")},
        |tot AS (SELECT sum(ng)::BIGINT AS n, sum(sg)::BIGINT AS s FROM g)
        |SELECT source, ng AS n_docs,
        |  ((s - sg) * 1000000) // (n - ng) AS theta_loso_e6,
        |  (s * 1000000) // n - ((s - sg) * 1000000) // (n - ng)
        |    AS influence_e6
        |FROM g, tot ORDER BY source""".stripMargin),
      "Leave-one-source-out corpus mean length per source (e6) and its " +
        "influence (full-corpus mean minus LOSO mean): the source-level " +
        "influence-function readout that says which single source " +
        "drags the corpus statistic and by how much — the decision " +
        "input for dropping or reweighting a source.  One 20-row " +
        "moment aggregate; the LOSO estimates are pure arithmetic on " +
        "that broadcast frame (no second corpus pass per source — the " +
        "naive jackknife's k corpus scans collapse into one)."),

    // ------------------------------------- jackknife variance
    QueryDef(
      "jackknife_variance",
      (s, d) => {
        val g = moments(s, d, "source")
        val tot = g.agg(
          count(lit(1)).as("k"), sum(col("ng")).as("n"), sum(col("sg")).as("s"))
        // the LOSO estimate frame is k<=20 rows but feeds two consumers
        // (its mean, then the deviation sum) — persist per the cache
        // contract so the moment scan runs once
        val loso = g.crossJoin(broadcast(tot))
          .select(col("k"), col("n"),
            expr("((s - sg) * 1000000) div (n - ng)").as("th_e6"))
          .persist()
        val bar = loso.agg(expr("sum(th_e6) div max(k)").as("bar_e6"))
        loso.crossJoin(broadcast(bar))
          .agg(
            max(col("k")).as("k"),
            max(col("n")).as("n"),
            max(col("bar_e6")).as("theta_bar_e6"),
            expr("((max(k) - 1) * sum((th_e6 - bar_e6) * (th_e6 - bar_e6)))" +
              " div (max(k) * 1000000)").as("var_jk_e6"))
      },
      Some(s"""WITH ${momentsSql("source")},
        |tot AS (SELECT count(*)::BIGINT AS k, sum(ng)::BIGINT AS n,
        |               sum(sg)::BIGINT AS s FROM g),
        |loso AS (SELECT k, n, ((s - sg) * 1000000) // (n - ng) AS th_e6
        |         FROM g, tot),
        |bar AS (SELECT sum(th_e6) // max(k) AS bar_e6 FROM loso)
        |SELECT max(loso.k)::BIGINT AS k, max(loso.n)::BIGINT AS n,
        |  max(bar_e6)::BIGINT AS theta_bar_e6,
        |  (((max(loso.k) - 1) * sum((th_e6 - bar_e6) * (th_e6 - bar_e6)))
        |    // (max(loso.k) * 1000000))::BIGINT AS var_jk_e6
        |FROM loso, bar""".stripMargin),
      "Jackknife variance of the corpus mean length under source " +
        "deletion: (k-1)/k * sum of squared deviations of the LOSO " +
        "estimates from their mean, at e6 — the standard-error " +
        "companion to jackknife_source_influence that says whether the " +
        "corpus statistic is stable to losing any one source (a " +
        "licensing-risk / pipeline-robustness number, not just a " +
        "diagnostic).  Same single moment pass; the k LOSO estimates " +
        "never touch the corpus again."),
  )
}
