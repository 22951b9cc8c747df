package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 64: Welch's unequal-variance t-test over document length,
  * en vs de — the two-sample LOCATION test that completes the
  * hypothesis-test shelf: batch 61 covers categorical dependence
  * (chi-square, Cramer's V) and k-group means (ANOVA, which ASSUMES a
  * shared variance); the nonparametric two-sample tests already ship
  * as `mann_whitney_u` (rank-sum on the merged value histogram,
  * stats2.scala) and `ks_two_sample` (max ECDF gap via ScalablePrefix,
  * curation14.scala).  What was missing is the parametric two-sample
  * mean test that does NOT pool variances — the realistic case when
  * comparing a raw crawl against a curated corpus, whose spreads never
  * match.
  *
  * Scale shape: one enum-keyed (n, sum, sum-of-squares) moment pass —
  * map-side combinable, six numbers leave the scan — then exact
  * integer arithmetic mirrored floor-for-floor in DuckDB (exact
  * through ~1e5 rows per group at the e3 grid; rescale the fixed
  * point before q*n approaches 2^63 for larger groups).
  */
object Curation64Queries {

  private val LangA = "en"
  private val LangB = "de"

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "welch_t_lang_pair",
      (s, d) => {
        // one enum-keyed moment pass, pivoted to a single row — the
        // whole test is arithmetic on six numbers
        val g = Tables.documents(s, d)
          .filter(col("lang").isin(LangA, LangB))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sx"),
            sum(col("n_chars") * col("n_chars")).as("qx"))
          .agg(
            max(when(col("lang") === LangA, col("n"))).as("n1"),
            max(when(col("lang") === LangA, col("sx"))).as("s1"),
            max(when(col("lang") === LangA, col("qx"))).as("q1"),
            max(when(col("lang") === LangB, col("n"))).as("n2"),
            max(when(col("lang") === LangB, col("sx"))).as("s2"),
            max(when(col("lang") === LangB, col("qx"))).as("q2"))
        g.select(col("n1"), col("n2"),
            expr("(s1 * 1000) div n1").as("mean1_e3"),
            expr("(s2 * 1000) div n2").as("mean2_e3"),
            expr("((q1 * n1 - s1 * s1) * 1000) div (n1 * (n1 - 1))")
              .as("var1_e3"),
            expr("((q2 * n2 - s2 * s2) * 1000) div (n2 * (n2 - 1))")
              .as("var2_e3"))
          .select(col("n1"), col("n2"), col("mean1_e3"), col("mean2_e3"),
            col("var1_e3"), col("var2_e3"),
            expr("""((mean1_e3 - mean2_e3) * (mean1_e3 - mean2_e3))
              div (var1_e3 div n1 + var2_e3 div n2)""").as("t2_e3"),
            expr("""((var1_e3 div n1 + var2_e3 div n2)
                     * (var1_e3 div n1 + var2_e3 div n2))
              div ((var1_e3 div n1) * (var1_e3 div n1) div (n1 - 1)
                 + (var2_e3 div n2) * (var2_e3 div n2) div (n2 - 1))""")
              .as("dof_welch"))
      },
      Some(s"""WITH g AS (SELECT
        |    max(CASE WHEN lang = '$LangA' THEN n END) AS n1,
        |    max(CASE WHEN lang = '$LangA' THEN sx END) AS s1,
        |    max(CASE WHEN lang = '$LangA' THEN qx END) AS q1,
        |    max(CASE WHEN lang = '$LangB' THEN n END) AS n2,
        |    max(CASE WHEN lang = '$LangB' THEN sx END) AS s2,
        |    max(CASE WHEN lang = '$LangB' THEN qx END) AS q2
        |  FROM (SELECT lang, count(*)::BIGINT n, sum(n_chars)::BIGINT sx,
        |          sum(n_chars * n_chars)::BIGINT qx
        |        FROM documents WHERE lang IN ('$LangA', '$LangB')
        |        GROUP BY lang)),
        |m AS (SELECT n1, n2,
        |    (s1 * 1000) // n1 AS mean1_e3, (s2 * 1000) // n2 AS mean2_e3,
        |    ((q1 * n1 - s1 * s1) * 1000) // (n1 * (n1 - 1)) AS var1_e3,
        |    ((q2 * n2 - s2 * s2) * 1000) // (n2 * (n2 - 1)) AS var2_e3
        |  FROM g)
        |SELECT n1, n2, mean1_e3, mean2_e3, var1_e3, var2_e3,
        |  ((mean1_e3 - mean2_e3) * (mean1_e3 - mean2_e3))
        |    // (var1_e3 // n1 + var2_e3 // n2) AS t2_e3,
        |  ((var1_e3 // n1 + var2_e3 // n2)
        |   * (var1_e3 // n1 + var2_e3 // n2))
        |    // ((var1_e3 // n1) * (var1_e3 // n1) // (n1 - 1)
        |      + (var2_e3 // n2) * (var2_e3 // n2) // (n2 - 1))
        |    AS dof_welch
        |FROM m""".stripMargin),
      "Welch's unequal-variance t-test of mean document length, en vs " +
        "de: squared t statistic at e3 plus the Welch-Satterthwaite " +
        "degrees of freedom, all from one per-lang (n, sum, sum-of-" +
        "squares) moment pass — the two-sample location test that does " +
        "NOT assume the two sources share a variance (a crawl and a " +
        "curated corpus never do).  Six numbers leave the scan; " +
        "everything after is exact integer arithmetic mirrored " +
        "floor-for-floor in the oracle."),
  )
}
