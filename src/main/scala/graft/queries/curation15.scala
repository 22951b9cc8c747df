package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Round-4 continuation batch 9b: Theil-Sen robust slope — the
  * median-of-pairwise-slopes estimator, immune to the outliers the
  * OLS screen (ols_residual_outliers) flags.
  */
object Curation15Queries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "theil_sen_slope",
      (s, d) => {
        // deterministic first-60-per-lang sample and the median-pair
        // rank both execute through ScalableGroups (range exchange +
        // broadcast lang offsets) — no lang-partitioned window ever
        // sees corpus-size (or pair-set-size) rows on one task
        val sample = graft.operators.ScalableGroups.withGroupRank(
            Tables.documents(s, d)
              .select(col("lang"), col("doc_id"),
                size(split(col("text"), " ")).cast("long").as("x"),
                length(col("text")).cast("long").as("y")),
            Seq("lang"), Seq(col("doc_id")), 8, rankCol = "rn",
            sizeCol = "__gn")
          .filter(col("rn") <= 60)
          .drop("rn", "__gn")
        val pairs = sample.as("a").join(sample.as("b"),
          col("a.lang") === col("b.lang") &&
            col("a.doc_id") < col("b.doc_id") &&
            col("a.x") =!= col("b.x"))
          .select(col("a.lang").as("lang"),
            (col("b.y") - col("a.y")).as("dy"),
            (col("b.x") - col("a.x")).as("dx"),
            col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
        val ranked = graft.operators.ScalableGroups.withGroupRank(
          pairs, Seq("lang"),
          Seq((col("dy").cast("double") / col("dx").cast("double")).asc,
            col("dy"), col("dx"), col("ia"), col("ib")), 8,
          rankCol = "rk", sizeCol = "np")
        ranked.filter(col("rk") === expr("(np + 1) div 2"))
          .select(col("lang"), col("np").as("n_pairs"),
            expr("(dy * 1000000) div dx").as("slope_e6"))
      },
      Some("""WITH sample AS (
        |  SELECT lang, doc_id, x, y FROM (
        |    SELECT lang, doc_id,
        |           len(string_split(text, ' '))::BIGINT AS x,
        |           length(text)::BIGINT AS y,
        |           row_number() OVER (PARTITION BY lang ORDER BY doc_id)
        |             AS rn
        |    FROM documents) WHERE rn <= 60),
        |pairs AS (SELECT a.lang,
        |    (b.y - a.y)::BIGINT AS dy, (b.x - a.x)::BIGINT AS dx,
        |    a.doc_id AS ia, b.doc_id AS ib
        |  FROM sample a JOIN sample b
        |    ON a.lang = b.lang AND a.doc_id < b.doc_id AND a.x <> b.x),
        |ranked AS (SELECT lang, dy, dx,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY dy::DOUBLE / dx::DOUBLE ASC, dy, dx, ia, ib) AS rk,
        |    count(*) OVER (PARTITION BY lang) AS np
        |  FROM pairs)
        |SELECT lang, np::BIGINT AS n_pairs,
        |       (dy * 1000000) // dx AS slope_e6
        |FROM ranked WHERE rk = (np + 1) // 2""".stripMargin),
      "Theil-Sen robust slope per language: the LOWER MEDIAN of all " +
        "pairwise slopes over a deterministic 60-doc sample (29.3% " +
        "breakdown point vs OLS's zero). Slopes are ordered by one " +
        "IEEE division (identical trees both engines, total order " +
        "completed by integer tiebreaks) but the REPORTED slope is the " +
        "exact integer ratio of the median pair at e6 — no float " +
        "survives into the result. O(n^2) pairs is the bounded-sample " +
        "price; at 100 TB use per-group samples or the O(n log n) " +
        "Chan-Patrascu inversion-count refinement."),
  )
}
