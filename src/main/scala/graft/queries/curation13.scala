package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Round-4 continuation batch 7: model-fit diagnostics and normalized
  * association — the residual-based outlier screen over the grouped
  * OLS fit, and cosine-normalized co-occurrence (the item-item
  * similarity step implicit-feedback recommenders bootstrap from).
  */
object Curation13Queries {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------ OLS residuals
    QueryDef(
      "ols_residual_outliers",
      (s, d) => {
        val base = Tables.documents(s, d).select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("x"),
          length(col("text")).cast("long").as("y"))
        val m = base.groupBy(col("lang")).agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("y") * col("y")).as("syy"))
        val slope = (col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
        val joined = base.join(broadcast(m), Seq("lang"))
          .withColumn("b", slope)
          .withColumn("a",
            (col("sy").cast("double") - col("b") * col("sx").cast("double"))
              / col("n").cast("double"))
          .withColumn("r",
            col("y").cast("double") - col("a") -
              col("b") * col("x").cast("double"))
          // SSE of the fitted line collapses to syy - a*sy - b*sxy
          .withColumn("sdr",
            sqrt((col("syy").cast("double") -
              col("a") * col("sy").cast("double") -
              col("b") * col("sxy").cast("double")) /
              col("n").cast("double")))
        joined.filter(abs(col("r")) > lit(2.0) * col("sdr"))
          .select(col("lang"), col("doc_id"),
            floor(col("r") * 1000).cast("bigint").as("resid_e3"))
      },
      Some("""WITH base AS (
        |  SELECT doc_id, lang,
        |         len(string_split(text, ' '))::BIGINT AS x,
        |         length(text)::BIGINT AS y
        |  FROM documents),
        |m AS (SELECT lang, count(*)::BIGINT AS n,
        |        sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
        |        sum(x*x)::BIGINT AS sxx, sum(x*y)::BIGINT AS sxy,
        |        sum(y*y)::BIGINT AS syy
        |      FROM base GROUP BY lang),
        |fit AS (SELECT base.doc_id, base.lang, base.x, base.y,
        |    m.n, m.sx, m.sy, m.sxx, m.sxy, m.syy,
        |    (m.n*m.sxy - m.sx*m.sy)::BIGINT::DOUBLE
        |      / (m.n*m.sxx - m.sx*m.sx)::BIGINT::DOUBLE AS b
        |  FROM base JOIN m USING (lang)),
        |resid AS (SELECT doc_id, lang, y, x, n, sy, sxy, syy, b,
        |    (sy::DOUBLE - b * sx::DOUBLE) / n::DOUBLE AS a
        |  FROM fit),
        |scored AS (SELECT doc_id, lang,
        |    y::DOUBLE - a - b * x::DOUBLE AS r,
        |    sqrt((syy::DOUBLE - a * sy::DOUBLE - b * sxy::DOUBLE)
        |         / n::DOUBLE) AS sdr
        |  FROM resid)
        |SELECT lang, doc_id, floor(r * 1000)::BIGINT AS resid_e3
        |FROM scored WHERE abs(r) > 2.0 * sdr""".stripMargin),
      "Residual-based outlier screen over the per-language OLS fit of " +
        "char length on token count (same moments as grouped_ols_trend): " +
        "docs whose residual exceeds 2 population-sd of the fit are " +
        "flagged — the model-fit cousin of the MAD rule, catching docs " +
        "whose length is anomalous GIVEN their token count (unusually " +
        "long words, markup debris) that marginal filters miss. Integer " +
        "moments + a mirrored IEEE tail; the 5-row moment table " +
        "broadcasts back onto the scan, one shuffle total."),

    // ------------------------------------------------ cosine co-occurrence
    QueryDef(
      "item_cooccurrence_cosine",
      (s, d) => {
        val ut = Tables.events(s, d)
          .select(col("user_id"), col("event_type")).distinct()
        val sizes = ut.groupBy(col("event_type"))
          .agg(count(lit(1)).as("nu"))
        val a = ut.select(col("user_id"), col("event_type").as("type_a"))
        val b = ut.select(col("user_id"), col("event_type").as("type_b"))
        a.join(b, Seq("user_id"))
          .filter(col("type_a") < col("type_b"))
          .groupBy(col("type_a"), col("type_b"))
          .agg(count(lit(1)).as("n_both"))
          .join(broadcast(sizes.select(col("event_type").as("type_a"),
            col("nu").as("na"))), Seq("type_a"))
          .join(broadcast(sizes.select(col("event_type").as("type_b"),
            col("nu").as("nb"))), Seq("type_b"))
          .select(col("type_a"), col("type_b"), col("n_both"),
            floor(col("n_both").cast("double") * 1000 /
              sqrt((col("na") * col("nb")).cast("double")))
              .cast("bigint").as("cosine_permille"))
      },
      Some("""WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |sizes AS (SELECT event_type, count(*)::BIGINT AS nu
        |          FROM ut GROUP BY event_type),
        |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |            count(*)::BIGINT AS n_both
        |          FROM ut a JOIN ut b
        |            ON a.user_id = b.user_id
        |           AND a.event_type < b.event_type
        |          GROUP BY 1, 2)
        |SELECT type_a, type_b, n_both,
        |  floor(n_both::DOUBLE * 1000
        |        / sqrt((sa.nu * sb.nu)::BIGINT::DOUBLE))::BIGINT
        |    AS cosine_permille
        |FROM pairs JOIN sizes sa ON pairs.type_a = sa.event_type
        |           JOIN sizes sb ON pairs.type_b = sb.event_type""".stripMargin),
      "Cosine-normalized co-occurrence over binary user-item incidence " +
        "(Ochiai coefficient): n_both / sqrt(n_a * n_b) — the item-item " +
        "similarity an implicit-feedback recommender bootstraps from " +
        "the cooccurrence_pairs substrate. Integer counts, one " +
        "correctly-rounded sqrt, floor at permille: engine-exact. Item " +
        "marginals broadcast; the pair state stays C(|V|,2)-bounded " +
        "regardless of event volume."),
  )
}
