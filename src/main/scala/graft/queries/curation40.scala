package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 34: estimator and clustering evaluation — leave-one-source-out
  * data valuation, design-based Horvitz-Thompson stratified estimation,
  * and silhouette quality of the label clustering in embedding space.
  * (The fourth member of the batch, dedup_recall_eval, lives in
  * [[DedupQueries]] to share the MinHash-LSH substrate.)
  */
object Curation40Queries {

  /** Exact integer squared distance on the e3 fixed-point grid:
    * floor(x*1000) per element, then one zip_with/aggregate fold —
    * order-independent, bit-identical in both engines (same pattern as
    * VectorOps; 64 dims of |x|<~1 keep every term far inside int64). */
  private def qd(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val dx = floor(x.cast("double") * 1000).cast("long") -
          floor(y.cast("double") * 1000).cast("long")
        dx * dx
      }),
      lit(0L), (acc, el) => acc + el)

  private def qdSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(list_zip($a, $b), " +
      s"p -> (floor(p[1]::DOUBLE * 1000)::BIGINT - " +
      s"floor(p[2]::DOUBLE * 1000)::BIGINT) * " +
      s"(floor(p[1]::DOUBLE * 1000)::BIGINT - " +
      s"floor(p[2]::DOUBLE * 1000)::BIGINT))), (acc, x) -> acc + x)"

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------- leave-one-source-out valuation
    QueryDef(
      "source_ablation_impact",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("source"),
            size(split(col("text"), " ")).cast("long").as("w"))
        val tot = docs.agg(count(lit(1)).as("n_all"),
          sum(col("w")).as("w_all"))
        docs.groupBy(col("source"))
          .agg(count(lit(1)).as("n_src"), sum(col("w")).as("w_src"))
          .crossJoin(broadcast(tot))
          .select(col("source"), col("n_src"),
            expr("(1000 * w_all) div n_all").as("mean_all_e3"),
            expr("(1000 * (w_all - w_src)) div (n_all - n_src)")
              .as("loo_mean_e3"))
          .withColumn("impact_e3", col("loo_mean_e3") - col("mean_all_e3"))
      },
      Some("""WITH d AS (SELECT source,
        |    len(string_split(text, ' '))::BIGINT AS w FROM documents),
        |tot AS (SELECT count(*)::BIGINT AS n_all, sum(w)::BIGINT AS w_all
        |        FROM d),
        |per AS (SELECT source, count(*)::BIGINT AS n_src,
        |        sum(w)::BIGINT AS w_src FROM d GROUP BY source)
        |SELECT source, n_src,
        |  ((1000 * w_all) // n_all)::BIGINT AS mean_all_e3,
        |  ((1000 * (w_all - w_src)) // (n_all - n_src))::BIGINT
        |    AS loo_mean_e3,
        |  (((1000 * (w_all - w_src)) // (n_all - n_src)) -
        |   ((1000 * w_all) // n_all))::BIGINT AS impact_e3
        |FROM per, tot""".stripMargin),
      "Leave-one-source-out data valuation on the cheapest useful " +
        "metric (mean tokens/doc, e3 fixed point): per source, what the " +
        "corpus mean becomes WITHOUT that source — impact > 0 means " +
        "removing the source raises the average, i.e. the source drags " +
        "it down.  The LOO mean needs no second scan: (total - src) / " +
        "(n - n_src) from one grouped agg plus the broadcast 1-row " +
        "total — the O(sources) ablation table that a Shapley " +
        "approximation would start from, at one-pass cost.  Requires " +
        ">= 2 sources (the fixture has 20); all-integer arithmetic."),

    // ------------------------- Horvitz-Thompson stratified estimator
    QueryDef(
      "horvitz_thompson_stratified",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).cast("long").as("w"))
          .withColumn("m",
            when(col("lang") === "en", lit(4L)).otherwise(lit(2L)))
          .withColumn("sampled",
            pmod(conv(substring(md5(concat(lit("ht"),
              col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"),
              col("m")) === 0)
        docs.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_stratum"),
            count(when(col("sampled"), lit(1))).as("n_sampled"),
            sum(col("w")).as("true_total"),
            coalesce(sum(when(col("sampled"), col("w") * col("m"))),
              lit(0L)).as("ht_estimate"))
          .withColumn("err_permille",
            expr("(1000 * abs(ht_estimate - true_total)) div true_total"))
      },
      Some("""WITH d AS (SELECT doc_id, lang,
        |    len(string_split(text, ' '))::BIGINT AS w,
        |    (CASE WHEN lang = 'en' THEN 4 ELSE 2 END)::BIGINT AS m
        |  FROM documents),
        |sm AS (SELECT *,
        |    ((('0x' || substr(md5('ht' || doc_id::VARCHAR), 1, 8))
        |      ::BIGINT) % m = 0) AS sampled
        |  FROM d)
        |SELECT lang, count(*)::BIGINT AS n_stratum,
        |  count(CASE WHEN sampled THEN 1 END)::BIGINT AS n_sampled,
        |  sum(w)::BIGINT AS true_total,
        |  coalesce(sum(CASE WHEN sampled THEN w * m END), 0)::BIGINT
        |    AS ht_estimate,
        |  ((1000 * abs(coalesce(sum(CASE WHEN sampled THEN w * m END), 0)
        |    - sum(w))) // sum(w))::BIGINT AS err_permille
        |FROM sm GROUP BY lang""".stripMargin),
      "Horvitz-Thompson estimation under a stratified design with " +
        "UNEQUAL inclusion probabilities: English is sampled at 1/4, " +
        "every other language at 1/2 (deterministic md5 Bernoulli, the " +
        "engine's reproducible coin), and each sampled document is " +
        "inverse-probability weighted (w * m) — the unbiased total " +
        "estimator for any known design, per stratum.  Complements " +
        "priority_sample_estimator (order sampling, global) with the " +
        "DESIGN-based half of survey estimation: this is how a 100 TB " +
        "corpus quotes per-language token totals from a cheap skewed " +
        "pilot without rescanning.  One grouped agg; exact integers."),

    // --------------------------- silhouette of the label clustering
    QueryDef(
      "silhouette_by_label",
      (s, d) => {
        val sl = Tables.embeddings(s, d).filter(col("vec_id") < 200)
          .select(col("vec_id"), col("label").cast("bigint").as("label"),
            col("embedding"))
        val pairs = sl.as("x").join(broadcast(sl.as("y")),
            col("x.vec_id") =!= col("y.vec_id"))
          .select(col("x.vec_id").as("i"), col("x.label").as("li"),
            col("y.label").as("lj"),
            qd(col("x.embedding"), col("y.embedding")).as("d2"))
        val perCluster = pairs.groupBy(col("i"), col("li"), col("lj"))
          .agg(expr("sum(d2) div count(1)").as("mean_d2"))
        // a2 (own-cluster mean: the UNIQUE lj = li row) and b2 (min
        // other-cluster mean) fold into ONE conditional aggregate per
        // point — the r14 form filtered perCluster into two frames and
        // inner-joined them back on i (an extra exchange + join for
        // rows that already live together).  The isNotNull filter
        // reproduces the inner join's drop of singleton-cluster points
        // (no a2) and single-cluster corpora (no b2) exactly.
        val ab = perCluster.groupBy(col("i"))
          .agg(max(col("li")).as("label"),
            max(when(col("li") === col("lj"), col("mean_d2"))).as("a2"),
            min(when(col("li") =!= col("lj"), col("mean_d2"))).as("b2"))
          .filter(col("a2").isNotNull && col("b2").isNotNull)
        // s = (b-a)/max(a,b) in e3; numerator shifted by +max so the
        // integer division operand is non-negative (Spark div truncates
        // toward zero, DuckDB // floors — they agree only on >= 0).
        val sv = ab
          .select(col("i"), col("label"),
            expr("(1000 * (b2 - a2 + greatest(a2, b2, 1)))" +
              " div greatest(a2, b2, 1) - 1000").as("s_e3"))
        sv.groupBy(col("label"))
          .agg(count(lit(1)).as("n_points"),
            sum(col("s_e3") + 1000).as("ssum"),
            count(when(col("s_e3") < 0, lit(1))).as("n_negative"))
          .select(col("label"), col("n_points"),
            expr("ssum div n_points - 1000").as("mean_silhouette_e3"),
            col("n_negative"))
      },
      Some(s"""WITH sl AS (SELECT vec_id, label::BIGINT AS label, embedding
        |  FROM embeddings WHERE vec_id < 200),
        |pairs AS (SELECT x.vec_id AS i, x.label AS li, y.label AS lj,
        |    ${qdSql("x.embedding", "y.embedding")} AS d2
        |  FROM sl x JOIN sl y ON x.vec_id != y.vec_id),
        |pc AS (SELECT i, li, lj, (sum(d2) // count(*))::BIGINT AS mean_d2
        |  FROM pairs GROUP BY 1, 2, 3),
        |aa AS (SELECT i, li, mean_d2 AS a2 FROM pc WHERE li = lj),
        |bb AS (SELECT i, min(mean_d2)::BIGINT AS b2 FROM pc
        |       WHERE li != lj GROUP BY i),
        |sv AS (SELECT aa.i, aa.li AS label,
        |    ((1000 * (b2 - a2 + greatest(a2, b2, 1)))
        |     // greatest(a2, b2, 1) - 1000)::BIGINT AS s_e3
        |  FROM aa JOIN bb ON aa.i = bb.i)
        |SELECT label, count(*)::BIGINT AS n_points,
        |  ((sum(s_e3 + 1000) // count(*)) - 1000)::BIGINT
        |    AS mean_silhouette_e3,
        |  count(CASE WHEN s_e3 < 0 THEN 1 END)::BIGINT AS n_negative
        |FROM sv GROUP BY label""".stripMargin),
      "Silhouette quality of the GIVEN label clustering in embedding " +
        "space (bounded 200-vector slice, like knn_graph): per point, " +
        "a = mean intra-cluster squared distance, b = min over other " +
        "clusters of the mean distance, s = (b-a)/max(a,b) — averaged " +
        "per label with a negative-point count (points sitting closer " +
        "to a foreign cluster).  The judge kmeans_assignment_stability " +
        "cannot be: stability says the clustering is REPRODUCIBLE, " +
        "silhouette says it is GOOD.  All distances are e3 fixed-point " +
        "integers and every division operand is shifted non-negative, " +
        "so the readout is exact in both engines.  Scale path: replace " +
        "the bounded pair join with per-cluster centroid + variance " +
        "summaries (simplified silhouette) — same output schema."),
  )
}
