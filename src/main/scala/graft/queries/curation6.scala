package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Dataset lifecycle operators: snapshot differencing between corpus
  * versions, and a chi-squared association test between categorical
  * columns — the monitoring layer over a continuously re-ingested
  * corpus (the reference re-runs its sweeps against regenerated data
  * dirs, train_adapters/create_all_models.py:31-37; versioned snapshot
  * diffs are how a pipeline answers "what changed since the last run").
  */
object Curation6Queries {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------ snapshot diff
    QueryDef(
      "snapshot_diff",
      (s, d) => {
        val v1 = Tables.documents(s, d)
          .select(col("doc_id"), md5(col("text")).as("h1"))
        // Simulated next snapshot: %7 deleted, %11 edited, %13 re-added
        // under a new id — derived deterministically from the same table.
        val v2base = Tables.documents(s, d)
          .filter(pmod(col("doc_id"), lit(7)) =!= 0)
          .select(col("doc_id"),
            when(pmod(col("doc_id"), lit(11)) === 0,
              concat(col("text"), lit(" v2"))).otherwise(col("text")).as("text"))
        val v2 = v2base.unionByName(
          Tables.documents(s, d).filter(pmod(col("doc_id"), lit(13)) === 0)
            .select((col("doc_id") + 3000000L).as("doc_id"), col("text")))
          .select(col("doc_id"), md5(col("text")).as("h2"))
        v1.join(v2, Seq("doc_id"), "full_outer")
          .withColumn("status",
            when(col("h2").isNull, "removed")
              .when(col("h1").isNull, "added")
              .when(col("h1") =!= col("h2"), "changed")
              .otherwise("unchanged"))
          .filter(col("status") =!= "unchanged")
          .select(col("doc_id"), col("status"))
      },
      Some("""WITH v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents),
        |v2 AS (SELECT doc_id,
        |    md5(CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END) AS h2
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 3000000, md5(text) FROM documents WHERE doc_id % 13 = 0),
        |joined AS (SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
        |    CASE WHEN v2.h2 IS NULL THEN 'removed'
        |         WHEN v1.h1 IS NULL THEN 'added'
        |         WHEN v1.h1 <> v2.h2 THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
        |SELECT doc_id, status FROM joined WHERE status <> 'unchanged'""".stripMargin),
      "Snapshot differencing by content hash: full-outer join of two " +
        "corpus versions on the stable key, rows classified " +
        "added/removed/changed, unchanged mass dropped before any " +
        "downstream work. One co-partitioned shuffle on the key; at " +
        "100 TB both sides bucket by doc_id so the diff is a zero-" +
        "exchange sort-merge — the incremental-ingest planner that " +
        "feeds dedup_incremental with only the changed set."),

    // --------------------------------------- chi-squared association
    QueryDef(
      "chi2_lang_source",
      (s, d) => {
        val obs = Tables.documents(s, d)
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("obs"))
        val rows = obs.groupBy(col("lang")).agg(sum(col("obs")).as("rtot"))
        val cols_ = obs.groupBy(col("source")).agg(sum(col("obs")).as("ctot"))
        val n = obs.agg(sum(col("obs")).as("n"),
          countDistinct(col("lang")).as("nl"),
          countDistinct(col("source")).as("ns"))
        // chi2 cell = (obs-E)^2/E with E=rtot*ctot/n, cross-multiplied:
        // d = n*obs - rtot*ctot; contrib_permille = (d*d*1000) div (n*rtot*ctot)
        obs.join(rows, "lang").join(cols_, "source").crossJoin(broadcast(n))
          .withColumn("d", col("n") * col("obs") - col("rtot") * col("ctot"))
          .withColumn("contrib_permille",
            expr("(d * d * 1000) div (n * rtot * ctot)"))
          .agg(max(col("n")).as("n"),
            max((col("nl") - 1) * (col("ns") - 1)).as("dof"),
            sum(col("contrib_permille")).as("chi2_permille"))
      },
      Some("""WITH obs AS (SELECT lang, source, count(*)::BIGINT AS obs
        |  FROM documents GROUP BY lang, source),
        |rows_ AS (SELECT lang, sum(obs)::BIGINT AS rtot FROM obs GROUP BY lang),
        |cols_ AS (SELECT source, sum(obs)::BIGINT AS ctot FROM obs GROUP BY source),
        |n AS (SELECT sum(obs)::BIGINT AS n,
        |    count(DISTINCT lang)::BIGINT AS nl,
        |    count(DISTINCT source)::BIGINT AS ns FROM obs),
        |cells AS (SELECT (n.n * obs.obs - r.rtot * c.ctot) AS d,
        |    n.n, r.rtot, c.ctot, n.nl, n.ns
        |  FROM obs JOIN rows_ r USING (lang) JOIN cols_ c USING (source), n)
        |SELECT max(n)::BIGINT AS n,
        |       max((nl - 1) * (ns - 1))::BIGINT AS dof,
        |       sum((d * d * 1000) // (n * rtot * ctot))::BIGINT AS chi2_permille
        |FROM cells""".stripMargin),
      "Chi-squared association between two categorical columns " +
        "(lang x source), cross-multiplied into pure integers: cell " +
        "statistic (n*obs - rtot*ctot)^2 scaled against n*rtot*ctot — " +
        "no expected-count division, no float. Everything after the " +
        "first groupBy runs on the contingency table (cells = " +
        "|lang|x|source|), so corpus size only affects the one " +
        "map-side-combinable count. The drift detector for mixture " +
        "composition monitoring."))
}
