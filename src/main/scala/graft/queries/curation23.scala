package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.VectorOps.{cosine, cosineSql}

/** Round-4 continuation batch 17: Matryoshka truncated-dimension
  * retrieval evaluation, HITS hub/authority scoring over the kNN graph,
  * and zone-map data skipping — the storage-layer pruning that makes
  * selective scans cheap at 100 TB.
  */
object Curation23Queries {

  /** Top-3 cosine neighbors per query using only the first `dim`
    * embedding dimensions. */
  private def top3(s: org.apache.spark.sql.SparkSession, d: String,
      dim: Int) = {
    val q = Tables.embeddings(s, d).filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"),
        slice(col("embedding"), 1, dim).as("qe"))
    val c = Tables.embeddings(s, d)
      .select(col("vec_id").as("cid"),
        slice(col("embedding"), 1, dim).as("ce"))
    broadcast(q).crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        cosine(col("qe"), col("ce")).as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("cid"))))
      .filter(col("rk") <= 3)
      .select(col("qid"), col("cid"))
  }

  private def top3Sql(dim: Int, name: String) =
    s"""$name AS (SELECT qid, cid FROM (
       |  SELECT qid, cid, row_number() OVER (
       |      PARTITION BY qid ORDER BY cos DESC, cid) AS rk
       |  FROM (SELECT q.vec_id AS qid, c.vec_id AS cid,
       |          ${cosineSql(s"q.embedding[1:$dim]", s"c.embedding[1:$dim]")}
       |            AS cos
       |        FROM embeddings q CROSS JOIN embeddings c
       |        WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id))
       |  WHERE rk <= 3)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------- Matryoshka dim eval
    QueryDef(
      "matryoshka_dim_eval",
      (s, d) => {
        val full = top3(s, d, 64)
        def overlap(dim: Int, out: String) =
          top3(s, d, dim).join(full, Seq("qid", "cid"))
            .groupBy(col("qid")).agg(count(lit(1)).as(out))
        val qids = Tables.embeddings(s, d).filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"))
        qids
          .join(overlap(8, "ov8"), Seq("qid"), "left")
          .join(overlap(16, "ov16"), Seq("qid"), "left")
          .select(col("qid"),
            coalesce(col("ov8"), lit(0L)).as("overlap8"),
            coalesce(col("ov16"), lit(0L)).as("overlap16"))
      },
      Some(s"""WITH ${top3Sql(64, "t64")},
        |${top3Sql(8, "t8")},
        |${top3Sql(16, "t16")},
        |o8 AS (SELECT a.qid, count(*)::BIGINT AS ov FROM t8 a
        |       JOIN t64 b ON a.qid = b.qid AND a.cid = b.cid
        |       GROUP BY a.qid),
        |o16 AS (SELECT a.qid, count(*)::BIGINT AS ov FROM t16 a
        |        JOIN t64 b ON a.qid = b.qid AND a.cid = b.cid
        |        GROUP BY a.qid)
        |SELECT q.vec_id AS qid,
        |  coalesce(o8.ov, 0)::BIGINT AS overlap8,
        |  coalesce(o16.ov, 0)::BIGINT AS overlap16
        |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 10) q
        |LEFT JOIN o8 ON o8.qid = q.vec_id
        |LEFT JOIN o16 ON o16.qid = q.vec_id""".stripMargin),
      "Matryoshka-representation evaluation: top-3 cosine retrieval " +
        "re-run with embeddings truncated to their first 8 and 16 of " +
        "64 dimensions, scored by overlap with the full-dimension " +
        "top-3 per query. The production question this answers: how " +
        "many prefix dims does the ANN tier need before the full-dim " +
        "reranker sees the right candidates. Prefix slicing is free " +
        "(no re-embedding); each truncated pass is the same broadcast " +
        "rubric crossJoin as the flagship ranking with a shorter " +
        "codegen'd kernel loop."),

    // ---------------------------------------------- HITS hub/authority
    QueryDef(
      "hits_hub_authority",
      (s, d) => {
        val edges = GraphQueries.knnEdges(s, d)
        val nodes = Tables.embeddings(s, d).filter(col("vec_id") < 300)
          .select(col("vec_id"))
        // round 1: a1 = indegree * 1e6; h1 = sum of a1 over out-edges
        val a1 = edges.groupBy(col("dst").as("vec_id"))
          .agg((count(lit(1)) * 1000000L).as("a"))
        val h1 = edges.join(a1, edges("dst") === a1("vec_id"))
          .groupBy(col("src").as("vec_id")).agg(sum(col("a")).as("h"))
        // round 2: a2 = sum of h1 over in-edges, then max-normalize both
        val a2 = edges.join(h1, edges("src") === h1("vec_id"))
          .groupBy(col("dst").as("vec_id")).agg(sum(col("h")).as("a"))
        val maxes = a2.agg(max(col("a")).as("amax")).crossJoin(
          h1.agg(max(col("h")).as("hmax")))
        nodes
          .join(a2, Seq("vec_id"), "left")
          .join(h1, Seq("vec_id"), "left")
          .crossJoin(broadcast(maxes))
          .select(col("vec_id"),
            expr("(coalesce(a, 0L) * 1000000) div amax").as("auth_e6"),
            expr("(coalesce(h, 0L) * 1000000) div hmax").as("hub_e6"))
      },
      Some(s"""WITH ${GraphQueries.knnEdgesSql},
        |nodes AS (SELECT vec_id FROM embeddings WHERE vec_id < 300),
        |a1 AS (SELECT dst AS vec_id, count(*)::BIGINT * 1000000 AS a
        |       FROM edges GROUP BY dst),
        |h1 AS (SELECT e.src AS vec_id, sum(a1.a)::BIGINT AS h
        |       FROM edges e JOIN a1 ON a1.vec_id = e.dst GROUP BY e.src),
        |a2 AS (SELECT e.dst AS vec_id, sum(h1.h)::BIGINT AS a
        |       FROM edges e JOIN h1 ON h1.vec_id = e.src GROUP BY e.dst),
        |mx AS (SELECT (SELECT max(a) FROM a2)::BIGINT AS amax,
        |              (SELECT max(h) FROM h1)::BIGINT AS hmax)
        |SELECT n.vec_id,
        |  (coalesce(a2.a, 0) * 1000000 // amax)::BIGINT AS auth_e6,
        |  (coalesce(h1.h, 0) * 1000000 // hmax)::BIGINT AS hub_e6
        |FROM nodes n
        |LEFT JOIN a2 ON a2.vec_id = n.vec_id
        |LEFT JOIN h1 ON h1.vec_id = n.vec_id, mx""".stripMargin),
      "HITS hub/authority over the kNN digraph: 1.5 power-iteration " +
        "rounds (a <- indeg, h <- sum a, a <- sum h) in exact integer " +
        "arithmetic, max-normalized to e6 — authorities are vectors " +
        "many neighborhoods point at (cluster centers), hubs are " +
        "vectors whose 3 neighbors are all authorities. Same " +
        "edge-join-aggregate shape as pagerank_knn: each round is one " +
        "shuffle on the join key, and the kNN out-degree cap (k=3) " +
        "bounds every node's contribution fan-out."),

    // ------------------------------------------------ zone-map skipping
    QueryDef(
      "zone_map_skipping",
      (s, d) => {
        // clustered-layout rank via ScalableIndex (range partition +
        // offsets) — the layout simulation's global sort never lands on
        // one task
        val base = graft.operators.ScalableIndex.withDenseIndex(
          Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
          Seq(col("n_chars"), col("doc_id")), 8, "idx")
          .withColumn("rk", col("idx") + 1L)
        val layouts =
          base.select(lit("natural").as("layout"),
            expr("doc_id div 64").as("block"), col("n_chars"))
          .unionByName(
            base.select(lit("clustered").as("layout"),
              expr("(rk - 1) div 64").as("block"), col("n_chars")))
        val blocks = layouts
          .groupBy(col("layout"), col("block"))
          .agg(min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"),
            count(lit(1)).as("rows"),
            sum(when(col("n_chars").between(400, 500), 1L).otherwise(0L))
              .as("matching"))
        blocks.groupBy(col("layout")).agg(
          count(lit(1)).as("n_blocks"),
          sum(when(col("hi") < 400 || col("lo") > 500, 1L).otherwise(0L))
            .as("n_skipped"),
          sum(col("rows")).as("rows_total"),
          sum(when(col("hi") >= 400 && col("lo") <= 500, col("rows"))
            .otherwise(0L)).as("rows_scanned"),
          sum(col("matching")).as("rows_matching"))
          .withColumn("scan_permille",
            expr("(1000 * rows_scanned) div rows_total"))
      },
      Some("""WITH base AS (
        |  SELECT doc_id, n_chars, row_number() OVER (
        |      ORDER BY n_chars, doc_id)::BIGINT AS rk
        |  FROM documents),
        |layouts AS (
        |  SELECT 'natural' AS layout, doc_id // 64 AS block, n_chars
        |  FROM base
        |  UNION ALL
        |  SELECT 'clustered' AS layout, (rk - 1) // 64 AS block, n_chars
        |  FROM base),
        |blocks AS (
        |  SELECT layout, block,
        |    min(n_chars) AS lo, max(n_chars) AS hi,
        |    count(*)::BIGINT AS rows,
        |    sum(CASE WHEN n_chars BETWEEN 400 AND 500 THEN 1 ELSE 0
        |        END)::BIGINT AS matching
        |  FROM layouts GROUP BY layout, block)
        |SELECT layout, count(*)::BIGINT AS n_blocks,
        |  sum(CASE WHEN hi < 400 OR lo > 500 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_skipped,
        |  sum(rows)::BIGINT AS rows_total,
        |  sum(CASE WHEN hi >= 400 AND lo <= 500 THEN rows ELSE 0
        |      END)::BIGINT AS rows_scanned,
        |  sum(matching)::BIGINT AS rows_matching,
        |  ((1000 * sum(CASE WHEN hi >= 400 AND lo <= 500 THEN rows
        |              ELSE 0 END)) // sum(rows))::BIGINT AS scan_permille
        |FROM blocks GROUP BY layout""".stripMargin),
      "Zone-map (min/max statistics) data skipping audit, natural vs " +
        "clustered layout: 64-row blocks carry lo/hi length stats; a " +
        "BETWEEN predicate skips every block whose range cannot " +
        "intersect. On the natural (ingest-order) layout every block " +
        "straddles the predicate and nothing skips; after clustering " +
        "on the predicate column the same zone maps skip almost " +
        "everything — scan_permille collapses toward the true match " +
        "rate. This is parquet row-group / Delta file-stats pruning " +
        "as an explicit query, and the quantified argument for " +
        "zorder_cluster-style layout maintenance at 100 TB."),
  )
}
