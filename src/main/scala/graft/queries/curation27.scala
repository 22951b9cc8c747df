package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import GraphQueries.{knnEdges, knnEdgesSql}

/** Batch 21: structural graph analytics over the kNN digraph — link
  * prediction by neighborhood overlap, reciprocity, degree mixing, and
  * local-bridge detection.  All four ride the same bounded-degree edge
  * substrate (out-degree = k), so every join's fan-out is capped and the
  * shapes survive a 100 TB corpus whose kNN graph has billions of edges
  * but still k per node.
  */
object Curation27Queries {

  /** Canonical undirected edge set (a < b). */
  private def und(s: SparkSession, d: String): DataFrame =
    knnEdges(s, d)
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()

  private val undSql =
    s"""$knnEdgesSql,
       |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |        FROM edges)""".stripMargin

  /** Symmetrized adjacency (both directions) with per-node degree. */
  private def adj(s: SparkSession, d: String): DataFrame = {
    val u = und(s, d)
    u.select(col("a").as("u"), col("b").as("v"))
      .unionByName(u.select(col("b").as("u"), col("a").as("v")))
  }

  private val adjSql =
    """adj AS (SELECT a AS u, b AS v FROM und
      |        UNION ALL SELECT b AS u, a AS v FROM und)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------- neighborhood-Jaccard link pred
    QueryDef(
      "node_jaccard_linkpred",
      (s, d) => {
        val a = adj(s, d)
        val deg = a.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        // candidate pairs: 2-hop wedges (x -w- y), x < y, not already edges
        val cand = a.select(col("u").as("x"), col("v").as("w"))
          .join(a.select(col("u").as("w"), col("v").as("y")), Seq("w"))
          .filter(col("x") < col("y"))
          .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cn"))
          .join(und(s, d), col("x") === col("a") && col("y") === col("b"),
            "left_anti")
        cand
          .join(deg.select(col("u").as("x"), col("deg").as("dx")), Seq("x"))
          .join(deg.select(col("u").as("y"), col("deg").as("dy")), Seq("y"))
          .select(col("x"), col("y"), col("cn"),
            expr("(1000 * cn) div (dx + dy - cn)").as("jaccard_permille"))
          .filter(col("jaccard_permille") >= 250)
      },
      Some(s"""WITH $undSql,
        |$adjSql,
        |deg AS (SELECT u, count(*)::BIGINT AS deg FROM adj GROUP BY u),
        |wedge AS (SELECT a1.u AS x, a2.v AS y, count(*)::BIGINT AS cn
        |  FROM adj a1 JOIN adj a2 ON a2.u = a1.v
        |  WHERE a1.u < a2.v GROUP BY 1, 2),
        |cand AS (SELECT w.* FROM wedge w
        |  WHERE NOT EXISTS (SELECT 1 FROM und
        |                    WHERE und.a = w.x AND und.b = w.y))
        |SELECT c.x, c.y, c.cn,
        |  ((1000 * c.cn) // (dx.deg + dy.deg - c.cn))::BIGINT
        |    AS jaccard_permille
        |FROM cand c
        |JOIN deg dx ON dx.u = c.x JOIN deg dy ON dy.u = c.y
        |WHERE (1000 * c.cn) // (dx.deg + dy.deg - c.cn) >= 250""".stripMargin),
      "Link prediction by neighborhood Jaccard: for every non-adjacent " +
        "2-hop pair, |N(x) ∩ N(y)| / |N(x) ∪ N(y)| in permille, kept " +
        "when >= 0.25 — the classical common-neighbors predictor with " +
        "union normalization (complements resource_allocation_linkpred's " +
        "degree-weighted variant).  Candidates come from wedges, never " +
        "from a node cross-product, so the pair count is bounded by " +
        "sum-of-degree-squares — with the kNN cap that is O(k^2 n), " +
        "linear in corpus size."),

    // ------------------------------------------------------- reciprocity
    QueryDef(
      "graph_reciprocity",
      (s, d) => {
        val e = knnEdges(s, d)
        val rec = e.as("f")
          .join(e.as("r"), col("f.src") === col("r.dst") &&
            col("f.dst") === col("r.src"), "left_semi")
          .groupBy(col("f.src").as("vec_id"))
          .agg(count(lit(1)).as("n_reciprocal"))
        e.groupBy(col("src").as("vec_id"))
          .agg(count(lit(1)).as("out_deg"))
          .join(rec, Seq("vec_id"), "left")
          .select(col("vec_id"), col("out_deg"),
            coalesce(col("n_reciprocal"), lit(0L)).as("n_reciprocal"),
            expr("(1000 * coalesce(n_reciprocal, 0)) div out_deg")
              .as("reciprocity_permille"))
      },
      Some(s"""WITH $knnEdgesSql,
        |rec AS (SELECT f.src AS vec_id, count(*)::BIGINT AS n_reciprocal
        |  FROM edges f
        |  WHERE EXISTS (SELECT 1 FROM edges r
        |                WHERE r.dst = f.src AND r.src = f.dst)
        |  GROUP BY f.src),
        |deg AS (SELECT src AS vec_id, count(*)::BIGINT AS out_deg
        |        FROM edges GROUP BY src)
        |SELECT d.vec_id, d.out_deg,
        |  coalesce(rec.n_reciprocal, 0)::BIGINT AS n_reciprocal,
        |  ((1000 * coalesce(rec.n_reciprocal, 0)) // d.out_deg)::BIGINT
        |    AS reciprocity_permille
        |FROM deg d LEFT JOIN rec ON rec.vec_id = d.vec_id""".stripMargin),
      "Per-node edge reciprocity of the kNN digraph: the share of a " +
        "node's k nearest neighbors that also pick it back.  High " +
        "reciprocity marks tight mutual clusters (near-duplicate " +
        "pockets); zero reciprocity marks hub-and-spoke regions where " +
        "a popular vector is everyone's neighbor but reciprocates " +
        "nobody — the structural signal behind hubness correction in " +
        "high-dimensional retrieval.  One self-semi-join on the edge " +
        "key: shuffle ∝ edges = k·n."),

    // ------------------------------------------- degree assortativity
    QueryDef(
      "degree_assortativity",
      (s, d) => {
        val deg = adj(s, d).groupBy(col("u")).agg(count(lit(1)).as("deg"))
        val pairs = und(s, d)
          .join(deg.select(col("u").as("a"), col("deg").as("da")), Seq("a"))
          .join(deg.select(col("u").as("b"), col("deg").as("db")), Seq("b"))
          // each undirected edge contributes both orientations so the
          // correlation is symmetric (standard Newman formulation)
          .select(col("da").as("j"), col("db").as("k"))
          .unionByName(und(s, d)
            .join(deg.select(col("u").as("a"), col("deg").as("da")),
              Seq("a"))
            .join(deg.select(col("u").as("b"), col("deg").as("db")),
              Seq("b"))
            .select(col("db").as("j"), col("da").as("k")))
        pairs.agg(count(lit(1)).as("m2"),
          sum(col("j")).as("sj"), sum(col("k")).as("sk"),
          sum(col("j") * col("k")).as("sjk"),
          sum(col("j") * col("j")).as("sjj"),
          sum(col("k") * col("k")).as("skk"))
          .select(col("m2"),
            (col("m2") * col("sjk") - col("sj") * col("sk")).as("cov_num"),
            (col("m2") * col("sjj") - col("sj") * col("sj")).as("var_j_num"),
            (col("m2") * col("skk") - col("sk") * col("sk")).as("var_k_num"))
      },
      Some(s"""WITH $undSql,
        |$adjSql,
        |deg AS (SELECT u, count(*)::BIGINT AS deg FROM adj GROUP BY u),
        |pairs AS (
        |  SELECT da.deg AS j, db.deg AS k FROM und
        |    JOIN deg da ON da.u = und.a JOIN deg db ON db.u = und.b
        |  UNION ALL
        |  SELECT db.deg AS j, da.deg AS k FROM und
        |    JOIN deg da ON da.u = und.a JOIN deg db ON db.u = und.b)
        |SELECT count(*)::BIGINT AS m2,
        |  (count(*) * sum(j * k) - sum(j) * sum(k))::BIGINT AS cov_num,
        |  (count(*) * sum(j * j) - sum(j) * sum(j))::BIGINT AS var_j_num,
        |  (count(*) * sum(k * k) - sum(k) * sum(k))::BIGINT AS var_k_num
        |FROM pairs""".stripMargin),
      "Degree assortativity (Newman): the Pearson correlation of end-" +
        "point degrees over edges, reported as exact integer cross-" +
        "moments (r = cov_num / sqrt(var_j_num * var_k_num) is one IEEE " +
        "op for the caller, everything upstream is order-independent " +
        "int64).  Negative r says hubs attach to leaves (hub-and-spoke " +
        "embedding space), positive says rich-club clustering — it " +
        "changes how you pick IVF coarse centroids.  Edge-local joins " +
        "only; no global sort."),

    // --------------------------------------------------- local bridges
    QueryDef(
      "local_bridge_edges",
      (s, d) => {
        val a = adj(s, d)
        val wedges = a.select(col("u").as("x"), col("v").as("w"))
          .join(a.select(col("u").as("w"), col("v").as("y")), Seq("w"))
          .filter(col("x") < col("y"))
          .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cn"))
        und(s, d)
          .join(wedges, col("a") === col("x") && col("b") === col("y"),
            "left")
          .select(col("a"), col("b"),
            coalesce(col("cn"), lit(0L)).as("common_neighbors"),
            when(coalesce(col("cn"), lit(0L)) === 0, 1L).otherwise(0L)
              .as("is_local_bridge"))
      },
      Some(s"""WITH $undSql,
        |$adjSql,
        |wedge AS (SELECT a1.u AS x, a2.v AS y, count(*)::BIGINT AS cn
        |  FROM adj a1 JOIN adj a2 ON a2.u = a1.v
        |  WHERE a1.u < a2.v GROUP BY 1, 2)
        |SELECT und.a, und.b,
        |  coalesce(w.cn, 0)::BIGINT AS common_neighbors,
        |  CASE WHEN coalesce(w.cn, 0) = 0 THEN 1 ELSE 0 END::BIGINT
        |    AS is_local_bridge
        |FROM und LEFT JOIN wedge w ON w.x = und.a AND w.y = und.b""".stripMargin),
      "Local-bridge detection: an edge whose endpoints share zero " +
        "common neighbors is the only local path between its two " +
        "regions (span > 2) — in a kNN semantic graph these are the " +
        "connections between otherwise-unrelated topic clusters, " +
        "exactly the edges community-pruning (and SemDeDup-style " +
        "cluster splitting) should treat with suspicion.  The wedge " +
        "count is reused verbatim from the link-prediction pass; the " +
        "bridge test is one left join against it."),
  )
}
