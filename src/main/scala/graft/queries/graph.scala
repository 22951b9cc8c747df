package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.VectorOps._

/** Graph analytics over the corpus similarity structure: PageRank-style
  * centrality on the kNN graph, in exact fixed-point arithmetic.
  * Centrality over the semantic graph is a curation signal — pick
  * representative documents, down-weight redundant neighborhoods —
  * and the implementation pattern (edge-list joins + per-node aggs,
  * iterations as repeated passes) is the standard Pregel-free DataFrame
  * formulation that scales with the node/edge shuffles.
  */
object GraphQueries {

  /** k=3 kNN edge list over the bounded 300-vector slice (same
    * construction as knn_graph; see its doc for the 100 TB path —
    * LSH/IVF bucketed candidate generation upstream of the same
    * top-k). */
  private def knnEdges(s: SparkSession, d: String): DataFrame = {
    val base = Tables.embeddings(s, d).filter(col("vec_id") < 300)
      .select(col("vec_id"), col("embedding"))
    base.as("x").join(broadcast(base.as("y")),
        col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("src"), col("y.vec_id").as("dst"),
        cosine(col("x.embedding"), col("y.embedding")).as("cos"))
      .withColumn("nn_rank", row_number().over(
        Window.partitionBy(col("src"))
          .orderBy(col("cos").desc, col("dst"))))
      .filter(col("nn_rank") <= 3)
      .select(col("src"), col("dst"))
  }

  private val knnEdgesSql: String =
    s"""base AS (SELECT vec_id, embedding FROM embeddings
      |             WHERE vec_id < 300),
      |scored AS (SELECT x.vec_id AS src, y.vec_id AS dst,
      |    ${cosineSql("x.embedding", "y.embedding")} AS cos
      |  FROM base x JOIN base y ON x.vec_id != y.vec_id),
      |edges AS (SELECT src, dst FROM (SELECT src, dst, row_number() OVER (
      |    PARTITION BY src ORDER BY cos DESC, dst) AS nn_rank
      |  FROM scored) WHERE nn_rank <= 3)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "pagerank_knn",
      (s, d) => {
        val edges = knnEdges(s, d)
        val nodes = Tables.embeddings(s, d).filter(col("vec_id") < 300)
          .select(col("vec_id"))
        // Fixed-point PageRank, damping 0.85, rank scaled by 1e6.
        // Every node has out-degree exactly k=3 (kNN), so the per-edge
        // contribution is rank div 3 — exact integer, no float mass.
        def step(pr: DataFrame): DataFrame = {
          val contrib = edges.join(pr, edges("src") === pr("vec_id"))
            .select(col("dst"), expr("pr div 3").as("c"))
            .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
          nodes.join(contrib, nodes("vec_id") === contrib("dst"), "left")
            .select(nodes("vec_id"),
              (lit(150000L) +
                expr("(85 * coalesce(inflow, 0L)) div 100")).as("pr"))
        }
        val pr0 = nodes.select(col("vec_id"), lit(1000000L).as("pr"))
        step(step(pr0)).withColumnRenamed("pr", "pr_e6")
      },
      Some(s"""WITH $knnEdgesSql,
        |nodes AS (SELECT vec_id FROM embeddings WHERE vec_id < 300),
        |pr0 AS (SELECT vec_id, 1000000::BIGINT AS pr FROM nodes),
        |in1 AS (SELECT e.dst, sum(p.pr // 3)::BIGINT AS inflow
        |  FROM edges e JOIN pr0 p ON p.vec_id = e.src GROUP BY e.dst),
        |pr1 AS (SELECT n.vec_id,
        |    (150000 + (85 * coalesce(i.inflow, 0)) // 100)::BIGINT AS pr
        |  FROM nodes n LEFT JOIN in1 i ON i.dst = n.vec_id),
        |in2 AS (SELECT e.dst, sum(p.pr // 3)::BIGINT AS inflow
        |  FROM edges e JOIN pr1 p ON p.vec_id = e.src GROUP BY e.dst),
        |pr2 AS (SELECT n.vec_id,
        |    (150000 + (85 * coalesce(i.inflow, 0)) // 100)::BIGINT AS pr
        |  FROM nodes n LEFT JOIN in2 i ON i.dst = n.vec_id)
        |SELECT vec_id, pr AS pr_e6 FROM pr2""".stripMargin),
      "PageRank centrality (damping 0.85, 2 iterations) over the kNN " +
        "similarity graph, in exact fixed-point integers: out-degree is " +
        "the kNN k, so per-edge contributions are integer divisions and " +
        "the rank vector is reproducible on any cluster layout. Each " +
        "iteration is one edge-by-rank equi-join + one per-dst agg — " +
        "the shuffle-per-superstep shape that holds at billions of " +
        "edges; iterations chain as repeated passes with the rank " +
        "frontier checkpointed between them at scale."),
  )
}
