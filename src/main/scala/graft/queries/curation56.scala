package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.VectorOps._

/** Batch 56: graph-based ANN — NSW-style greedy beam search over the
  * kNN graph, the one modern ANN index family the engine did not yet
  * demonstrate (IVF, LSH, multiprobe and PQ are in).  The search is a
  * FIXED-DEPTH unrolled expansion (3 rounds, beam 8) from fixed entry
  * points, so it is fully declarative, deterministic, and expressible
  * as an identical DuckDB oracle — and its cost model is the point:
  * per query it touches at most beam x degree x rounds nodes, a
  * constant, INDEPENDENT of corpus size.  That bounded-touch property
  * (plus an insertion order that keeps the graph navigable) is exactly
  * why HNSW-family indexes are the production default at vector-store
  * scale; the hierarchy is an optimization of the entry point, not of
  * this search loop.
  */
object Curation56Queries {

  private val Beam = 8
  private val Rounds = 3
  private val EntrySeeds = Seq(17L, 93L, 171L, 247L)

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "ann_graph_topk",
      (s, d) => {
        // corpus slice + queries (same bounded construction as
        // knn_graph / the other ann_* queries)
        val e = Tables.embeddings(s, d).filter(col("vec_id") < 300)
          .select(col("vec_id").as("cid"), col("embedding").as("ce"))
        val q = Tables.embeddings(s, d).filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val ed = GraphQueries.knnEdges(s, d)
        val und = ed.unionByName(
            ed.select(col("dst").as("src"), col("src").as("dst")))
          .distinct()
        // score a candidate set and keep the per-query top b — the
        // window partitions on qid over a BOUNDED set (<= beam *
        // (degree + 1) rows per query), never corpus rows
        def topB(cands: DataFrame, b: Int): DataFrame = cands
          .distinct()
          .join(e, "cid").join(broadcast(q), "qid")
          .filter(col("qid") =!= col("cid"))
          .select(col("qid"), col("cid"),
            cosine(col("qe"), col("ce")).as("cos"))
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("cos").desc, col("cid"))))
          .filter(col("rnk") <= b)
        // fixed entry points -> beam; then Rounds greedy expansions:
        // candidates = beam + kNN neighbors of beam, re-ranked, top-8
        val seeds = q.select(col("qid")).withColumn("cid",
          explode(array(EntrySeeds.map(lit): _*)))
        var beam = topB(seeds, Beam).select(col("qid"), col("cid"))
        for (_ <- 1 to Rounds) {
          val expand = beam.join(und, beam("cid") === und("src"))
            .select(col("qid"), col("dst").as("cid"))
            .unionByName(beam)
          beam = topB(expand, Beam).select(col("qid"), col("cid"))
        }
        topB(beam, 3)
          .select(col("qid"), col("cid"), col("rnk").cast("bigint")
            .as("rank"),
            floor(col("cos") * 1000000).cast("bigint").as("score_e6"))
      },
      Some {
        def round(prev: String, out: String): String =
          s"""cands_$out AS (SELECT DISTINCT qid, cid FROM (
             |    SELECT b.qid, u.dst AS cid
             |    FROM $prev b JOIN und u ON u.src = b.cid
             |    UNION ALL SELECT qid, cid FROM $prev)),
             |scored_$out AS (SELECT c.qid, c.cid,
             |    ${cosineSql("q.qe", "e.ce")} AS cos
             |  FROM cands_$out c JOIN e ON e.cid = c.cid
             |  JOIN q ON q.qid = c.qid
             |  WHERE c.qid <> c.cid),
             |$out AS (SELECT qid, cid FROM (
             |    SELECT qid, cid, row_number() OVER (PARTITION BY qid
             |      ORDER BY cos DESC, cid) AS rnk FROM scored_$out)
             |  WHERE rnk <= $Beam)""".stripMargin
        val seedVals = EntrySeeds.map(v => s"($v)").mkString(",")
        s"""WITH ${GraphQueries.knnEdgesSql},
           |und AS (SELECT DISTINCT src, dst FROM (
           |    SELECT src, dst FROM edges
           |    UNION ALL SELECT dst, src FROM edges)),
           |e AS (SELECT vec_id AS cid, embedding AS ce FROM base),
           |q AS (SELECT vec_id AS qid, embedding AS qe
           |      FROM embeddings WHERE vec_id < 10),
           |seed AS (SELECT qid, s.cid::BIGINT AS cid
           |         FROM q, (VALUES $seedVals) s(cid)),
           |scored_b0 AS (SELECT c.qid, c.cid,
           |    ${cosineSql("q.qe", "e.ce")} AS cos
           |  FROM seed c JOIN e ON e.cid = c.cid JOIN q ON q.qid = c.qid
           |  WHERE c.qid <> c.cid),
           |b0 AS (SELECT qid, cid FROM (
           |    SELECT qid, cid, row_number() OVER (PARTITION BY qid
           |      ORDER BY cos DESC, cid) AS rnk FROM scored_b0)
           |  WHERE rnk <= $Beam),
           |${round("b0", "b1")},
           |${round("b1", "b2")},
           |${round("b2", "b3")}
           |SELECT c.qid, c.cid, rnk::BIGINT AS rank,
           |  floor(cos * 1000000)::BIGINT AS score_e6
           |FROM (SELECT qid, cid, cos, row_number() OVER (
           |    PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
           |  FROM scored_b3) c
           |WHERE rnk <= 3""".stripMargin
      },
      "Graph-based ANN (NSW-style): greedy beam search over the k=3 " +
        "kNN graph — 4 fixed entry points, beam 8, 3 unrolled " +
        "expansion rounds, final top-3 per query.  Every round is " +
        "(bounded beam) JOIN (bounded-degree adjacency) -> re-rank, " +
        "so a query touches <= beam*degree*rounds nodes regardless of " +
        "corpus size — the property that makes navigable-small-world " +
        "indexes the production ANN default; HNSW adds a hierarchy " +
        "only to pick better entry points.  All scoring on the " +
        "bit-parity cosine kernel; deterministic (cos DESC, cid) " +
        "tie-breaks end to end.  Recall vs brute force is measured in " +
        "AnnRecallSpec alongside the IVF and LSH paths."),
  )
}
