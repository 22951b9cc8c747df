package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.VectorOps.{cosine, cosineSql}

/** Batch 19: contrastive-training pair mining and coreset selection —
  * turning the retrieval-evaluation substrate (the reference's ranked
  * full-corpus cosine search, rag_evaluation/RAG-eval-test_model.py:
  * 130-154) into the training-data products a retriever-finetuning
  * pipeline consumes: hard negatives, in-batch negative assignments,
  * margin audits, and a kernel-herding coreset.
  */
object Curation25Queries {

  /** Per-query first relevant hit: (qid, qlabel, first_hit, pos_id). */
  private def firstHits(s: SparkSession, d: String) =
    VectorQueries.rankedRelevant(s, d)
      .filter(col("relevant"))
      .groupBy(col("qid"), col("qlabel"))
      .agg(min(col("rank")).as("first_hit"),
        min_by(col("cid"), col("rank")).as("pos_id"))

  private val firstHitsSql =
    s"""${VectorQueries.rankedRelevantSql},
       |fh AS (SELECT qid, min(rank) AS first_hit,
       |         min_by(cid, rank) AS pos_id
       |       FROM ranked WHERE relevant GROUP BY qid)""".stripMargin

  /** Hard negatives: non-relevant docs ranked above the first relevant
    * hit, capped at 2 per query — shared by mining + margin audit. */
  private def hardNegatives(s: SparkSession, d: String): DataFrame = {
    val fh = firstHits(s, d).select(col("qid"), col("first_hit"),
      col("pos_id"))
    VectorQueries.rankedRelevant(s, d)
      .filter(!col("relevant"))
      .join(broadcast(fh), Seq("qid"))
      .filter(col("rank") < col("first_hit"))
      .withColumn("nr", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("rank"))))
      .filter(col("nr") <= 2)
      .select(col("qid"), col("pos_id"), col("cid").as("neg_id"),
        col("rank").as("neg_rank"))
  }

  private val hardNegativesSql =
    s"""$firstHitsSql,
       |negs AS (SELECT r.qid, fh.pos_id, r.cid AS neg_id,
       |    r.rank AS neg_rank,
       |    row_number() OVER (PARTITION BY r.qid ORDER BY r.rank) AS nr
       |  FROM ranked r JOIN fh ON fh.qid = r.qid
       |  WHERE NOT r.relevant AND r.rank < fh.first_hit),
       |trip AS (SELECT qid, pos_id, neg_id, neg_rank FROM negs
       |         WHERE nr <= 2)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------------------- hard negative mining
    QueryDef(
      "hard_negative_mining",
      (s, d) => hardNegatives(s, d),
      Some(s"""WITH $hardNegativesSql
        |SELECT qid, pos_id, neg_id, neg_rank FROM trip""".stripMargin),
      "Hard-negative mining for contrastive retriever training: for " +
        "each query, the non-relevant documents the current embedding " +
        "ranks ABOVE the first relevant hit (capped at 2 per query) — " +
        "exactly the errors a triplet loss needs to push down. Pairs " +
        "ride the flagship broadcast ranking; the per-query cap bounds " +
        "output regardless of corpus size, and at 100 TB the mining " +
        "pass is the same one scan the evaluation already pays."),

    // ------------------------------------------- DPR in-batch negatives
    QueryDef(
      "dpr_inbatch_negatives",
      (s, d) => {
        val pos = firstHits(s, d)
          .withColumn("batch",
            pmod(conv(substring(md5(concat(lit("b"),
              col("qid").cast("string"))), 1, 8), 16, 10).cast("long"),
              lit(4L)))
          .select(col("qid"), col("qlabel"), col("batch"), col("pos_id"))
        val other = pos.select(col("qid").as("neg_qid"),
          col("qlabel").as("neg_qlabel"), col("batch"),
          col("pos_id").as("neg_id"))
        pos.join(other, Seq("batch"))
          .filter(col("qid") =!= col("neg_qid"))
          .select(col("qid"), col("batch"), col("neg_qid"), col("neg_id"),
            when(col("qlabel") === col("neg_qlabel"), 1L).otherwise(0L)
              .as("false_negative"))
      },
      Some(s"""WITH ${VectorQueries.rankedRelevantSql},
        |fh AS (SELECT r.qid, q.label AS qlabel,
        |         min_by(r.cid, r.rank) AS pos_id
        |       FROM ranked r JOIN embeddings q ON q.vec_id = r.qid
        |       WHERE r.relevant GROUP BY r.qid, q.label),
        |pos AS (SELECT qid, qlabel,
        |    (('0x' || substr(md5('b' || qid::VARCHAR), 1, 8))::BIGINT % 4)
        |      AS batch, pos_id
        |  FROM fh)
        |SELECT p.qid, p.batch, o.qid AS neg_qid, o.pos_id AS neg_id,
        |  CASE WHEN p.qlabel = o.qlabel THEN 1 ELSE 0 END::BIGINT
        |    AS false_negative
        |FROM pos p JOIN pos o ON o.batch = p.batch AND o.qid <> p.qid""".stripMargin),
      "DPR-style in-batch negative assignment: queries are hashed into " +
        "4 training batches; within a batch every other query's positive " +
        "document doubles as a free negative. false_negative flags the " +
        "known failure mode — another query with the SAME label " +
        "contributing its positive as a bogus negative — so batch " +
        "composition can be audited (and re-hashed) before training. " +
        "Pure metadata joins over the per-query positives: no embedding " +
        "payload moves, which is what makes batch re-sampling free even " +
        "when the corpus is not."),

    // ------------------------------------------------ triplet margin audit
    QueryDef(
      "triplet_margin_audit",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        hardNegatives(s, d)
          .join(broadcast(e.select(col("vec_id").as("qid"),
            col("embedding").as("qe"))), Seq("qid"))
          .join(e.select(col("vec_id").as("pos_id"),
            col("embedding").as("pe")), Seq("pos_id"))
          .join(e.select(col("vec_id").as("neg_id"),
            col("embedding").as("ne")), Seq("neg_id"))
          .select(col("qid"),
            (floor(cosine(col("qe"), col("pe")) * 1e6).cast("long") -
              floor(cosine(col("qe"), col("ne")) * 1e6).cast("long"))
              .as("margin_e6"))
          .groupBy(col("qid"))
          .agg(count(lit(1)).as("n_triplets"),
            min(col("margin_e6")).as("worst_margin_e6"),
            max(col("margin_e6")).as("closest_margin_e6"))
      },
      Some(s"""WITH $hardNegativesSql,
        |scored AS (SELECT t.qid,
        |    floor(${cosineSql("q.embedding", "p.embedding")} * 1e6)::BIGINT -
        |    floor(${cosineSql("q.embedding", "n.embedding")} * 1e6)::BIGINT
        |      AS margin_e6
        |  FROM trip t
        |  JOIN embeddings q ON q.vec_id = t.qid
        |  JOIN embeddings p ON p.vec_id = t.pos_id
        |  JOIN embeddings n ON n.vec_id = t.neg_id)
        |SELECT qid, count(*)::BIGINT AS n_triplets,
        |  min(margin_e6) AS worst_margin_e6,
        |  max(margin_e6) AS closest_margin_e6
        |FROM scored GROUP BY qid""".stripMargin),
      "Margin audit over the mined triplets: cos(q,pos) - cos(q,neg) in " +
        "e6 fixed point, aggregated per query. Hard negatives are by " +
        "construction ranked above the positive, so every margin is " +
        "<= 0 (the spec asserts it) — the magnitude distribution is the " +
        "curriculum signal (near-zero = boundary cases, large-negative " +
        "= label-noise candidates). Embeddings are fetched by key for " +
        "the O(queries) triplet set only — the corpus-wide scan from " +
        "mining is not repeated."),

    // --------------------------------------------- kernel herding coreset
    QueryDef(
      "herding_coreset_select",
      (s, d) => {
        val n = 100L
        val cand = Tables.embeddings(s, d).filter(col("vec_id") < n)
          .select(col("vec_id").as("cid"),
            posexplode(col("embedding")).as(Seq("dim", "v")))
          .select(col("cid"), col("dim"),
            floor(col("v").cast("double") * lit(1e6)).cast("long")
              .as("ve6"))
        val sums = cand.groupBy(col("dim")).agg(sum(col("ve6")).as("sv"))

        // argmax_c <w, phi(c)> over candidates not yet selected
        def pick(w: DataFrame, exclude: DataFrame): DataFrame =
          cand.join(broadcast(exclude), Seq("cid"), "left_anti")
            .join(broadcast(w), Seq("dim"))
            .groupBy(col("cid"))
            .agg(sum(col("ve6") * col("w")).as("score"))
            .orderBy(col("score").desc, col("cid")).limit(1)

        // W_k = W_{k-1} + S - n * phi(x_k)   (W_0 = S; all integer)
        def nextW(w: DataFrame, x: DataFrame): DataFrame = {
          val phi = cand.join(broadcast(x.select(col("cid"))), Seq("cid"))
            .select(col("dim"), col("ve6").as("p"))
          w.join(sums, Seq("dim")).join(broadcast(phi), Seq("dim"))
            .select(col("dim"),
              (col("w") + col("sv") - lit(n) * col("p")).as("w"))
        }

        val w1 = sums.select(col("dim"), col("sv").as("w"))
        val none = s.range(0).select(col("id").as("cid"))
        val x1 = pick(w1, none)
        val w2 = nextW(w1, x1)
        val x2 = pick(w2, x1.select(col("cid")))
        val w3 = nextW(w2, x2)
        val x3 = pick(w3,
          x1.select(col("cid")).unionByName(x2.select(col("cid"))))
        x1.select(lit(1L).as("pick_order"), col("cid"), col("score"))
          .unionByName(x2.select(lit(2L).as("pick_order"), col("cid"),
            col("score")))
          .unionByName(x3.select(lit(3L).as("pick_order"), col("cid"),
            col("score")))
      },
      Some("""WITH cand AS (SELECT vec_id AS cid, i AS dim,
        |    floor(embedding[i+1]::DOUBLE * 1e6)::BIGINT AS ve6
        |  FROM embeddings, (SELECT range AS i FROM range(0, 64)) i
        |  WHERE vec_id < 100),
        |sums AS (SELECT dim, sum(ve6)::BIGINT AS sv FROM cand GROUP BY dim),
        |s1 AS (SELECT cid, sum(ve6 * sv)::BIGINT AS score
        |       FROM cand JOIN sums USING (dim) GROUP BY cid),
        |x1 AS (SELECT cid, score FROM s1 ORDER BY score DESC, cid LIMIT 1),
        |w2 AS (SELECT s.dim, (2 * s.sv - 100 * c.ve6)::BIGINT AS w
        |       FROM sums s JOIN cand c ON c.dim = s.dim
        |       JOIN x1 ON c.cid = x1.cid),
        |s2 AS (SELECT c.cid, sum(c.ve6 * w2.w)::BIGINT AS score
        |       FROM cand c JOIN w2 USING (dim)
        |       WHERE c.cid NOT IN (SELECT cid FROM x1) GROUP BY c.cid),
        |x2 AS (SELECT cid, score FROM s2 ORDER BY score DESC, cid LIMIT 1),
        |w3 AS (SELECT w2.dim, (w2.w + s.sv - 100 * c.ve6)::BIGINT AS w
        |       FROM w2 JOIN sums s ON s.dim = w2.dim
        |       JOIN cand c ON c.dim = w2.dim JOIN x2 ON c.cid = x2.cid),
        |s3 AS (SELECT c.cid, sum(c.ve6 * w3.w)::BIGINT AS score
        |       FROM cand c JOIN w3 USING (dim)
        |       WHERE c.cid NOT IN (SELECT cid FROM x1)
        |         AND c.cid NOT IN (SELECT cid FROM x2) GROUP BY c.cid),
        |x3 AS (SELECT cid, score FROM s3 ORDER BY score DESC, cid LIMIT 1)
        |SELECT 1::BIGINT AS pick_order, cid, score FROM x1
        |UNION ALL SELECT 2::BIGINT, cid, score FROM x2
        |UNION ALL SELECT 3::BIGINT, cid, score FROM x3""".stripMargin),
      "Kernel-herding coreset selection (Chen et al. 2010): greedily " +
        "pick the embedding that best matches the corpus mean under the " +
        "running residual, W_k = W_{k-1} + S - n*phi(x_k) — scaled by n " +
        "so the whole recurrence stays in exact int64 (e6-quantized " +
        "dims; no float accumulation, so the argmax is order-" +
        "independent). 3 unrolled rounds, each one 64-row broadcast " +
        "join + argmax; the candidate scan parallelizes freely and the " +
        "driver never sees more than the 1-row winner per round — the " +
        "same shape that selects a 10k-doc coreset from 100 TB."),
  )
}
