package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Round-4 continuation batch 12: the standard ranked-retrieval and
  * classifier-quality metrics an evaluation harness reports alongside the
  * reference's rank averages (rag_evaluation/RAG-eval-test_model.py:
  * 143-153 emits avg ranks; NDCG/MRR/AUC/calibration are the metrics a
  * production eval adds on the same ranked output).
  *
  * Determinism: every metric is integer fixed-point. The log2 discounts
  * of NDCG enter as literal e6 constants (identical in both engines, so
  * libm ulp differences cannot leak in); AUC uses the tie-aware rank-sum
  * form scaled by 2 to stay integral.
  */
object Curation18Queries {

  /** floor(1e6 / log2(rank+1)) for rank = 1..10 — literal so both engines
    * use bit-identical discounts. */
  private val discE6 = Seq(1000000L, 630929L, 500000L, 430676L, 386852L,
    356207L, 333333L, 315464L, 301029L, 289064L)
  private val cumE6 = discE6.scanLeft(0L)(_ + _).tail

  private def lits(xs: Seq[Long]) = array(xs.map(lit): _*)
  private def sqlList(xs: Seq[Long]) = xs.mkString("[", ", ", "]")

  /** Embedding-derived classifier stand-in: score from the first embedding
    * dimension (e3 fixed point), positive = label in the lower half. */
  private def scored(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.embeddings(s, d).select(
      col("vec_id"),
      floor(element_at(col("embedding"), 1).cast("double") * 1000)
        .cast("long").as("score_e3"),
      when(col("label") < 5, lit(1L)).otherwise(lit(0L)).as("pos"))

  private val scoredSql =
    """scored AS (SELECT vec_id,
      |    CAST(floor(embedding[1] * 1000) AS BIGINT) AS score_e3,
      |    CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos
      |  FROM embeddings)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------ NDCG@10
    QueryDef(
      "ndcg_at_10",
      (s, d) => {
        val per = VectorQueries.rankedRelevant(s, d)
          .groupBy(col("qid"))
          .agg(
            coalesce(sum(when(col("relevant") && col("rank") <= 10,
              element_at(lits(discE6), col("rank").cast("int")))), lit(0L))
              .as("dcg_e6"),
            sum(when(col("relevant"), lit(1L)).otherwise(lit(0L)))
              .as("nrel"))
        per
          .withColumn("idcg_e6",
            when(col("nrel") === 0, lit(0L))
              .otherwise(element_at(lits(cumE6),
                least(col("nrel"), lit(10L)).cast("int"))))
          .select(col("qid"), col("dcg_e6"), col("idcg_e6"),
            when(col("idcg_e6") === 0, lit(0L))
              .otherwise(expr("dcg_e6 * 1000000 div idcg_e6"))
              .as("ndcg_e6"))
      },
      Some(s"""WITH ${VectorQueries.rankedRelevantSql},
        |per AS (SELECT qid,
        |    coalesce(sum(CASE WHEN relevant AND rank <= 10
        |        THEN (${sqlList(discE6)})[rank] END), 0)::BIGINT AS dcg_e6,
        |    sum(CASE WHEN relevant THEN 1 ELSE 0 END)::BIGINT AS nrel
        |  FROM ranked GROUP BY qid),
        |w AS (SELECT qid, dcg_e6,
        |    (CASE WHEN nrel = 0 THEN 0
        |          ELSE (${sqlList(cumE6)})[least(nrel, 10)] END)::BIGINT
        |      AS idcg_e6
        |  FROM per)
        |SELECT qid, dcg_e6, idcg_e6,
        |  (CASE WHEN idcg_e6 = 0 THEN 0
        |        ELSE dcg_e6 * 1000000 // idcg_e6 END)::BIGINT AS ndcg_e6
        |FROM w""".stripMargin),
      "NDCG@10 per query over the flagship ranked retrieval: binary " +
        "gains, discounts 1/log2(rank+1) materialized as literal e6 " +
        "integers (bit-identical across engines — no runtime log), " +
        "ideal DCG from the literal prefix-sum table at min(nrel, 10). " +
        "One shuffle (the per-qid agg) over the already-ranked stream; " +
        "at 100 TB the rank<=10 filter rides the topk window pushdown " +
        "so only 10 rows per query reach the metric."),

    // ------------------------------------------------------- MRR@k
    QueryDef(
      "mrr_at_10",
      (s, d) => {
        val fh = VectorQueries.rankedRelevant(s, d)
          .groupBy(col("qid"))
          .agg(min(when(col("relevant"), col("rank"))).as("fh"))
        fh.select(col("qid"),
          when(col("fh").isNull || col("fh") > 10, lit(0L))
            .otherwise(expr("1000000 div fh")).as("rr10_e6"),
          when(col("fh").isNull || col("fh") > 3, lit(0L))
            .otherwise(expr("1000000 div fh")).as("rr3_e6"))
      },
      Some(s"""WITH ${VectorQueries.rankedRelevantSql},
        |fh AS (SELECT qid, min(CASE WHEN relevant THEN rank END) AS fh
        |       FROM ranked GROUP BY qid)
        |SELECT qid,
        |  (CASE WHEN fh IS NULL OR fh > 10 THEN 0
        |        ELSE 1000000 // fh END)::BIGINT AS rr10_e6,
        |  (CASE WHEN fh IS NULL OR fh > 3 THEN 0
        |        ELSE 1000000 // fh END)::BIGINT AS rr3_e6
        |FROM fh""".stripMargin),
      "Reciprocal rank at cutoffs 10 and 3 per query (e6 fixed point, " +
        "0 on miss) — the truncated-MRR counterpart of " +
        "avg_first_hit_rank's sentinel mean " +
        "(RAG-eval-test_model.py:145-153). Same single-shuffle shape " +
        "as the other rank metrics; the min() is partial-aggregatable."),

    // ------------------------------------------------ rank-sum AUC
    QueryDef(
      "auc_rank_sum",
      (s, d) => {
        val byScore = scored(s, d)
          .groupBy(col("score_e3"))
          .agg(sum(col("pos")).as("npos"),
            sum(lit(1L) - col("pos")).as("nneg"))
        // exclusive cumulative negatives below each score: ScalablePrefix
        // inclusive running sum minus the row's own count — executed over
        // the compacted score histogram with range partitions, never an
        // unpartitioned window
        byScore
          .transform(df => graft.operators.ScalablePrefix
            .withRunningSums(df, Seq(col("score_e3")), Seq("nneg"), 8))
          .withColumn("cumneg", col("cum_nneg") - col("nneg"))
          .agg(
            sum(col("npos")).as("n_pos"),
            sum(col("nneg")).as("n_neg"),
            sum(col("npos") * (lit(2L) * col("cumneg") + col("nneg")))
              .as("u2"))
          .select(col("n_pos"), col("n_neg"),
            expr("u2 * 500000 div (n_pos * n_neg)").as("auc_e6"))
      },
      Some(s"""WITH $scoredSql,
        |byscore AS (SELECT score_e3,
        |    sum(pos)::BIGINT AS npos, sum(1 - pos)::BIGINT AS nneg
        |  FROM scored GROUP BY score_e3),
        |cum AS (SELECT score_e3, npos, nneg,
        |    coalesce(sum(nneg) OVER (ORDER BY score_e3
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cumneg
        |  FROM byscore),
        |tot AS (SELECT sum(npos)::BIGINT AS n_pos,
        |               sum(nneg)::BIGINT AS n_neg,
        |               sum(npos * (2 * cumneg + nneg))::BIGINT AS u2
        |        FROM cum)
        |SELECT n_pos, n_neg,
        |       (u2 * 500000 // (n_pos * n_neg))::BIGINT AS auc_e6
        |FROM tot""".stripMargin),
      "ROC-AUC of the embedding-derived score against the binary label " +
        "via the tie-aware Mann-Whitney rank sum: per distinct score, " +
        "positives earn 2*(negatives strictly below) + (negatives tied), " +
        "summed and normalized by 2*n1*n0 — all integer, so the AUC is " +
        "order-independent and engine-exact. Aggregating to distinct " +
        "scores first makes the prefix input |scores| not |rows|, and " +
        "the running negative count is ScalablePrefix over that " +
        "compacted histogram (range partition + offsets) — the " +
        "executed plan has no unpartitioned window and no global sort " +
        "of raw rows at any scale."),

    // ------------------------------------------- calibration table
    QueryDef(
      "calibration_bins",
      (s, d) => {
        // exact ntile(10) decile arithmetic on the ScalableIndex dense
        // rank (range partition + offsets) — no unpartitioned window
        // over the scored rows; scored is 1:1 with embeddings, so n is
        // a metadata-served parquet count
        val n = Tables.embeddings(s, d).count()
        val k = 10L
        val q = n / k
        val r = n % k
        val bucket =
          if (q == 0L) "idx + 1"
          else s"if(idx < ${r * (q + 1)}L, idx div ${q + 1}L, " +
            s"$r + (idx - ${r * (q + 1)}L) div ${q}L) + 1"
        graft.operators.ScalableIndex.withDenseIndex(scored(s, d),
            Seq(col("score_e3"), col("vec_id")), 8, "idx")
          .withColumn("bin", expr(s"cast($bucket AS bigint)"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"),
            sum(col("pos")).as("n_pos"),
            expr("sum(score_e3) div count(1)").as("mean_score_e3"),
            expr("(1000 * sum(pos)) div count(1)").as("pos_rate_e3"))
      },
      Some(s"""WITH $scoredSql,
        |binned AS (SELECT score_e3, pos,
        |    ntile(10) OVER (ORDER BY score_e3, vec_id)::BIGINT AS bin
        |  FROM scored)
        |SELECT bin, count(*)::BIGINT AS n, sum(pos)::BIGINT AS n_pos,
        |  (sum(score_e3) // count(*))::BIGINT AS mean_score_e3,
        |  ((1000 * sum(pos)) // count(*))::BIGINT AS pos_rate_e3
        |FROM binned GROUP BY bin""".stripMargin),
      "Reliability diagram: decile-bin the classifier score (total " +
        "order on (score, vec_id) makes ntile deterministic), then per " +
        "bin the mean score vs. the observed positive rate (e3). A " +
        "calibrated quality filter has pos_rate tracking mean_score — " +
        "the gate check before a threshold from conformal_threshold is " +
        "trusted. Executed as exact ntile arithmetic on the " +
        "ScalableIndex dense rank: range partition + per-partition " +
        "offsets, so the decile sort never collapses to one task."),
  )
}
