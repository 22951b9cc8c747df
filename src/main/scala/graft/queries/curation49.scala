package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 49: post-training (preference) data preparation — the DPO /
  * GRPO-side counterpart of the pretraining curation families.  The
  * reference pipeline stops at SFT sweeps (train_adapters/
  * create_all_models.py:39-76); these queries cover what a pipeline
  * feeding preference optimization additionally needs: mining
  * chosen/rejected pairs per group, auditing the mined pairs for the
  * well-known length bias, and group-relative reward normalization.
  * All scores are integer fixed-point so both engines hash-match.
  */
object Curation49Queries {

  /** Integer quality proxy: lexical diversity permille + capped length
    * bonus.  Mirrors the e3 convention of text_quality_score; self-
    * contained so the oracle states the same formula verbatim. */
  private val scoreE3 = expr(
    "cast(size(array_distinct(split(text, ' '))) AS bigint) * 1000 div " +
      "cast(size(split(text, ' ')) AS bigint) + " +
      "least(cast(length(text) AS bigint), cast(400 AS bigint))")

  private val scoreE3Sql =
    """(len(list_distinct(string_split(text, ' ')))::BIGINT * 1000
      |      // len(string_split(text, ' '))::BIGINT
      |      + least(length(text)::BIGINT, 400))""".stripMargin

  /** Shared scored-docs projection. */
  private def scored(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d).select(
      col("doc_id"), col("source"), col("lang"),
      scoreE3.as("score_e3"),
      length(col("text")).cast("long").as("len"))

  private val scoredSql =
    s"""SELECT doc_id, source, lang, $scoreE3Sql AS score_e3,
      |    length(text)::BIGINT AS len FROM documents""".stripMargin

  /** Chosen/rejected per (source, lang): extremes by score with
    * deterministic tie-breaks (chosen ties -> lowest id, rejected ties
    * -> lowest id), as one partial-aggregatable min/max-struct groupBy
    * — a single shuffle on the group key, no windows. */
  private def pairs(s: org.apache.spark.sql.SparkSession, d: String) =
    scored(s, d)
      .groupBy(col("source"), col("lang"))
      .agg(
        max(struct(col("score_e3"), (lit(0L) - col("doc_id")).as("nid"),
          col("len"))).as("c"),
        min(struct(col("score_e3"), col("doc_id"), col("len"))).as("r"),
        count(lit(1)).as("n_docs"))
      .select(col("source"), col("lang"),
        (lit(0L) - col("c.nid")).as("chosen_id"),
        col("r.doc_id").as("rejected_id"),
        (col("c.score_e3") - col("r.score_e3")).as("margin_e3"),
        (col("c.len") - col("r.len")).as("len_delta"))
      .filter(col("margin_e3") >= 1)

  private val pairsSql =
    s"""WITH sc AS ($scoredSql),
      |ch AS (SELECT source, lang, doc_id AS chosen_id,
      |    score_e3 AS cs, len AS cl FROM (
      |    SELECT *, row_number() OVER (PARTITION BY source, lang
      |      ORDER BY score_e3 DESC, doc_id) AS rn FROM sc) WHERE rn = 1),
      |rj AS (SELECT source, lang, doc_id AS rejected_id,
      |    score_e3 AS rs, len AS rl FROM (
      |    SELECT *, row_number() OVER (PARTITION BY source, lang
      |      ORDER BY score_e3, doc_id) AS rn FROM sc) WHERE rn = 1),
      |pr AS (SELECT ch.source, ch.lang, chosen_id, rejected_id,
      |    cs - rs AS margin_e3, cl - rl AS len_delta
      |  FROM ch JOIN rj ON ch.source = rj.source AND ch.lang = rj.lang
      |  WHERE cs - rs >= 1)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------ DPO pair construction
    QueryDef(
      "preference_pair_mining",
      (s, d) => pairs(s, d),
      Some(s"""$pairsSql
        |SELECT source, lang, chosen_id, rejected_id, margin_e3,
        |  len_delta FROM pr""".stripMargin),
      "Preference-pair mining (the DPO data-construction step): per " +
        "(source, lang) group, chosen = highest-quality doc, rejected " +
        "= lowest, with deterministic tie-breaks and a positive-margin " +
        "filter.  One partial-aggregatable min/max-struct groupBy — a " +
        "single shuffle on the group key, no windows, no per-group " +
        "sort — so at 100 TB the cost is the same as count_by_group.  " +
        "The integer quality proxy (lexical-diversity permille + " +
        "capped length bonus) stands in for a reward model; swap the " +
        "score column, keep the plan."),

    // --------------------------------------------- length-bias audit
    QueryDef(
      "dpo_length_bias_audit",
      (s, d) => pairs(s, d)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(when(col("len_delta") > 0, 1L).otherwise(0L))
            .as("n_chosen_longer"),
          sum(when(col("len_delta") < 0, 1L).otherwise(0L))
            .as("n_chosen_shorter"),
          sum(col("len_delta")).as("sum_len_delta")),
      Some(s"""$pairsSql
        |SELECT lang, count(*)::BIGINT AS n_pairs,
        |  sum(CASE WHEN len_delta > 0 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_chosen_longer,
        |  sum(CASE WHEN len_delta < 0 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_chosen_shorter,
        |  sum(len_delta)::BIGINT AS sum_len_delta
        |FROM pr GROUP BY lang""".stripMargin),
      "Length-bias audit over the mined preference pairs: DPO-trained " +
        "models inherit any systematic chosen-longer-than-rejected " +
        "skew, so the per-language longer/shorter split and signed " +
        "length mass are the first thing to check before training.  " +
        "Rides the pair-mining aggregate, then a 5-key re-agg — " +
        "nothing here grows with corpus size except the one group-key " +
        "shuffle the pairs already paid."),

    // ----------------------------------- GRPO group-relative advantage
    QueryDef(
      "grpo_advantage_normalize",
      (s, d) => {
        // Group-relative normalization (the GRPO advantage): per
        // source group, adv = (score - mean) / std, computed entirely
        // from integer group moments: adv_e3 = (n*score - sum) * 1000
        // div max(floor(sqrt(n*sumsq - sum^2)), 1) — note
        // sqrt(n*sumsq - sum^2) = n*std, so the quotient IS
        // (score-mean)/std on the e3 grid.  Stats are 20 rows and
        // broadcast back; the corpus is scanned once.
        val sc = scored(s, d)
        val stats = sc.groupBy(col("source"))
          .agg(count(lit(1)).as("n"), sum(col("score_e3")).as("sm"),
            sum(col("score_e3") * col("score_e3")).as("sq"))
          .select(col("source"), col("n"), col("sm"),
            greatest(floor(sqrt((col("n") * col("sq") -
              col("sm") * col("sm")).cast("double"))).cast("long"),
              lit(1L)).as("nstd"))
        sc.join(broadcast(stats), "source")
          .select(col("doc_id"), col("source"),
            expr("(n * score_e3 - sm) * 1000 div nstd").as("adv_e3"))
      },
      Some(s"""WITH sc AS ($scoredSql),
        |st AS (SELECT source, count(*)::BIGINT AS n,
        |    sum(score_e3)::BIGINT AS sm,
        |    greatest(floor(sqrt((count(*)::BIGINT * sum(score_e3 * score_e3)::BIGINT
        |      - sum(score_e3)::BIGINT * sum(score_e3)::BIGINT)::DOUBLE))::BIGINT,
        |      1) AS nstd
        |  FROM sc GROUP BY source)
        |SELECT sc.doc_id, sc.source,
        |  (st.n * sc.score_e3 - st.sm) * 1000 // st.nstd AS adv_e3
        |FROM sc JOIN st ON sc.source = st.source""".stripMargin),
      "Group-relative reward normalization (the GRPO advantage " +
        "computation): per-group integer moments (n, sum, sum-of-" +
        "squares) in one partial-aggregatable pass, then adv = " +
        "(score - mean)/std evaluated as (n*score - sum)*1000 div " +
        "floor(sqrt(n*sumsq - sum^2)) — exact integer arithmetic " +
        "around a single deterministic double sqrt of a bounded " +
        "integer.  The 20-row stats table broadcasts back onto the " +
        "scan; at 100 TB this is one corpus pass + one tiny " +
        "broadcast, the canonical two-phase normalize (same shape as " +
        "repartitioned_two_phase_agg)."),
  )
}
