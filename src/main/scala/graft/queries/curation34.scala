package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 28: corpus-governance summaries — the dataset card, the token
  * budget plan, the curation funnel, and inter-gate agreement.  Each
  * compresses corpus-scale facts into a table a human (or a training
  * run config) actually consumes; the heavy lifting is shared scans
  * with per-source / per-stage / 2x2 state.
  */
object Curation34Queries {

  val defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------- dataset card
    QueryDef(
      "dataset_card_summary",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val toks = docs.select(col("doc_id"),
          explode(split(col("text"), " ")).as("tok"))
        val base = docs.agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"),
          sum(col("n_chars")).as("total_chars"),
          expr("sum(n_chars) div count(1)").as("mean_chars"))
        val tk = toks.agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("tok")).as("vocab_size"))
        val dup = docs.select(md5(col("text")).as("h"))
          .groupBy(col("h")).agg(count(lit(1)).as("c"))
          .agg(sum(col("c") - 1).as("n_exact_dups"))
        // exact median rank via ScalableIndex on (n_chars, doc_id) — a
        // deterministic total order (the old monotonically_increasing_id
        // tiebreak was placement-dependent) and no unpartitioned window
        val med = graft.operators.ScalableIndex.withDenseIndex(
          docs.select(col("n_chars"), col("doc_id")),
          Seq(col("n_chars"), col("doc_id")), 8, "idx")
          .withColumn("rk", col("idx") + 1L)
          .crossJoin(broadcast(docs.agg(count(lit(1)).as("nn"))))
          .filter(col("rk") === expr("(nn + 1) div 2"))
          .select(col("n_chars").as("median_chars"))
        base.crossJoin(broadcast(tk)).crossJoin(broadcast(dup))
          .crossJoin(broadcast(med))
          .select(col("n_docs"), col("n_langs"), col("n_sources"),
            col("n_tokens"), col("vocab_size"), col("total_chars"),
            col("mean_chars"), col("median_chars"), col("n_exact_dups"),
            expr("(1000 * n_exact_dups) div n_docs").as("dup_permille"))
      },
      Some("""WITH base AS (SELECT count(*)::BIGINT AS n_docs,
        |    count(DISTINCT lang)::BIGINT AS n_langs,
        |    count(DISTINCT source)::BIGINT AS n_sources,
        |    sum(n_chars)::BIGINT AS total_chars,
        |    (sum(n_chars) // count(*))::BIGINT AS mean_chars
        |  FROM documents),
        |tk AS (SELECT count(*)::BIGINT AS n_tokens,
        |    count(DISTINCT tok)::BIGINT AS vocab_size
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
        |        FROM documents)),
        |dup AS (SELECT sum(c - 1)::BIGINT AS n_exact_dups FROM (
        |    SELECT md5(text) AS h, count(*)::BIGINT AS c
        |    FROM documents GROUP BY 1)),
        |med AS (SELECT n_chars AS median_chars FROM (
        |    SELECT n_chars, row_number() OVER (ORDER BY n_chars)
        |      ::BIGINT AS rk, count(*) OVER ()::BIGINT AS nn
        |    FROM documents) WHERE rk = (nn + 1) // 2)
        |SELECT n_docs, n_langs, n_sources, n_tokens, vocab_size,
        |  total_chars, mean_chars, median_chars, n_exact_dups,
        |  ((1000 * n_exact_dups) // n_docs)::BIGINT AS dup_permille
        |FROM base, tk, dup, med""".stripMargin),
      "One-row dataset card (the datasheet header every corpus release " +
        "needs): document/language/source counts, token and vocabulary " +
        "totals, mean and exact-median length, exact-duplicate mass.  " +
        "Four independent aggregates — each a single scan or one " +
        "(hash)-keyed shuffle — crossed as 1-row broadcasts; nothing " +
        "here gets harder at 100 TB except the scans themselves."),

    // ------------------------------------- token budget planner
    QueryDef(
      "mixture_token_budget_planner",
      (s, d) => {
        val avail = Tables.documents(s, d)
          .select(col("source"),
            size(split(col("text"), " ")).cast("long").as("ntok"))
          .groupBy(col("source")).agg(sum(col("ntok")).as("avail_tokens"))
        // sqrt-temperature weights (alpha = 0.5) via exact IEEE sqrt,
        // largest-remainder allocation of a 1M-token budget
        val weighted = avail
          .withColumn("w_e6",
            floor(sqrt(col("avail_tokens").cast("double")) * 1000)
              .cast("long"))
        val tot = weighted.agg(sum(col("w_e6")).as("wtot"))
        val quota = weighted.crossJoin(broadcast(tot))
          .select(col("source"), col("avail_tokens"), col("w_e6"),
            expr("(1000000 * w_e6) div wtot").as("base_quota"),
            expr("(1000000 * w_e6) % wtot").as("rem"))
        val left = quota.agg(
          (lit(1000000L) - sum(col("base_quota"))).as("leftover"))
        quota.crossJoin(broadcast(left))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("rem").desc, col("source"))).cast("long"))
          .select(col("source"), col("avail_tokens"),
            (col("base_quota") +
              when(col("rk") <= col("leftover"), 1L).otherwise(0L))
              .as("token_quota"))
          .withColumn("epochs_e3",
            expr("(1000 * token_quota) div greatest(avail_tokens, 1)"))
      },
      Some("""WITH avail AS (SELECT source,
        |    sum(len(string_split(text, ' ')))::BIGINT AS avail_tokens
        |  FROM documents GROUP BY source),
        |w AS (SELECT source, avail_tokens,
        |    floor(sqrt(avail_tokens::DOUBLE) * 1000)::BIGINT AS w_e6
        |  FROM avail),
        |tot AS (SELECT sum(w_e6)::BIGINT AS wtot FROM w),
        |quota AS (SELECT source, avail_tokens, w_e6,
        |    ((1000000 * w_e6) // wtot)::BIGINT AS base_quota,
        |    ((1000000 * w_e6) % wtot)::BIGINT AS rem
        |  FROM w, tot),
        |lft AS (SELECT (1000000 - sum(base_quota))::BIGINT AS leftover
        |        FROM quota),
        |rk AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source)
        |         ::BIGINT AS rk FROM quota)
        |SELECT source, avail_tokens,
        |  (base_quota + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)
        |    ::BIGINT AS token_quota,
        |  ((1000 * (base_quota + CASE WHEN rk <= leftover THEN 1 ELSE 0
        |     END)) // greatest(avail_tokens, 1))::BIGINT AS epochs_e3
        |FROM rk, lft""".stripMargin),
      "Training-mixture token budget plan: sqrt-temperature source " +
        "weights (alpha = 0.5, exact via correctly-rounded IEEE sqrt) " +
        "allocated over a 1M-token budget by largest remainder — " +
        "quotas sum EXACTLY to the budget, no float drift.  epochs_e3 " +
        "> 1000 flags sources the plan would over-sample (repeat " +
        "epochs), the known quality risk of temperature flattening.  " +
        "This is neyman_allocation's sibling with the training-mixture " +
        "objective instead of the survey-variance one."),

    // -------------------------------------------- curation funnel
    QueryDef(
      "pipeline_stage_funnel",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("text"), col("lang"), col("n_chars"),
            size(split(col("text"), " ")).cast("long").as("ntok"))
          .withColumn("h", md5(col("text")))
        val flags = docs
          .withColumn("keep_len",
            (col("n_chars") >= 100 && col("n_chars") <= 2000)
              .cast("long"))
          .withColumn("keep_lang", col("lang").isin("en", "de", "fr")
            .cast("long"))
          .withColumn("keep_wlen",
            (expr("n_chars div greatest(ntok, 1)").between(3, 12))
              .cast("long"))
          .withColumn("keep_dedup",
            (row_number().over(Window.partitionBy(col("h"))
              .orderBy(col("doc_id"))) === 1).cast("long"))
        val staged = flags.select(col("doc_id"),
          col("keep_len").as("s1"),
          (col("keep_len") * col("keep_lang")).as("s2"),
          (col("keep_len") * col("keep_lang") * col("keep_wlen"))
            .as("s3"),
          (col("keep_len") * col("keep_lang") * col("keep_wlen") *
            col("keep_dedup")).as("s4"))
        val tot = staged.agg(count(lit(1)).as("n0"), sum(col("s1")).as("n1"),
          sum(col("s2")).as("n2"), sum(col("s3")).as("n3"),
          sum(col("s4")).as("n4"))
        tot.selectExpr(
          """stack(4,
            |  'length_gate', n0, n1,
            |  'lang_gate', n1, n2,
            |  'word_len_gate', n2, n3,
            |  'exact_dedup', n3, n4) as (stage, n_in, n_out)""".stripMargin)
          .withColumn("dropped", col("n_in") - col("n_out"))
          .withColumn("drop_permille",
            expr("(1000 * (n_in - n_out)) div greatest(n_in, 1)"))
      },
      Some("""WITH flags AS (SELECT doc_id,
        |    CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 1 ELSE 0 END
        |      AS k1,
        |    CASE WHEN lang IN ('en','de','fr') THEN 1 ELSE 0 END AS k2,
        |    CASE WHEN (n_chars // greatest(len(string_split(text, ' ')),
        |         1)) BETWEEN 3 AND 12 THEN 1 ELSE 0 END AS k3,
        |    CASE WHEN row_number() OVER (PARTITION BY md5(text)
        |         ORDER BY doc_id) = 1 THEN 1 ELSE 0 END AS k4
        |  FROM documents),
        |tot AS (SELECT count(*)::BIGINT AS n0,
        |    sum(k1)::BIGINT AS n1,
        |    sum(k1 * k2)::BIGINT AS n2,
        |    sum(k1 * k2 * k3)::BIGINT AS n3,
        |    sum(k1 * k2 * k3 * k4)::BIGINT AS n4
        |  FROM flags),
        |st AS (SELECT 'length_gate' AS stage, n0 AS n_in, n1 AS n_out
        |         FROM tot
        |  UNION ALL SELECT 'lang_gate', n1, n2 FROM tot
        |  UNION ALL SELECT 'word_len_gate', n2, n3 FROM tot
        |  UNION ALL SELECT 'exact_dedup', n3, n4 FROM tot)
        |SELECT stage, n_in, n_out, (n_in - n_out)::BIGINT AS dropped,
        |  ((1000 * (n_in - n_out)) // greatest(n_in, 1))::BIGINT
        |    AS drop_permille
        |FROM st""".stripMargin),
      "Curation funnel attribution: documents surviving each gate in " +
        "sequence (length -> language -> mean-word-length -> exact " +
        "dedup), as a stage table with per-stage drop rates.  The " +
        "composed-flag formulation computes every stage in ONE scan + " +
        "one dedup window instead of materializing intermediate " +
        "corpora — the funnel report that explains where a 100 TB " +
        "crawl's mass actually went (and the sanity check that no gate " +
        "silently dropped everything)."),

    // ------------------------------------- gate agreement (kappa)
    QueryDef(
      "gate_agreement_kappa",
      (s, d) => {
        val verdicts = Tables.documents(s, d)
          .select(
            (col("n_chars").between(150, 1500)).cast("long").as("a"),
            (expr("n_chars div greatest(size(split(text, ' ')), 1)")
              .between(4, 9)).cast("long").as("b"))
        verdicts.agg(count(lit(1)).as("n"),
          sum(when(col("a") === 1 && col("b") === 1, 1L).otherwise(0L))
            .as("n11"),
          sum(when(col("a") === 1 && col("b") === 0, 1L).otherwise(0L))
            .as("n10"),
          sum(when(col("a") === 0 && col("b") === 1, 1L).otherwise(0L))
            .as("n01"),
          sum(when(col("a") === 0 && col("b") === 0, 1L).otherwise(0L))
            .as("n00"))
          .withColumn("agree_permille",
            expr("(1000 * (n11 + n00)) div n"))
          .withColumn("kappa_e3", expr(
            """(1000 * (n * (n11 + n00)
              |  - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))))
              |div (n * n
              |  - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))"""
              .stripMargin))
      },
      Some("""WITH v AS (SELECT
        |    CASE WHEN n_chars BETWEEN 150 AND 1500 THEN 1 ELSE 0 END
        |      AS a,
        |    CASE WHEN (n_chars // greatest(len(string_split(text, ' ')),
        |         1)) BETWEEN 4 AND 9 THEN 1 ELSE 0 END AS b
        |  FROM documents),
        |ct AS (SELECT count(*)::BIGINT AS n,
        |    sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)::BIGINT
        |      AS n11,
        |    sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)::BIGINT
        |      AS n10,
        |    sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)::BIGINT
        |      AS n01,
        |    sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END)::BIGINT
        |      AS n00
        |  FROM v)
        |SELECT n, n11, n10, n01, n00,
        |  ((1000 * (n11 + n00)) // n)::BIGINT AS agree_permille,
        |  ((1000 * (n * (n11 + n00)
        |     - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))))
        |   // (n * n
        |     - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))))
        |    ::BIGINT AS kappa_e3
        |FROM ct""".stripMargin),
      "Cohen's kappa between two independent quality gates (length-" +
        "range vs mean-word-length), computed exactly as cross-" +
        "multiplied integers: kappa = (n*agree - expected) / (n^2 - " +
        "expected) with expected = sum of marginal products.  Raw " +
        "agreement flatters gates that both pass almost everything; " +
        "kappa corrects for that chance floor — the difference between " +
        "'our gates agree 95%' and 'our gates are redundant'.  One " +
        "scan, 2x2 state."),
  )
}
