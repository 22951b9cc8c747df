package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.{QueryDef, Tables}

/** Batch 59: a REAL n-gram language model — train bigram counts on the
  * corpus's own train split, score held-out documents with stupid
  * backoff, and gate on the scores — replacing the engine's
  * md5-pseudo-scorer convention (curation2.scala:176
  * `perplexity_filter_stub`) with an actually-trained scorer, the way
  * CCNet (Wenzek et al. 2020) ranks Common Crawl by KenLM perplexity
  * and Gopher/RefinedWeb carry LM-quality buckets through curation.
  *
  * Stupid backoff (Brants et al. 2007, "Large Language Models in
  * Machine Translation") is THE web-scale choice here precisely
  * because it is count-shaped: S(w2|w1) = c(w1 w2)/c(w1) when the
  * bigram was seen, else 0.4 * c(w2)/N — no discounting, no
  * normalization pass, so training is exactly two groupBy-counts and
  * the model is a pair of tables.  That is what makes it a *Spark*
  * LM: the model is data, training is aggregation, scoring is a join.
  *
  * Everything is integer fixed point (e6 probabilities via bigint
  * `div`, the repo determinism convention), so the DuckDB oracle
  * reproduces scores bit for bit: no log, no float, no platform
  * drift.  Scale shape: unigram/bigram count exchanges are bounded by
  * vocabulary (not corpus) size thanks to map-side partials; scoring
  * is one equi-join of the exploded held-out bigram stream against
  * the model table — AQE broadcasts the model when it fits (it does
  * here and for any <~1 GB vocab) and falls back to a shuffle join
  * keyed on (w1,w2) when a 100 TB-corpus vocabulary doesn't, which is
  * the correct degradation.  No windows, no driver-side state.
  *
  * Split convention: train = doc_id % 10 < 8, held-out = the rest
  * (id-keyed, deterministic, the split_leakage_check convention).
  */
object Curation59Queries {

  /** tokens of `text`, empties dropped (repo tokenization convention) */
  private val toksCol: Column =
    expr("filter(split(text, ' '), w -> length(w) > 0)")

  /** (doc_id, w1, w2) bigram stream of a docs frame; docs with fewer
    * than 2 tokens contribute nothing (guarded BEFORE sequence() so
    * Spark's descending-sequence footgun never fires). */
  private def bigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), toksCol.as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"), col("source"), explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> struct(element_at(toks, i) as w1, " +
          "element_at(toks, i + 1) as w2))")).as("b"))
      .select(col("doc_id"), col("source"),
        col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** unigram counts (w, cu) over the train split */
  private def unigrams(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .where(pmod(col("doc_id"), lit(10)) < 8)
      .select(explode(toksCol).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))

  /** bigram counts (w1, w2, cb) over the train split */
  private def bigramCounts(s: SparkSession, d: String): DataFrame =
    bigrams(Tables.documents(s, d).where(pmod(col("doc_id"), lit(10)) < 8))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))

  /** per-held-out-doc stupid-backoff score frame:
    * (doc_id, source, n_bigrams, n_backoff, avg_p_e6) */
  private def heldoutScores(s: SparkSession, d: String): DataFrame = {
    // The unigram model feeds THREE consumers below (the w1 context
    // join, the w2 backoff join, and the N total) — without persist
    // each one re-scans and re-tokenizes the train split.  The table
    // is vocab-bounded (model-sized, not corpus-sized), so caching it
    // is safe at any corpus scale; the caller releases it via the
    // QueryDef clearCache contract (core.scala).  The two remaining
    // corpus passes (unigram agg, bigram agg) are deliberate: at
    // 100 TB re-scanning the train split twice beats caching a
    // corpus-sized token stream.
    val uni = unigrams(s, d).persist()
    // N (total train tokens) is one scalar; a 1-row broadcast join
    // keeps it distributed-safe (no driver round trip in the plan)
    val tot = uni.agg(sum(col("cu")).as("n_total"))
    val heldout =
      bigrams(Tables.documents(s, d).where(pmod(col("doc_id"), lit(10)) >= 8))
    heldout
      .join(bigramCounts(s, d), Seq("w1", "w2"), "left")
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("cu", "cu1"),
        Seq("w1"), "left")
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("cu", "cu2"),
        Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      // seen bigram: c(w1 w2)/c(w1); else back off to 0.4*c(w2)/N
      // (0.4 exactly as 2/5); unseen w2 scores 0 — all e6 bigint div
      .withColumn("p_e6", expr(
        "case when cb is not null then (cb * 1000000L) div cu1 " +
          "when cu2 is not null then (2L * cu2 * 1000000L) div (5L * n_total) " +
          "else 0L end"))
      .withColumn("backoff", expr("case when cb is null then 1L else 0L end"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("backoff")).as("n_backoff"),
        expr("sum(p_e6) div count(1)").as("avg_p_e6"))
  }

  /** DuckDB mirrors of the shared CTEs (train split, tokens, bigrams) */
  private val oracleCtes: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS t
      |  FROM documents),
      |uni AS (
      |  SELECT w, count(*)::BIGINT AS cu FROM (
      |    SELECT unnest(t) AS w FROM toks WHERE doc_id % 10 < 8)
      |  GROUP BY w),
      |tot AS (SELECT sum(cu)::BIGINT AS n_total FROM uni),
      |train_big AS (
      |  SELECT t[i] AS w1, t[i + 1] AS w2, count(*)::BIGINT AS cb
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) r
      |  WHERE doc_id % 10 < 8 GROUP BY 1, 2),
      |held_big AS (
      |  SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) r
      |  WHERE doc_id % 10 >= 8),
      |scored AS (
      |  SELECT h.doc_id, h.source,
      |    CASE WHEN b.cb IS NOT NULL THEN (b.cb * 1000000) // u1.cu
      |         WHEN u2.cu IS NOT NULL
      |           THEN (2 * u2.cu * 1000000) // (5 * t.n_total)
      |         ELSE 0 END AS p_e6,
      |    CASE WHEN b.cb IS NULL THEN 1 ELSE 0 END AS backoff
      |  FROM held_big h
      |  LEFT JOIN train_big b ON b.w1 = h.w1 AND b.w2 = h.w2
      |  LEFT JOIN uni u1 ON u1.w = h.w1
      |  LEFT JOIN uni u2 ON u2.w = h.w2
      |  CROSS JOIN tot t),
      |doc_scores AS (
      |  SELECT doc_id, source, count(*)::BIGINT AS n_bigrams,
      |    sum(backoff)::BIGINT AS n_backoff,
      |    (sum(p_e6) // count(*))::BIGINT AS avg_p_e6
      |  FROM scored GROUP BY 1, 2)
      |""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------- the trained model table
    QueryDef(
      "bigram_lm_probs",
      (s, d) => {
        val uni = unigrams(s, d)
          .withColumnRenamed("w", "w1").withColumnRenamed("cu", "c_ctx")
        bigramCounts(s, d)
          .join(uni, Seq("w1"))
          .withColumn("p_e6", expr("(cb * 1000000L) div c_ctx"))
          .orderBy(col("cb").desc, col("w1"), col("w2"))
          .limit(50)
          .select(col("w1"), col("w2"), col("cb"), col("c_ctx"), col("p_e6"))
      },
      Some(oracleCtes +
        """SELECT b.w1, b.w2, b.cb, u.cu AS c_ctx,
          |  ((b.cb * 1000000) // u.cu)::BIGINT AS p_e6
          |FROM train_big b JOIN uni u ON u.w = b.w1
          |ORDER BY b.cb DESC, b.w1, b.w2 LIMIT 50""".stripMargin),
      "The trained bigram model itself, as a table: the 50 most " +
        "frequent train-split bigrams with their context counts and " +
        "e6 conditional probabilities c(w1 w2)/c(w1).  Training a " +
        "stupid-backoff LM IS aggregation — two groupBy-counts whose " +
        "exchanges are bounded by vocabulary size via map-side " +
        "partials, never by corpus size — which is why this is the " +
        "LM family that fits a 100 TB engine (Brants et al. 2007 " +
        "trained on 2T tokens exactly this way).  Top-50 with full " +
        "deterministic tiebreak keeps the output bounded at any scale."),

    // ---------------------------------------- held-out document scoring
    QueryDef(
      "bigram_backoff_score",
      (s, d) => heldoutScores(s, d)
        .select(col("doc_id"), col("n_bigrams"), col("n_backoff"),
          col("avg_p_e6"))
        .orderBy(col("doc_id")),
      Some(oracleCtes +
        """SELECT doc_id, n_bigrams, n_backoff, avg_p_e6
          |FROM doc_scores ORDER BY doc_id""".stripMargin),
      "CCNet-style LM quality scoring with a real trained model: " +
        "every held-out document's mean stupid-backoff bigram " +
        "probability (e6), plus how many of its bigrams needed the " +
        "0.4 * c(w2)/N backoff path.  Scoring is one left equi-join " +
        "of the exploded bigram stream against the model table — AQE " +
        "broadcasts a small model and degrades to a (w1,w2)-keyed " +
        "shuffle join for a web-scale vocabulary — then a per-doc " +
        "aggregate.  Integer e6 arithmetic end to end, so the DuckDB " +
        "oracle matches bit for bit with no float/log drift."),

    // ------------------------------------------------- the quality gate
    QueryDef(
      "lm_score_quality_gate",
      (s, d) => {
        // per-doc score table feeds both the per-source mean and the
        // gate join; materialize once so the whole train+score bigram
        // pipeline doesn't re-run per reference (doc-cardinality
        // frame, NARROW — (doc_id, source, avg_p_e6), not the corpus
        // text).  Re-measured r15 at sf0.1/local[32]: WITH checkpoint
        // 0.94-0.96 s, without 1.00-1.06 s, scratch-parquet swap
        // 1.62-1.83 s — the eager checkpoint is the fastest form and
        // the frame is rows-not-text sized, so it stays.
        val scores = heldoutScores(s, d).localCheckpoint(true)
        val perSource = scores.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            expr("sum(avg_p_e6) div count(1)").as("mean_e6"))
        scores.join(broadcast(perSource), Seq("source"))
          .withColumn("flagged",
            expr("case when 2L * avg_p_e6 < mean_e6 then 1L else 0L end"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("flagged")).as("n_flagged"),
            max(col("mean_e6")).as("mean_e6"))
          .orderBy(col("source"))
      },
      Some(oracleCtes +
        """, src AS (
          |  SELECT source, count(*)::BIGINT AS n_docs,
          |    (sum(avg_p_e6) // count(*))::BIGINT AS mean_e6
          |  FROM doc_scores GROUP BY source)
          |SELECT s.source, s.n_docs,
          |  sum(CASE WHEN 2 * d.avg_p_e6 < s.mean_e6
          |      THEN 1 ELSE 0 END)::BIGINT AS n_flagged,
          |  s.mean_e6
          |FROM doc_scores d JOIN src s ON s.source = d.source
          |GROUP BY s.source, s.n_docs, s.mean_e6
          |ORDER BY s.source""".stripMargin),
      "The gate the scores exist for: per source, how many held-out " +
        "documents score below half their source's mean LM score — " +
        "the relative-threshold form CCNet uses (per-bucket " +
        "percentiles) rather than one corpus-global cutoff, so a " +
        "boilerplate-heavy source doesn't mask low-quality text in a " +
        "clean one.  The per-source mean is a source-cardinality " +
        "aggregate broadcast back against the scores; everything " +
        "downstream of the scoring join is enum-bounded.")
  )
}
