package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Round-4 continuation batch 15: masked-LM data planning, the pass@k
  * estimator, and a mergeable histogram quantile sketch.
  *
  * The masking planners are the deterministic cluster-scale form of the
  * per-record `random` calls the reference uses for sampling
  * (data_generation/generate_narratives_from_data.py:39-40): the mask
  * decision is a pure function of (doc_id, position) via md5, so any
  * executor recomputes the same plan — no RNG state to coordinate, and
  * re-runs are reproducible, which is what makes masked-corpus builds
  * restartable at 100 TB.
  */
object Curation21Queries {

  /** (doc_id, pos, tok) with 0-based positions, plus the md5 decision
    * nibbles — shared substrate of both masking planners. */
  private def tokenNibbles(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        substring(md5(concat_ws(":", col("doc_id"), col("pos"))), 1, 1)
          .as("c1"),
        substring(md5(concat_ws(":", col("doc_id"), col("pos"))), 2, 1)
          .as("c2"))

  private val tokenNibblesSql =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |nib AS (SELECT doc_id, i.i AS pos,
      |    substr(md5(doc_id::VARCHAR || ':' || i.i::VARCHAR), 1, 1) AS c1,
      |    substr(md5(doc_id::VARCHAR || ':' || i.i::VARCHAR), 2, 1) AS c2
      |  FROM toks, (SELECT range AS i FROM range(0, 4096)) i
      |  WHERE i.i < len(t))""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------- MLM mask plan
    QueryDef(
      "mlm_mask_plan",
      (s, d) => {
        val masked = col("c1").isin("0", "1")
        tokenNibbles(s, d)
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_tokens"),
            sum(when(masked, 1L).otherwise(0L)).as("n_masked"),
            sum(when(masked && !col("c2").isin("d", "e", "f"), 1L)
              .otherwise(0L)).as("n_mask_tok"),
            sum(when(masked && col("c2") === "d", 1L).otherwise(0L))
              .as("n_random"),
            sum(when(masked && col("c2").isin("e", "f"), 1L).otherwise(0L))
              .as("n_keep"))
          .withColumn("masked_permille",
            expr("(1000 * n_masked) div n_tokens"))
      },
      Some(s"""WITH $tokenNibblesSql,
        |agg AS (SELECT doc_id,
        |    count(*)::BIGINT AS n_tokens,
        |    sum(CASE WHEN c1 IN ('0','1') THEN 1 ELSE 0 END)::BIGINT
        |      AS n_masked,
        |    sum(CASE WHEN c1 IN ('0','1')
        |             AND c2 NOT IN ('d','e','f') THEN 1 ELSE 0 END)::BIGINT
        |      AS n_mask_tok,
        |    sum(CASE WHEN c1 IN ('0','1') AND c2 = 'd'
        |             THEN 1 ELSE 0 END)::BIGINT AS n_random,
        |    sum(CASE WHEN c1 IN ('0','1') AND c2 IN ('e','f')
        |             THEN 1 ELSE 0 END)::BIGINT AS n_keep
        |  FROM nib GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_masked, n_mask_tok, n_random, n_keep,
        |       (1000 * n_masked) // n_tokens AS masked_permille
        |FROM agg""".stripMargin),
      "BERT-style masking plan: each (doc, position) is masked iff its " +
        "md5 nibble falls in a 2/16 band (12.5% rate on the hex grid), " +
        "and masked positions split 13/1/2 (~81/6/13%) into " +
        "mask-token/random/keep via the second nibble — the 80/10/10 " +
        "recipe on deterministic hash randomness. A pure function of " +
        "(doc_id, pos): executors recompute identical plans, no RNG " +
        "state, restartable and seed-stable at any parallelism. One " +
        "narrow groupBy per doc; the explode never leaves the " +
        "partition."),

    // ------------------------------------------- span corruption plan
    QueryDef(
      "span_corruption_plan",
      (s, d) => {
        val w2 = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rowsBetween(-2, 0)
        val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rowsBetween(-2, -1)
        tokenNibbles(s, d)
          .withColumn("is_start",
            when(col("c1") === "0", 1L).otherwise(0L))
          .withColumn("in_span",
            when(max(col("is_start")).over(w2) === 1L, 1L).otherwise(0L))
          .withColumn("new_span",
            when(col("is_start") === 1L &&
              coalesce(max(col("is_start")).over(wPrev), lit(0L)) === 0L,
              1L).otherwise(0L))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(col("is_start")).as("n_starts"),
            sum(col("new_span")).as("n_spans"),
            sum(col("in_span")).as("n_masked"))
          .withColumn("corrupt_permille",
            expr("(1000 * n_masked) div n_tokens"))
      },
      Some(s"""WITH $tokenNibblesSql,
        |marks AS (SELECT doc_id, pos,
        |    CASE WHEN c1 = '0' THEN 1 ELSE 0 END AS is_start
        |  FROM nib),
        |spans AS (SELECT doc_id, is_start,
        |    CASE WHEN max(is_start) OVER (PARTITION BY doc_id ORDER BY pos
        |           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) = 1
        |         THEN 1 ELSE 0 END AS in_span,
        |    CASE WHEN is_start = 1 AND coalesce(max(is_start)
        |           OVER (PARTITION BY doc_id ORDER BY pos
        |             ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING), 0) = 0
        |         THEN 1 ELSE 0 END AS new_span
        |  FROM marks),
        |agg AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |    sum(is_start)::BIGINT AS n_starts,
        |    sum(new_span)::BIGINT AS n_spans,
        |    sum(in_span)::BIGINT AS n_masked
        |  FROM spans GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_starts, n_spans, n_masked,
        |       (1000 * n_masked) // n_tokens AS corrupt_permille
        |FROM agg""".stripMargin),
      "T5-style span corruption plan: hash-chosen start positions " +
        "(1/16 rate) each corrupt a 3-token span; overlapping spans " +
        "merge. Coverage and merged-span counts come from two bounded " +
        "row-frame windows (3 rows of state), partitioned by doc — no " +
        "cross-document traffic, so the plan scales as a pure map over " +
        "the token stream after one per-doc sort."),

    // ------------------------------------------------------- pass@k
    QueryDef(
      "pass_at_k",
      (s, d) => {
        def perm5(x: org.apache.spark.sql.Column) =
          when(x >= 5, x * (x - 1) * (x - 2) * (x - 3) * (x - 4))
            .otherwise(lit(0L))
        Tables.documents(s, d)
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("n_chars") >= 300, 1L).otherwise(0L)).as("c"))
          .filter(col("n") >= 5)
          .select(col("lang"), col("source"), col("n"), col("c"),
            expr("(c * 1000000) div n").as("pass1_e6"),
            (lit(1000000L) - when(perm5(col("n") - col("c")) === 0, lit(0L))
              .otherwise(expr("((n-c) * (n-c-1) * (n-c-2) * (n-c-3) * " +
                "(n-c-4) * 1000000) div (n * (n-1) * (n-2) * (n-3) * " +
                "(n-4))"))).as("pass5_e6"))
      },
      Some("""WITH cells AS (
        |  SELECT lang, source, count(*)::BIGINT AS n,
        |    sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)::BIGINT AS c
        |  FROM documents GROUP BY lang, source),
        |f AS (SELECT * FROM cells WHERE n >= 5)
        |SELECT lang, source, n, c,
        |  (c * 1000000) // n AS pass1_e6,
        |  (1000000 - CASE WHEN n - c >= 5
        |    THEN ((n-c) * (n-c-1) * (n-c-2) * (n-c-3) * (n-c-4)
        |          * 1000000) // (n * (n-1) * (n-2) * (n-3) * (n-4))
        |    ELSE 0 END)::BIGINT AS pass5_e6
        |FROM f""".stripMargin),
      "pass@k estimator (Codex/HumanEval): per (lang, source) task " +
        "cell with n samples and c passes, pass@5 = 1 - C(n-c,5)/C(n,5) " +
        "computed as an exact falling-factorial ratio — integer " +
        "numerators, one IEEE division, floor — and pass@1 = c/n at " +
        "e6. Cells with n-c < 5 are exactly 1 (every 5-subset contains " +
        "a pass). A single partial-aggregatable groupBy; the metric " +
        "table is cells-sized regardless of corpus scale."),

    // ----------------------------------- histogram quantile sketch
    QueryDef(
      "quantile_sketch_merge",
      (s, d) => {
        import s.implicits._
        val width = 16L
        val hist = Tables.documents(s, d)
          .groupBy((col("n_chars") / width).cast("long").as("bucket"))
          .agg(count(lit(1)).as("cnt"))
        val wc = Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val cum = hist.withColumn("cum", sum(col("cnt")).over(wc))
          .withColumn("cum_prev", col("cum") - col("cnt"))
        val n = Tables.documents(s, d).agg(count(lit(1)).as("n"))
        val targets = Seq(50L, 90L, 99L).toDF("p")
          .crossJoin(n)
          .withColumn("target", expr("(p * n + 99) div 100"))
        val est = targets.join(cum,
            col("cum") >= col("target") && col("cum_prev") < col("target"))
          .select(col("p"), col("target"),
            (col("bucket") * width +
              expr(s"((target - cum_prev) * $width) div cnt")).as("est"))
        // exact-rank side via ScalableIndex (range partition + offsets),
        // not a global row_number window over the corpus
        val exact = graft.operators.ScalableIndex.withDenseIndex(
          Tables.documents(s, d).select(col("n_chars"), col("doc_id")),
          Seq(col("n_chars"), col("doc_id")), 8, "idx")
          .select(col("n_chars"), (col("idx") + 1L).as("rk"))
        est.join(exact, col("rk") === col("target"))
          .select(col("p"), col("target"), col("n_chars").as("exact"),
            col("est"), (col("est") - col("n_chars")).as("err"),
            lit(width).as("bin_width"))
      },
      Some("""WITH hist AS (
        |  SELECT n_chars // 16 AS bucket, count(*)::BIGINT AS cnt
        |  FROM documents GROUP BY 1),
        |cum AS (SELECT bucket, cnt,
        |    CAST(sum(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER (ORDER BY bucket) - cnt AS BIGINT)
        |      AS cum_prev
        |  FROM hist),
        |t AS (SELECT p, ((p * n + 99) // 100)::BIGINT AS target
        |      FROM (VALUES (50), (90), (99)) v(p),
        |           (SELECT count(*)::BIGINT AS n FROM documents)),
        |est AS (SELECT p, target,
        |    (bucket * 16 + ((target - cum_prev) * 16) // cnt)::BIGINT
        |      AS est
        |  FROM t JOIN cum ON cum >= target AND cum_prev < target),
        |exact AS (SELECT n_chars,
        |    row_number() OVER (ORDER BY n_chars, doc_id)::BIGINT AS rk
        |  FROM documents)
        |SELECT p::BIGINT AS p, target, n_chars AS exact, est,
        |       (est - n_chars)::BIGINT AS err, 16::BIGINT AS bin_width
        |FROM est JOIN exact ON rk = target""".stripMargin),
      "Mergeable quantile sketch: a fixed-width histogram (width-16 " +
        "bins over the known length domain) estimates p50/p90/p99 by " +
        "linear interpolation inside the covering bin, checked against " +
        "the exact order statistic — |err| < bin_width by construction, " +
        "and that bound is part of the emitted row. The histogram is a " +
        "partial-aggregatable groupBy (executors merge bucket counts " +
        "exactly like t-digest centroids but deterministically), which " +
        "is the 100 TB substitute for the exact global sort the `exact` " +
        "column uses — at scale only the sketch side runs, and extra " +
        "accuracy is a narrower literal width, not more shuffles."),
  )
}
