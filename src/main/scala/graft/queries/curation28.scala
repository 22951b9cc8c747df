package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 22: lexical profiling and dedup-parameter engineering — the
  * measurements that decide MinHash banding, dedup thresholds, and
  * which corpora read like which (stylometry) before any expensive
  * pass runs at 100 TB.
  */
object Curation28Queries {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------ type-token ratio
    QueryDef(
      "type_token_ratio",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val perTok = toks.groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("c"))
        perTok.groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n_tokens"),
            count(lit(1)).as("n_types"),
            sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
          .select(col("doc_id"), col("n_tokens"), col("n_types"),
            col("n_hapax"),
            expr("(1000 * n_types) div n_tokens").as("ttr_permille"),
            expr("(1000 * n_hapax) div n_types").as("hapax_permille"))
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' '))
        |        AS tok FROM documents),
        |pt AS (SELECT doc_id, tok, count(*)::BIGINT AS c
        |       FROM toks GROUP BY 1, 2)
        |SELECT doc_id, sum(c)::BIGINT AS n_tokens,
        |  count(*)::BIGINT AS n_types,
        |  sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
        |  ((1000 * count(*)) // sum(c))::BIGINT AS ttr_permille,
        |  ((1000 * sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)) //
        |    count(*))::BIGINT AS hapax_permille
        |FROM pt GROUP BY doc_id""".stripMargin),
      "Per-document lexical diversity: type-token ratio and hapax-" +
        "legomenon share.  Machine-generated or templated text sits at " +
        "the extremes (low TTR = repetition loops, implausibly high " +
        "TTR+hapax = token-salad), so both tails feed the quality gate " +
        "alongside gopher_quality_filter.  One shuffle keyed by " +
        "(doc, token) — token multiplicity never leaves its document."),

    // ------------------------------------------ stylometric source map
    QueryDef(
      "stylometry_source_distance",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("ct"))
          .orderBy(col("ct").desc, col("tok")).limit(20)
          .select(col("tok"))
        val counts = toks.join(broadcast(top), Seq("tok"))
          .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
        val grid = toks.select(col("source")).distinct()
          .crossJoin(broadcast(top))
        val prof = grid.join(counts, Seq("source", "tok"), "left")
          .select(col("source"), col("tok"),
            coalesce(col("c"), lit(0L)).as("c"))
          .withColumn("ctot",
            sum(col("c")).over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("source"))))
          .select(col("source"), col("tok"),
            expr("(1000 * c) div ctot").as("pm"))
        prof.as("p1")
          .join(prof.as("p2"), col("p1.tok") === col("p2.tok") &&
            col("p1.source") < col("p2.source"))
          .groupBy(col("p1.source").as("source_a"),
            col("p2.source").as("source_b"))
          .agg(sum(abs(col("p1.pm") - col("p2.pm"))).as("l1_permille"))
      },
      Some("""WITH toks AS (SELECT source, unnest(string_split(text, ' '))
        |        AS tok FROM documents),
        |top AS (SELECT tok FROM (SELECT tok, count(*) AS ct FROM toks
        |        GROUP BY tok ORDER BY ct DESC, tok LIMIT 20)),
        |counts AS (SELECT source, tok, count(*)::BIGINT AS c
        |  FROM toks JOIN top USING (tok) GROUP BY 1, 2),
        |grid AS (SELECT s.source, t.tok
        |  FROM (SELECT DISTINCT source FROM toks) s CROSS JOIN top t),
        |prof AS (SELECT g.source, g.tok,
        |    ((1000 * coalesce(c.c, 0)) //
        |      sum(coalesce(c.c, 0)) OVER (PARTITION BY g.source))::BIGINT
        |      AS pm
        |  FROM grid g LEFT JOIN counts c
        |    ON c.source = g.source AND c.tok = g.tok)
        |SELECT p1.source AS source_a, p2.source AS source_b,
        |  sum(abs(p1.pm - p2.pm))::BIGINT AS l1_permille
        |FROM prof p1 JOIN prof p2
        |  ON p2.tok = p1.tok AND p1.source < p2.source
        |GROUP BY 1, 2""".stripMargin),
      "Stylometric distance matrix between sources: permille profiles " +
        "over the corpus's 20 most frequent words (the function-word " +
        "band — topic-independent, style-bearing), compared pairwise by " +
        "L1.  Near-zero distance between two 'different' sources is the " +
        "classic sign of one crawler behind two labels (duplicate-" +
        "provenance detection at the corpus level).  The profile table " +
        "is sources x 20 — the pairwise stage never touches documents."),

    // -------------------------------------------- MinHash band tuning
    QueryDef(
      "minhash_band_tuning",
      (s, d) => {
        // configs (bands, rows) with b*r <= 64; s grid 50..950 permille.
        // Spark side reads zero tables: the curve is pure arithmetic,
        // but it must match DuckDB bit-for-bit, so every power is the
        // same floor-e6 squaring chain on both engines.
        val grid = s.range(1)
          .selectExpr(
            "explode(array(named_struct('b', 32L, 'r', 2L)," +
              " named_struct('b', 16L, 'r', 4L)," +
              " named_struct('b', 8L, 'r', 8L)," +
              " named_struct('b', 4L, 'r', 16L))) AS cfg")
          .select(col("cfg.b").as("bands"), col("cfg.r").as("rows_per_band"))
          .crossJoin(
            s.range(1).select(explode(expr(
              "sequence(50L, 950L, 50L)")).as("s_permille")))
        grid
          .withColumn("s1", col("s_permille") * 1000L)
          .withColumn("s2", expr("(s1 * s1) div 1000000"))
          .withColumn("s4", expr("(s2 * s2) div 1000000"))
          .withColumn("s8", expr("(s4 * s4) div 1000000"))
          .withColumn("s16", expr("(s8 * s8) div 1000000"))
          .withColumn("sr", expr(
            """CASE rows_per_band WHEN 2 THEN s2 WHEN 4 THEN s4
              |WHEN 8 THEN s8 ELSE s16 END""".stripMargin))
          .withColumn("q1", lit(1000000L) - col("sr"))
          .withColumn("q2", expr("(q1 * q1) div 1000000"))
          .withColumn("q4", expr("(q2 * q2) div 1000000"))
          .withColumn("q8", expr("(q4 * q4) div 1000000"))
          .withColumn("q16", expr("(q8 * q8) div 1000000"))
          .withColumn("q32", expr("(q16 * q16) div 1000000"))
          .withColumn("p_e6", lit(1000000L) - expr(
            """CASE bands WHEN 2 THEN q2 WHEN 4 THEN q4 WHEN 8 THEN q8
              |WHEN 16 THEN q16 ELSE q32 END""".stripMargin))
          .select(col("bands"), col("rows_per_band"), col("s_permille"),
            col("p_e6"))
      },
      Some("""WITH cfg(bands, rows_per_band) AS
        |  (VALUES (32::BIGINT, 2::BIGINT), (16, 4), (8, 8), (4, 16)),
        |sg AS (SELECT (range * 50)::BIGINT AS s_permille
        |       FROM range(1, 20)),
        |base AS (SELECT bands, rows_per_band, s_permille,
        |    (s_permille * 1000)::BIGINT AS s1
        |  FROM cfg CROSS JOIN sg),
        |pw AS (SELECT *, ((s1 * s1) // 1000000)::BIGINT AS s2 FROM base),
        |pw2 AS (SELECT *, ((s2 * s2) // 1000000)::BIGINT AS s4 FROM pw),
        |pw3 AS (SELECT *, ((s4 * s4) // 1000000)::BIGINT AS s8 FROM pw2),
        |pw4 AS (SELECT *, ((s8 * s8) // 1000000)::BIGINT AS s16 FROM pw3),
        |sr AS (SELECT bands, rows_per_band, s_permille,
        |    (1000000 - CASE rows_per_band WHEN 2 THEN s2 WHEN 4 THEN s4
        |       WHEN 8 THEN s8 ELSE s16 END)::BIGINT AS q1
        |  FROM pw4),
        |qw AS (SELECT *, ((q1 * q1) // 1000000)::BIGINT AS q2 FROM sr),
        |qw2 AS (SELECT *, ((q2 * q2) // 1000000)::BIGINT AS q4 FROM qw),
        |qw3 AS (SELECT *, ((q4 * q4) // 1000000)::BIGINT AS q8 FROM qw2),
        |qw4 AS (SELECT *, ((q8 * q8) // 1000000)::BIGINT AS q16 FROM qw3),
        |qw5 AS (SELECT *, ((q16 * q16) // 1000000)::BIGINT AS q32 FROM qw4)
        |SELECT bands, rows_per_band, s_permille,
        |  (1000000 - CASE bands WHEN 2 THEN q2 WHEN 4 THEN q4
        |     WHEN 8 THEN q8 WHEN 16 THEN q16 ELSE q32 END)::BIGINT AS p_e6
        |FROM qw5""".stripMargin),
      "MinHash-LSH banding design curve: detection probability " +
        "p = 1 - (1 - s^r)^b for every (bands, rows) split of a 64-hash " +
        "signature across a Jaccard grid, in exact e6 fixed point " +
        "(floor-squaring chains, so both engines and the spec replay " +
        "agree bit-for-bit).  This is the table you read BEFORE running " +
        "dedup_minhash_lsh at 100 TB: it says where each banding's " +
        "S-curve threshold sits and how much leakage/false-bucket mass " +
        "to expect — changing b,r after the big pass costs a full " +
        "re-shard, choosing from this table is free."),

    // ------------------------------------------- dedup threshold sweep
    QueryDef(
      "dedup_threshold_sweep",
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("doc_id") < 200)
        val toks = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .distinct()
        val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("nt"))
        val inter = toks.as("t1")
          .join(toks.as("t2"), col("t1.tok") === col("t2.tok") &&
            col("t1.doc_id") < col("t2.doc_id"))
          .groupBy(col("t1.doc_id").as("a"), col("t2.doc_id").as("b"))
          .agg(count(lit(1)).as("ni"))
        val jac = inter
          .join(sizes.select(col("doc_id").as("a"), col("nt").as("na")),
            Seq("a"))
          .join(sizes.select(col("doc_id").as("b"), col("nt").as("nb")),
            Seq("b"))
          .select(col("a"), col("b"),
            expr("(1000 * ni) div (na + nb - ni)").as("j_permille"))
        val th = s.range(1).select(explode(expr(
          "sequence(500L, 900L, 100L)")).as("threshold_permille"))
        th.crossJoin(jac)
          .filter(col("j_permille") >= col("threshold_permille"))
          .groupBy(col("threshold_permille"))
          .agg(count(lit(1)).as("n_pairs"),
            (size(array_distinct(flatten(collect_list(
              array(col("a"), col("b"))))))).cast("long")
              .as("n_docs_involved"))
      },
      Some("""WITH docs AS (SELECT doc_id, text FROM documents
        |        WHERE doc_id < 200),
        |toks AS (SELECT DISTINCT doc_id,
        |    unnest(string_split(text, ' ')) AS tok FROM docs),
        |sizes AS (SELECT doc_id, count(*)::BIGINT AS nt
        |          FROM toks GROUP BY doc_id),
        |inter AS (SELECT t1.doc_id AS a, t2.doc_id AS b,
        |    count(*)::BIGINT AS ni
        |  FROM toks t1 JOIN toks t2
        |    ON t2.tok = t1.tok AND t1.doc_id < t2.doc_id
        |  GROUP BY 1, 2),
        |jac AS (SELECT a, b,
        |    ((1000 * ni) // (sa.nt + sb.nt - ni))::BIGINT AS j_permille
        |  FROM inter JOIN sizes sa ON sa.doc_id = a
        |  JOIN sizes sb ON sb.doc_id = b),
        |th AS (SELECT (range * 100)::BIGINT AS threshold_permille
        |       FROM range(5, 10)),
        |p AS (SELECT th.threshold_permille AS t, a, b
        |      FROM th JOIN jac ON jac.j_permille >= th.threshold_permille),
        |np AS (SELECT t, count(*)::BIGINT AS n_pairs FROM p GROUP BY t),
        |nd AS (SELECT t, count(DISTINCT dd)::BIGINT AS n_docs FROM (
        |    SELECT t, a AS dd FROM p UNION ALL SELECT t, b FROM p)
        |  GROUP BY t)
        |SELECT np.t AS threshold_permille, np.n_pairs,
        |  nd.n_docs AS n_docs_involved
        |FROM np JOIN nd ON nd.t = np.t""".stripMargin),
      "Dedup threshold calibration on a pinned 200-doc slice: exact " +
        "unigram-Jaccard for every candidate pair, swept across " +
        "thresholds 0.5-0.9 — how many pairs and how many documents a " +
        "given cutoff would implicate.  Run this (cheap, slice-bounded) " +
        "before committing a threshold to the corpus-wide MinHash pass; " +
        "with minhash_band_tuning it pins both knobs of the dedup " +
        "family.  The token self-join is posting-list shaped: cost ∝ " +
        "sum of per-token document-frequency squared within the slice."),
  )
}
