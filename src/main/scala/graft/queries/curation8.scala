package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Round-4 continuation batch 2: data-selection and dependence-structure
  * operators.
  *
  *  - DSIR-style importance weighting (Xie et al. 2023, "Data Selection
  *    for Language Models via Importance Resampling") — hashed-unigram
  *    affinity of every doc to a target domain, the scoring half of
  *    importance resampling, here with exact 128-bit integer arithmetic;
  *  - Kendall tau-b rank correlation per group (tie-corrected);
  *  - lag-1 autocorrelation of per-user event values (burstiness /
  *    persistence diagnostic next to burstiness_fano);
  *  - k-core peeling over the kNN graph (two rounds, the bounded-probe
  *    form of the degeneracy decomposition).
  *
  * Integer moments everywhere; the only float ops are short fixed IEEE
  * tails mirrored operation-for-operation in the oracle (the
  * variance_fixed_point / pearson_corr_lang convention).
  */
object Curation8Queries {

  private val Buckets = 1024 // hashing-trick feature space for DSIR

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------ DSIR importance
    QueryDef(
      "dsir_importance_proxy",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("tok"))
          .withColumn("bkt",
            expr(s"cast(conv(substring(md5(tok), 1, 8), 16, 10) as bigint) % $Buckets"))
          .transform(df => graft.Scratch.materialize(s, df, "dsirtoks"))
        // One pass computes BOTH per-bucket counts (conditional count =
        // the old left-join + coalesce(ct, 0)), and the corpus totals
        // fold from the bucket table itself; the materialization drops
        // the remaining duplicate evaluation (counts + scoring join) of
        // the expensive tokenize+md5 subtree to exactly one.  Through a
        // per-invocation SCRATCH PARQUET rather than the r14 persist():
        // the token stream is corpus-token-sized, the worst thing to
        // pin in executor storage at 100 TB; re-measured r15 at
        // sf0.1/local[32] the swap is flat (persist 0.81-1.09 s,
        // scratch parquet 0.86-0.99 s, no-materialization 0.90-0.92 s)
        // while keeping the single tokenize pass at scale.
        // Values are identical.
        val cnt = toks.groupBy(col("bkt")).agg(
          count(lit(1)).as("cs"),
          count(when(col("lang") === "en", 1)).as("ct"))
        val totals = cnt.agg(
          sum(col("cs")).as("ns"), sum(col("ct")).as("nt"))
        toks
          .join(broadcast(cnt), Seq("bkt"))
          .groupBy(col("doc_id"))
          .agg(sum(col("ct")).as("a"),
            sum(col("cs")).as("b"))
          .crossJoin(broadcast(totals))
          .select(col("doc_id"),
            expr("cast((cast(a as decimal(38,0)) * ns * 1000) div " +
              "(cast(b as decimal(38,0)) * nt) as bigint)").as("score_e3"))
      },
      Some(s"""WITH toks AS (
        |  SELECT doc_id, lang,
        |         unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |bkts AS (SELECT doc_id, lang,
        |    ('0x' || substr(md5(tok), 1, 8))::BIGINT % $Buckets AS bkt
        |  FROM toks),
        |cs AS (SELECT bkt, count(*)::BIGINT AS cs FROM bkts GROUP BY bkt),
        |ct AS (SELECT bkt, count(*)::BIGINT AS ct FROM bkts
        |       WHERE lang = 'en' GROUP BY bkt),
        |tot AS (SELECT count(*)::BIGINT AS ns,
        |          count(CASE WHEN lang = 'en' THEN 1 END)::BIGINT AS nt
        |        FROM bkts),
        |per AS (SELECT doc_id, sum(coalesce(ct.ct, 0))::BIGINT AS a,
        |          sum(cs.cs)::BIGINT AS b
        |        FROM bkts JOIN cs USING (bkt) LEFT JOIN ct USING (bkt)
        |        GROUP BY doc_id)
        |SELECT doc_id,
        |  ((a::HUGEINT * ns * 1000) // (b::HUGEINT * nt))::BIGINT
        |    AS score_e3
        |FROM per, tot""".stripMargin),
      "DSIR importance score (Xie et al. 2023): per-doc affinity to a " +
        "target domain (lang='en') over 1024 hashed-unigram features — " +
        "score = E_doc[target-bucket mass] / E_doc[source-bucket mass], " +
        "normalized by corpus totals. The ratio-of-sums form replaces " +
        "the reference method's log-likelihood sum so the score is " +
        "exact 128-bit integer (Spark decimal(38), DuckDB HUGEINT) — " +
        "no float, no order dependence. Bucket tables broadcast (1024 " +
        "rows); one shuffle on doc_id. At 100 TB this is the standard " +
        "two-pass select-before-train layout."),

    // ------------------------------------------------ Kendall tau-b
    QueryDef(
      "kendall_tau_length",
      (s, d) => {
        // deterministic first-100-per-lang sample via ScalableGroups
        // rank (range exchange on (lang, doc_id) + broadcast lang
        // offsets) — the lang-partitioned row_number would funnel
        // corpus/|lang| rows through single window tasks just to pick
        // 100 of them
        val sample = graft.operators.ScalableGroups.withGroupRank(
            Tables.documents(s, d)
              .select(col("lang"), col("doc_id"),
                size(split(col("text"), " ")).cast("long").as("x"),
                length(col("text")).cast("long").as("y")),
            Seq("lang"), Seq(col("doc_id")), 8, rankCol = "rn",
            sizeCol = "__gn")
          .filter(col("rn") <= 100)
          .drop("rn", "__gn")
        val pairs = sample.as("a").join(sample.as("b"),
          col("a.lang") === col("b.lang") &&
            col("a.doc_id") < col("b.doc_id"))
          .select(col("a.lang").as("lang"),
            ((col("a.x") - col("b.x")) * (col("a.y") - col("b.y")))
              .as("prod"),
            (col("a.x") === col("b.x")).as("tx"),
            (col("a.y") === col("b.y")).as("ty"))
        pairs.groupBy(col("lang"))
          .agg(count(lit(1)).as("n0"),
            count(when(col("prod") > 0, 1)).as("c"),
            count(when(col("prod") < 0, 1)).as("dd"),
            count(when(col("tx"), 1)).as("nx"),
            count(when(col("ty"), 1)).as("ny"))
          .select(col("lang"), col("c"), col("dd"),
            floor((col("c") - col("dd")).cast("double") * lit(1000.0) /
              (sqrt((col("n0") - col("nx")).cast("double")) *
                sqrt((col("n0") - col("ny")).cast("double"))))
              .cast("bigint").as("tau_e3"))
      },
      Some("""WITH sample AS (
        |  SELECT lang, doc_id, x, y FROM (
        |    SELECT lang, doc_id,
        |           len(string_split(text, ' '))::BIGINT AS x,
        |           length(text)::BIGINT AS y,
        |           row_number() OVER (PARTITION BY lang ORDER BY doc_id)
        |             AS rn
        |    FROM documents) WHERE rn <= 100),
        |pairs AS (SELECT a.lang,
        |    (a.x - b.x) * (a.y - b.y) AS prod,
        |    a.x = b.x AS tx, a.y = b.y AS ty
        |  FROM sample a JOIN sample b
        |    ON a.lang = b.lang AND a.doc_id < b.doc_id),
        |agg AS (SELECT lang, count(*)::BIGINT AS n0,
        |    count(CASE WHEN prod > 0 THEN 1 END)::BIGINT AS c,
        |    count(CASE WHEN prod < 0 THEN 1 END)::BIGINT AS dd,
        |    count(CASE WHEN tx THEN 1 END)::BIGINT AS nx,
        |    count(CASE WHEN ty THEN 1 END)::BIGINT AS ny
        |  FROM pairs GROUP BY lang)
        |SELECT lang, c, dd,
        |  floor((c - dd)::DOUBLE * 1000.0
        |        / (sqrt((n0 - nx)::DOUBLE) * sqrt((n0 - ny)::DOUBLE)))
        |    ::BIGINT AS tau_e3
        |FROM agg""".stripMargin),
      "Kendall tau-b (tie-corrected) between token count and char " +
        "length per language, over a deterministic 100-doc sample per " +
        "group (first by doc_id). Pair classification is pure integer; " +
        "the tau assembly is a 5-op IEEE tail mirrored exactly. The " +
        "O(n^2) pair join is the reason for the bounded sample — at " +
        "100 TB tau comes from per-group samples (statistically " +
        "sufficient) or from an O(n log n) merge-sort inversion count."),

    // ------------------------------------------------ lag-1 autocorr
    QueryDef(
      "autocorr_lag1",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            floor(col("value") * 100).cast("long").as("v"))
          .withColumn("pv", lag(col("v"), 1).over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("ts"), col("event_id"))))
          .filter(col("pv").isNotNull)
        e.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            sum(col("pv")).as("sa"), sum(col("v")).as("sb"),
            sum(col("pv") * col("pv")).as("saa"),
            sum(col("v") * col("v")).as("sbb"),
            sum(col("pv") * col("v")).as("sab"))
          .filter(col("n") >= 10)
          .select(col("user_id"), col("n"), {
            val cov = (col("n") * col("sab") - col("sa") * col("sb"))
              .cast("double")
            val va = (col("n") * col("saa") - col("sa") * col("sa"))
              .cast("double")
            val vb = (col("n") * col("sbb") - col("sb") * col("sb"))
              .cast("double")
            (cov / (sqrt(va) * sqrt(vb))).as("r_lag1")
          })
      },
      Some("""WITH lagged AS (
        |  SELECT user_id, v,
        |         lag(v) OVER (PARTITION BY user_id
        |                      ORDER BY ts, event_id) AS pv
        |  FROM (SELECT user_id, ts, event_id,
        |          floor(value * 100)::BIGINT AS v FROM events)),
        |m AS (SELECT user_id, count(*)::BIGINT AS n,
        |    sum(pv)::BIGINT AS sa, sum(v)::BIGINT AS sb,
        |    sum(pv * pv)::BIGINT AS saa, sum(v * v)::BIGINT AS sbb,
        |    sum(pv * v)::BIGINT AS sab
        |  FROM lagged WHERE pv IS NOT NULL GROUP BY user_id)
        |SELECT user_id, n,
        |  (n*sab - sa*sb)::BIGINT::DOUBLE
        |    / (sqrt((n*saa - sa*sa)::BIGINT::DOUBLE)
        |       * sqrt((n*sbb - sb*sb)::BIGINT::DOUBLE)) AS r_lag1
        |FROM m WHERE n >= 10""".stripMargin),
      "Lag-1 autocorrelation of each user's event-value sequence " +
        "(persistence/burstiness diagnostic next to burstiness_fano): " +
        "consecutive pairs via lag window on (ts, event_id), Pearson r " +
        "from exact fixed-point integer moments, 4-op IEEE tail — the " +
        "pearson_corr_lang convention. One shuffle on user_id serves " +
        "both the window and the agg (same partitioning, no second " +
        "exchange)."),

    // ------------------------------------------------ k-core peeling
    QueryDef(
      "kcore_membership",
      (s, d) => {
        val und = GraphQueries.knnEdges(s, d)
          .select(col("src").as("u"), col("dst").as("v"))
          .unionByName(GraphQueries.knnEdges(s, d)
            .select(col("dst").as("u"), col("src").as("v")))
          .distinct()
        val k = 5
        def degrees(e: org.apache.spark.sql.DataFrame) =
          e.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        val d0 = degrees(und)
        val keep1 = d0.filter(col("deg") >= k).select(col("u"))
        val e1 = und.join(keep1, Seq("u"))
          .join(keep1.select(col("u").as("v")), Seq("v"))
        val d1 = degrees(e1)
        val keep2 = d1.filter(col("deg") >= k).select(col("u"))
        d0.select(col("u"))
          .join(keep1.withColumn("r1", lit(1)), Seq("u"), "left")
          .join(keep2.withColumn("r2", lit(1)), Seq("u"), "left")
          .select(col("u").as("vec_id"),
            (coalesce(col("r1"), lit(0)) + coalesce(col("r2"), lit(0)))
              .cast("bigint").as("rounds_survived"))
      },
      Some(s"""WITH ${GraphQueries.knnEdgesSql},
        |und AS (SELECT DISTINCT u, v FROM (
        |  SELECT src AS u, dst AS v FROM edges
        |  UNION ALL SELECT dst AS u, src AS v FROM edges)),
        |d0 AS (SELECT u, count(*)::BIGINT AS deg FROM und GROUP BY u),
        |keep1 AS (SELECT u FROM d0 WHERE deg >= 5),
        |e1 AS (SELECT und.u, und.v FROM und
        |       JOIN keep1 ku ON und.u = ku.u
        |       JOIN keep1 kv ON und.v = kv.u),
        |d1 AS (SELECT u, count(*)::BIGINT AS deg FROM e1 GROUP BY u),
        |keep2 AS (SELECT u FROM d1 WHERE deg >= 5)
        |SELECT d0.u AS vec_id,
        |  ((CASE WHEN k1.u IS NULL THEN 0 ELSE 1 END)
        |   + (CASE WHEN k2.u IS NULL THEN 0 ELSE 1 END))::BIGINT
        |    AS rounds_survived
        |FROM d0 LEFT JOIN keep1 k1 ON d0.u = k1.u
        |        LEFT JOIN keep2 k2 ON d0.u = k2.u""".stripMargin),
      "k-core peeling (k=5, two rounds) over the symmetrized kNN " +
        "graph: remove degree-<k nodes, recompute degrees on the " +
        "induced subgraph, remove again — rounds_survived in {0,1,2} " +
        "is the peel depth, the bounded-iteration probe of the " +
        "degeneracy decomposition (full fixpoint = loop until no " +
        "removal, same join shape per round, at most O(max-core) " +
        "rounds). Each round is one shuffle on node id; edges are " +
        "re-filtered, never materialized to the driver."),
  )
}
