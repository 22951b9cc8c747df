package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.VectorOps._

/** Round-4 continuation batch 3: retrieval diversity, privacy gating,
  * and corpus-growth diagnostics.
  *
  *  - MMR (maximal marginal relevance, Carbonell & Goldstein 1998)
  *    diversity reranking — the greedy select-against-the-selected loop
  *    RAG stacks run between retrieval and prompt assembly, unrolled to
  *    3 deterministic rounds;
  *  - k-anonymity violation gate over quasi-identifier tuples — the
  *    privacy screen next to redact_pii;
  *  - word2vec-style unigram sampling weights (count^0.75) with the
  *    exponent computed EXACTLY as sqrt(c*sqrt(c)) — two correctly-
  *    rounded IEEE ops, no pow();
  *  - Heaps'-law vocabulary growth curve (vocab size vs tokens seen at
  *    10 corpus prefixes) — the vocab-sizing diagnostic next to
  *    zipf_coverage_curve.
  */
object Curation9Queries {

  /** Top-10 cosine candidates for 5 query vectors, integer relevance. */
  private def mmrCands(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    broadcast(q).crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        floor(cosine(col("qe"), col("ce")) * 1000000).cast("bigint")
          .as("rel_e6"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("rel_e6").desc, col("cid"))))
      .filter(col("rk") <= 10)
      .select(col("qid"), col("cid"), col("rel_e6"))
  }

  private val mmrCandsSql: String =
    s"""cand AS (
       |  SELECT qid, cid, rel_e6 FROM (
       |    SELECT q.vec_id AS qid, c.vec_id AS cid,
       |           floor(${cosineSql("q.embedding", "c.embedding")}
       |                 * 1000000)::BIGINT AS rel_e6,
       |           row_number() OVER (
       |             PARTITION BY q.vec_id
       |             ORDER BY floor(${cosineSql("q.embedding", "c.embedding")}
       |                            * 1000000)::BIGINT DESC, c.vec_id) AS rk
       |    FROM embeddings q CROSS JOIN embeddings c
       |    WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id)
       |  WHERE rk <= 10)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------ MMR rerank
    QueryDef(
      "mmr_rerank_top3",
      (s, d) => {
        val cand = mmrCands(s, d).persist()
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"))
        // pairwise candidate-candidate similarity inside each qid set
        val withE = cand.join(emb, cand("cid") === emb("vec_id"))
          .select(col("qid"), col("cid"), col("rel_e6"), col("embedding"))
        val sims = withE.as("x").join(withE.as("y"),
          col("x.qid") === col("y.qid") && col("x.cid") =!= col("y.cid"))
          .select(col("x.qid").as("qid"), col("x.cid").as("a"),
            col("y.cid").as("b"),
            floor(cosine(col("x.embedding"), col("y.embedding")) * 1000000)
              .cast("bigint").as("sim_e6")).persist()
        def pick(c: DataFrame, score: String) =
          c.withColumn("rk", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col(score).desc, col("cid"))))
            .filter(col("rk") === 1)
            .select(col("qid"), col("cid"))
        // round 1: pure relevance
        val s1 = pick(cand, "rel_e6")
        // round 2: rel - sim(., s1)
        val simsR = sims.select(col("qid").as("sq"), col("a"), col("b"),
          col("sim_e6"))
        val r2 = cand.join(s1.withColumnRenamed("cid", "p1"), Seq("qid"))
          .filter(col("cid") =!= col("p1"))
          .join(simsR, col("qid") === col("sq") &&
            col("cid") === col("a") && col("p1") === col("b"))
          .select(col("qid"), col("cid"),
            (col("rel_e6") - col("sim_e6")).as("mmr"))
        val s2 = pick(r2, "mmr")
        // round 3: rel - max(sim to {s1, s2})
        val sel12 = s1.withColumn("round", lit(1L))
          .unionByName(s2.withColumn("round", lit(2L)))
        val r3 = cand.join(sel12.select(col("qid"), col("cid").as("p"))
            .groupBy(col("qid")).agg(collect_set(col("p")).as("ps")), Seq("qid"))
          .filter(!array_contains(col("ps"), col("cid")))
          .join(simsR, col("qid") === col("sq") && col("cid") === col("a"))
          .filter(array_contains(col("ps"), col("b")))
          .groupBy(col("qid"), col("cid"), col("rel_e6"))
          .agg(max(col("sim_e6")).as("msim"))
          .select(col("qid"), col("cid"),
            (col("rel_e6") - col("msim")).as("mmr"))
        val s3 = pick(r3, "mmr")
        s1.withColumn("round", lit(1L))
          .unionByName(s2.withColumn("round", lit(2L)))
          .unionByName(s3.withColumn("round", lit(3L)))
          .select(col("qid"), col("round"), col("cid"))
      },
      Some(s"""WITH $mmrCandsSql,
        |sims AS (SELECT x.qid, x.cid AS a, y.cid AS b,
        |    floor(${cosineSql("ex.embedding", "ey.embedding")}
        |          * 1000000)::BIGINT AS sim_e6
        |  FROM cand x JOIN cand y ON x.qid = y.qid AND x.cid <> y.cid
        |  JOIN embeddings ex ON x.cid = ex.vec_id
        |  JOIN embeddings ey ON y.cid = ey.vec_id),
        |s1 AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (
        |    PARTITION BY qid ORDER BY rel_e6 DESC, cid) AS rk FROM cand)
        |  WHERE rk = 1),
        |r2 AS (SELECT c.qid, c.cid, c.rel_e6 - s.sim_e6 AS mmr
        |  FROM cand c JOIN s1 ON c.qid = s1.qid AND c.cid <> s1.cid
        |  JOIN sims s ON s.qid = c.qid AND s.a = c.cid AND s.b = s1.cid),
        |s2 AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (
        |    PARTITION BY qid ORDER BY mmr DESC, cid) AS rk FROM r2)
        |  WHERE rk = 1),
        |r3 AS (SELECT c.qid, c.cid, c.rel_e6 - max(s.sim_e6) AS mmr
        |  FROM cand c
        |  JOIN s1 ON c.qid = s1.qid JOIN s2 ON c.qid = s2.qid
        |  JOIN sims s ON s.qid = c.qid AND s.a = c.cid
        |  WHERE c.cid <> s1.cid AND c.cid <> s2.cid
        |    AND (s.b = s1.cid OR s.b = s2.cid)
        |  GROUP BY c.qid, c.cid, c.rel_e6),
        |s3 AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (
        |    PARTITION BY qid ORDER BY mmr DESC, cid) AS rk FROM r3)
        |  WHERE rk = 1)
        |SELECT qid, 1::BIGINT AS round, cid FROM s1
        |UNION ALL SELECT qid, 2, cid FROM s2
        |UNION ALL SELECT qid, 3, cid FROM s3""".stripMargin),
      "MMR diversity reranking (Carbonell & Goldstein 1998), lambda=0.5 " +
        "(monotone to rel - max_sim at e6 scale): greedy argmax against " +
        "the already-selected set, unrolled to 3 rounds over a top-10 " +
        "candidate pool per query — the retrieve-then-diversify step a " +
        "RAG stack runs before prompt assembly (candidate generation: " +
        "RAG-eval-test_model.py:242-248). All scores integer e6; ties " +
        "broken by cid. Candidate pools are per-query-bounded, so every " +
        "round is a broadcast-scale join regardless of corpus size."),

    // ------------------------------------------------ k-anonymity
    QueryDef(
      "k_anonymity_violations",
      (s, d) => Tables.documents(s, d)
        .select(col("lang"), col("source"),
          expr("(size(split(text, ' ')) div 25)").cast("bigint")
            .as("len_bucket"))
        .groupBy(col("lang"), col("source"), col("len_bucket"))
        .agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") < 5),
      Some("""SELECT lang, source,
        |  (len(string_split(text, ' ')) // 25)::BIGINT AS len_bucket,
        |  count(*)::BIGINT AS n_docs
        |FROM documents
        |GROUP BY 1, 2, 3 HAVING count(*) < 5""".stripMargin),
      "k-anonymity gate (k=5) over the quasi-identifier tuple " +
        "(lang, source, token-length bucket): equivalence classes with " +
        "fewer than k members re-identify their documents and fail the " +
        "release screen — the structural privacy check next to " +
        "redact_pii's content scrubbing. One hash agg; at 100 TB the " +
        "violating classes are by construction the SMALL groups, so the " +
        "result set stays tiny even when the input does not."),

    // ------------------------------------------------ unigram sampling
    QueryDef(
      "unigram_sampling_weights",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("c"))
          // c^0.75 == sqrt(c * sqrt(c)): two correctly-rounded IEEE ops
          .withColumn("w_e3",
            floor(sqrt(col("c").cast("double") *
              sqrt(col("c").cast("double"))) * 1000).cast("bigint"))
        val tot = counts.agg(sum(col("w_e3")).as("tw"))
        counts.crossJoin(broadcast(tot))
          .select(col("tok"), col("c"), col("w_e3"),
            expr("(w_e3 * 1000000) div tw").as("share_ppm"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("share_ppm").desc, col("tok"))))
          .filter(col("rk") <= 30)
          .select(col("tok"), col("c"), col("w_e3"), col("share_ppm"))
      },
      Some("""WITH counts AS (
        |  SELECT tok, count(*)::BIGINT AS c FROM (
        |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok),
        |w AS (SELECT tok, c,
        |    floor(sqrt(c::DOUBLE * sqrt(c::DOUBLE)) * 1000)::BIGINT
        |      AS w_e3
        |  FROM counts),
        |tot AS (SELECT sum(w_e3)::BIGINT AS tw FROM w),
        |ranked AS (SELECT tok, c, w_e3,
        |    (w_e3 * 1000000) // tw AS share_ppm,
        |    row_number() OVER (
        |      ORDER BY (w_e3 * 1000000) // tw DESC, tok) AS rk
        |  FROM w, tot)
        |SELECT tok, c, w_e3, share_ppm FROM ranked WHERE rk <= 30""".stripMargin),
      "word2vec negative-sampling weights (Mikolov et al. 2013): " +
        "count^(3/4) flattens the unigram distribution before drawing " +
        "negatives. The fractional power is computed EXACTLY as " +
        "sqrt(c*sqrt(c)) — sqrt is correctly rounded per IEEE-754 so " +
        "both engines agree bit-for-bit, where pow(c,0.75) (libm, " +
        "platform-dependent) would not. Weights fixed-pointed at e3 " +
        "then integer-summed: the normalizer is order-independent."),

    // ------------------------------------------------ Heaps' law
    QueryDef(
      "heaps_vocab_growth",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val maxId = Tables.documents(s, d)
          .agg((max(col("doc_id")) + 1).as("m"))
        val cuts = maxId.select(
          explode(sequence(lit(1), lit(10))).as("k"), col("m"))
          .select(col("k").cast("bigint").as("k"),
            expr("(k * m) div 10").as("t"))
        val firsts = toks.groupBy(col("tok"))
          .agg(min(col("doc_id")).as("first_doc"))
        val vocab = firsts.crossJoin(broadcast(cuts))
          .filter(col("first_doc") < col("t"))
          .groupBy(col("k")).agg(count(lit(1)).as("vocab_size"))
        val seen = toks.crossJoin(broadcast(cuts))
          .filter(col("doc_id") < col("t"))
          .groupBy(col("k")).agg(count(lit(1)).as("tokens_seen"))
        seen.join(vocab, Seq("k"))
          .select(col("k"), col("tokens_seen"), col("vocab_size"))
      },
      Some("""WITH toks AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |cuts AS (SELECT k::BIGINT AS k,
        |    (k * (SELECT max(doc_id) + 1 FROM documents)) // 10 AS t
        |  FROM (SELECT range + 1 AS k FROM range(0, 10))),
        |firsts AS (SELECT tok, min(doc_id) AS first_doc
        |           FROM toks GROUP BY tok),
        |vocab AS (SELECT k, count(*)::BIGINT AS vocab_size
        |  FROM firsts, cuts WHERE first_doc < t GROUP BY k),
        |seen AS (SELECT k, count(*)::BIGINT AS tokens_seen
        |  FROM toks, cuts WHERE doc_id < t GROUP BY k)
        |SELECT seen.k, tokens_seen, vocab_size
        |FROM seen JOIN vocab ON seen.k = vocab.k""".stripMargin),
      "Heaps'-law growth curve: vocabulary size vs tokens seen at ten " +
        "doc-id prefixes of the corpus — the diagnostic that sizes " +
        "tokenizer vocab and predicts novel-token rate for a planned " +
        "crawl expansion (pairs with zipf_coverage_curve's frequency " +
        "view). The expensive part is one min(doc_id)-per-token agg " +
        "(vocab-bounded state); the 10 cutoffs are a broadcast; no " +
        "per-cutoff rescan of the corpus."),

    // ------------------------------------------------ ROUGE-L
    QueryDef(
      "rouge_l_pairs",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val a = docs.filter(col("doc_id") < 8)
          .select(col("doc_id").as("pid"), col("text").as("ta"))
        val b = docs
          .select((col("doc_id") - 1).as("pid"), col("text").as("tb"))
        a.join(b, Seq("pid"))
          .select(col("pid"),
            graft.functions.LcsKernel.lcsTokens(col("ta"), col("tb"))
              .as("lcs"),
            size(split(col("ta"), " ")).cast("bigint").as("la"),
            size(split(col("tb"), " ")).cast("bigint").as("lb"))
          .select(col("pid"), col("lcs"),
            expr("(2 * lcs * 1000000) div (la + lb)").as("f1_e6"))
      },
      Some("""WITH RECURSIVE pairs AS (
        |  SELECT a.doc_id AS pid,
        |         string_split(a.text, ' ') AS ta,
        |         string_split(b.text, ' ') AS tb,
        |         len(string_split(a.text, ' '))::BIGINT AS la,
        |         len(string_split(b.text, ' '))::BIGINT AS lb
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |  WHERE a.doc_id < 8),
        |dp AS (
        |  -- anti-diagonal wavefront: prev = diag k-1, cur = diag k,
        |  -- each list ordered by ascending i, cell (i, k-i)
        |  SELECT pid, la, lb, ta, tb, 1::BIGINT AS k,
        |         CAST([0] AS BIGINT[]) AS prev,
        |         CAST([0, 0] AS BIGINT[]) AS cur
        |  FROM pairs
        |  UNION ALL
        |  SELECT pid, la, lb, ta, tb, k + 1, cur,
        |    list_transform(
        |      generate_series(greatest(0, k + 1 - lb), least(la, k + 1)),
        |      i -> CASE
        |        WHEN i = 0 OR k + 1 - i = 0 THEN 0::BIGINT
        |        WHEN ta[i::INT] = tb[(k + 1 - i)::INT]
        |          THEN prev[(i - greatest(0, k - 1 - lb))::INT] + 1
        |        ELSE greatest(
        |          cur[(i - greatest(0, k - lb))::INT],
        |          cur[(i + 1 - greatest(0, k - lb))::INT]) END)
        |  FROM dp WHERE k < la + lb)
        |SELECT pid, cur[1] AS lcs,
        |       (2 * cur[1] * 1000000) // (la + lb) AS f1_e6
        |FROM dp WHERE k = la + lb""".stripMargin),
      "ROUGE-L F1 (Lin 2004) between adjacent-doc pairs via the native " +
        "lcs_tokens kernel; f1_e6 = (2*LCS*1e6) div (la+lb), pure " +
        "integer. The oracle runs the SAME DP as a recursive-CTE " +
        "anti-diagonal wavefront (two rolling diagonals as lists), so " +
        "even this non-relational kernel is hash-compared, not just " +
        "row-counted. At 100 TB ROUGE scores eval sets (bounded token " +
        "counts); the O(n*m) kernel is row-local — no shuffle, no " +
        "state."),
  )
}
