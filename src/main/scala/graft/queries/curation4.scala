package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Corpus, QueryDef, Tables}

/** Round-4 continuation: retrieval scoring (BM25, reciprocal-rank
  * fusion), heuristic corpus gates (Gopher-style rule filter, Pareto
  * skyline), scale-exact similarity join (prefix filtering), binary
  * embedding compaction (sign-bit Hamming ANN), content-defined
  * chunking, temperature-scaled mixture weights, and time-decayed
  * activity scoring.
  *
  * These extend the reference's retrieval/curation surface — the
  * full-corpus ranking loop (rag_evaluation/RAG-eval-test_model.py:
  * 130,242-248), the corpus hygiene drops
  * (data_generation/generate_narratives_from_data.py:83), and the
  * eval-sweep weighting grids (train_adapters/create_all_models.py:39-40)
  * — with the standard operators a 100 TB training-data pipeline adds on
  * top: quality gating before tokenization, candidate-pair generation
  * that avoids the quadratic join, and mixture reweighting.
  *
  * Determinism contract (see [[graft.Det]]): every score is integer
  * fixed-point (`div` / `//` floor division on both engines); the only
  * floating op is `sqrt`, which IEEE 754 requires to be correctly
  * rounded, so `floor(sqrt(n)*1e6)` is bit-identical cross-engine.
  */
object Curation4Queries {

  private val P = 2147483647L // 2^31 - 1, same modulus as the dedup family

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** Integer word-length sum via HOFs: split runs once per row (it is the
    * lambda *input*, not referenced inside the lambda body — see the
    * O(tokens^2) trap documented at DedupQueries.shingles). */
  private val wlenSumExpr =
    "aggregate(transform(split(text, ' '), t -> CAST(length(t) AS BIGINT)), 0L, (a, x) -> a + x)"
  private val wlenSumSql =
    "list_sum(list_transform(string_split(text, ' '), t -> length(t)))::BIGINT"

  private val stopWords = Seq("table", "row", "value", "data", "key")
  private val qTerms = Seq("scan", "merge", "window", "data")

  val defs: Seq[QueryDef] = Seq(

    // ----------------------------------------------- Gopher-style gate
    QueryDef(
      "gopher_quality_filter",
      (s, d) => docs(s, d)
        .withColumn("n_words", size(split(col("text"), " ")).cast("bigint"))
        .withColumn("wlen_sum", expr(wlenSumExpr))
        .withColumn("mean_wlen_e3", expr("(wlen_sum * 1000) div n_words"))
        .withColumn("short_permille", expr(
          "(CAST(size(filter(split(text, ' '), t -> length(t) <= 2)) AS BIGINT) * 1000) div n_words"))
        .withColumn("stop_hits", expr(
          s"CAST(size(filter(split(text, ' '), t -> array_contains(array(${stopWords.map("'" + _ + "'").mkString(",")}), t))) AS BIGINT)"))
        .select(col("doc_id"), col("n_words"), col("mean_wlen_e3"),
          col("short_permille"), col("stop_hits"),
          (col("n_words").between(20, 80) &&
            col("mean_wlen_e3").between(3000, 6000) &&
            col("short_permille") <= 200 &&
            col("stop_hits") >= 1).as("passes")),
      Some(s"""SELECT doc_id,
        | len(string_split(text, ' '))::BIGINT AS n_words,
        | ($wlenSumSql * 1000) // len(string_split(text, ' ')) AS mean_wlen_e3,
        | (len(list_filter(string_split(text, ' '), t -> length(t) <= 2))::BIGINT * 1000)
        |   // len(string_split(text, ' ')) AS short_permille,
        | len(list_filter(string_split(text, ' '),
        |   t -> list_contains([${stopWords.map("'" + _ + "'").mkString(",")}], t)))::BIGINT AS stop_hits,
        | (len(string_split(text, ' ')) BETWEEN 20 AND 80
        |   AND ($wlenSumSql * 1000) // len(string_split(text, ' ')) BETWEEN 3000 AND 6000
        |   AND (len(list_filter(string_split(text, ' '), t -> length(t) <= 2))::BIGINT * 1000)
        |        // len(string_split(text, ' ')) <= 200
        |   AND len(list_filter(string_split(text, ' '),
        |         t -> list_contains([${stopWords.map("'" + _ + "'").mkString(",")}], t))) >= 1) AS passes
        |FROM documents""".stripMargin),
      "Gopher-style rule gate (word-count bounds, mean word length, " +
        "short-word ratio, stopword presence) as one narrow projection — " +
        "no shuffle, whole-stage codegen, all-integer thresholds. The " +
        "hygiene pass that runs before any tokenization at 100 TB."),

    // ------------------------------------------- reciprocal-rank fusion
    QueryDef(
      "rrf_fuse_rankings",
      (s, d) => {
        val base = docs(s, d)
          .withColumn("wlen_sum", expr(wlenSumExpr))
          .withColumn("quality_e3", expr(
            "(wlen_sum * 1000) div CAST(size(split(text, ' ')) AS BIGINT)"))
          .select(col("doc_id"), col("n_chars"), col("quality_e3"))
        // each signal's full-corpus rank via ScalableIndex (range
        // partition + offsets, no single-partition window), fused by a
        // doc_id equi-join; the final top-20 is a distributed
        // TakeOrderedAndProject, not a global row_number sort
        val byLen = graft.operators.ScalableIndex.withDenseIndex(
          base.select(col("doc_id"), col("n_chars")),
          Seq(col("n_chars").desc, col("doc_id")), 8, "idx")
          .select(col("doc_id"), (col("idx") + 1L).as("rank_len"))
        val byQ = graft.operators.ScalableIndex.withDenseIndex(
          base.select(col("doc_id"), col("quality_e3")),
          Seq(col("quality_e3").desc, col("doc_id")), 8, "idx")
          .select(col("doc_id"), (col("idx") + 1L).as("rank_q"))
        byLen.join(byQ, Seq("doc_id"))
          .withColumn("rrf_e6", expr(
            "(1000000 div (60 + rank_len)) + (1000000 div (60 + rank_q))"))
          .orderBy(col("rrf_e6").desc, col("doc_id"))
          .limit(20)
          .select(col("doc_id"), col("rank_len"), col("rank_q"), col("rrf_e6"))
      },
      Some(s"""WITH base AS (SELECT doc_id, n_chars,
        |   ($wlenSumSql * 1000) // len(string_split(text, ' ')) AS quality_e3
        | FROM documents),
        |ranked AS (SELECT doc_id,
        |   row_number() OVER (ORDER BY n_chars DESC, doc_id)::BIGINT AS rank_len,
        |   row_number() OVER (ORDER BY quality_e3 DESC, doc_id)::BIGINT AS rank_q
        | FROM base),
        |fused AS (SELECT doc_id, rank_len, rank_q,
        |   (1000000 // (60 + rank_len)) + (1000000 // (60 + rank_q)) AS rrf_e6
        | FROM ranked)
        |SELECT doc_id, rank_len, rank_q, rrf_e6 FROM fused
        |ORDER BY rrf_e6 DESC, doc_id LIMIT 20""".stripMargin),
      "Reciprocal-rank fusion of two retrieval signals (k=60), all " +
        "integer. Generalizes the reference's single-signal full-corpus " +
        "ranking (RAG-eval-test_model.py:242-248) to hybrid retrieval. " +
        "Global ranks are the semantics; at scale each signal's rank " +
        "comes from its own top-k index pass and the fusion joins those " +
        "bounded lists, never the full corpus."),

    // --------------------------------------------------------- BM25 top-k
    QueryDef(
      "bm25_topk",
      (s, d) => {
        val toks = docs(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
        val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_toks"))
        val qt = toks.filter(col("tok").isin(qTerms: _*))
        val tf = qt.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
        val dfreq = qt.select(col("doc_id"), col("tok")).distinct()
          .groupBy(col("tok")).agg(count(lit(1)).as("df"))
        val scored = tf
          .join(broadcast(dfreq), "tok")
          .join(dl, "doc_id")
          .crossJoin(broadcast(stats))
          // BM25 k1=1.2 b=0.75 in e3/e6 fixed point; idf = (N-df+0.5)/(df+0.5)
          // as the exact integer ratio ((2(N-df)+1)e6)//(2df+1).
          .withColumn("contrib_e6", expr(
            """((((2*(n_docs - df) + 1) * 1000000) div (2*df + 1)) * tf * 2200) div
              | (tf * 1000 + (1200 * (250 + (750 * ((dl * 1000000) div ((total_toks * 1000) div n_docs))) div 1000)) div 1000)""".stripMargin))
        scored.groupBy(col("doc_id"))
          .agg(sum(col("contrib_e6")).as("score_e6"),
            count(lit(1)).as("n_terms"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("score_e6").desc, col("doc_id"))).cast("bigint"))
          .filter(col("rk") <= 10)
          .select(col("doc_id"), col("rk"), col("score_e6"), col("n_terms"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
        |stats AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_toks FROM dl),
        |qt AS (SELECT doc_id, tok FROM toks WHERE tok IN (${qTerms.map("'" + _ + "'").mkString(",")})),
        |tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM qt GROUP BY doc_id, tok),
        |dfreq AS (SELECT tok, count(DISTINCT doc_id)::BIGINT AS df FROM qt GROUP BY tok),
        |scored AS (SELECT tf.doc_id,
        |   ((((2*(n_docs - df) + 1) * 1000000) // (2*df + 1)) * tf * 2200) //
        |     (tf * 1000 + (1200 * (250 + (750 * ((dl * 1000000) // ((total_toks * 1000) // n_docs))) // 1000)) // 1000)
        |     AS contrib_e6
        | FROM tf JOIN dfreq USING (tok) JOIN dl ON tf.doc_id = dl.doc_id, stats),
        |agg AS (SELECT doc_id, sum(contrib_e6)::BIGINT AS score_e6, count(*)::BIGINT AS n_terms
        |        FROM scored GROUP BY doc_id)
        |SELECT doc_id, row_number() OVER (ORDER BY score_e6 DESC, doc_id)::BIGINT AS rk,
        |       score_e6, n_terms
        |FROM agg ORDER BY score_e6 DESC, doc_id LIMIT 10""".stripMargin),
      "BM25 (k1=1.2, b=0.75) over a fixed query-term set, entirely in " +
        "integer fixed point. tf shuffles once on (doc,term); df and the " +
        "corpus stats are tiny broadcasts; the doc-length table joins on " +
        "the same doc_id partitioning as tf. The lexical half of the " +
        "hybrid retrieval that RAG-eval-test_model.py:242-248 does " +
        "dense-only."),

    // ------------------------------- temperature-scaled mixture weights
    QueryDef(
      "domain_temperature_sample",
      (s, d) => {
        val counts = docs(s, d).groupBy(col("source"))
          .agg(count(lit(1)).as("cnt"))
          // alpha=0.5 temperature: w = sqrt(cnt). IEEE sqrt is correctly
          // rounded, so floor(sqrt*1e6) is cross-engine exact; the
          // normalization then stays in integers.
          .withColumn("w_e6", floor(sqrt(col("cnt")) * lit(1000000d)).cast("bigint"))
        counts
          .crossJoin(broadcast(counts.agg(sum(col("w_e6")).as("total_w"))))
          .select(col("source"), col("cnt"), col("w_e6"),
            expr("(w_e6 * 1000) div total_w").as("permille"))
      },
      Some("""WITH counts AS (SELECT source, count(*)::BIGINT AS cnt,
        |   floor(sqrt(count(*)) * 1000000)::BIGINT AS w_e6
        | FROM documents GROUP BY source)
        |SELECT source, cnt, w_e6,
        |       (w_e6 * 1000) // (SELECT sum(w_e6)::BIGINT FROM counts) AS permille
        |FROM counts""".stripMargin),
      "Temperature-scaled domain mixture (alpha=0.5): per-source counts " +
        "-> sqrt weights -> permille sampling rates. The standard " +
        "upweight-the-tail rebalance before training-mix sampling; one " +
        "tiny aggregate, broadcast normalizer."),

    // -------------------------------- prefix-filtered jaccard pair join
    QueryDef(
      "jaccard_prefix_filter_join",
      (s, d) => {
        val sub = Corpus.withDups(s, d).filter(pmod(col("doc_id"), lit(10)) === 0)
        val sets = sub
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .distinct()
        val dfreq = sets.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        // Canonical global token order: rarest-first (df, tok). For
        // Jaccard >= 0.7 a pair must share a token within each side's
        // first |x| - ceil(0.7|x|) + 1 tokens of that order (Bayardo/
        // Chaudhuri prefix filter) — candidate generation joins ONLY on
        // prefix tokens, never the full quadratic token join.
        //
        // Each distinct token gets a dense integer id = its rank in
        // exactly that (df, tok) order (ScalableIndex: range partition
        // + offsets, no single-partition window over the vocabulary).
        // The id is a bijection, so every downstream count — per-doc
        // rank, prefix membership, |intersection| — is unchanged; what
        // changes is the physical work: the exact-verify stage
        // intersects small INT arrays instead of string arrays
        // (measured 2.5 s -> see OPTIMIZATION_r15.md; the fixture's
        // vocabulary is small so the prefix filter prunes little and
        // the verify dominates), and the candidate join shuffles ints.
        val tokIds = graft.operators.ScalableIndex.withDenseIndex(
          dfreq, Seq(col("df"), col("tok")), 8, "tid")
          .select(col("tok"), col("tid"))
        val ids = sets.join(broadcast(tokIds), "tok")
          .select(col("doc_id"), col("tid"))
        val ranked = ids
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("doc_id")).orderBy(col("tid"))))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
          .withColumn("plen", expr("n - ((7*n + 9) div 10) + 1"))
        val prefix = ranked.filter(col("rn") <= col("plen"))
          .select(col("tid"), col("doc_id"), col("rn"), col("n"))
        // PPJoin positional filter (Xiao et al.): a match at per-doc
        // ranks (rn_x, rn_y) bounds the overlap by 1 + min(nx - rn_x,
        // ny - rn_y) (all shared tokens of the pair's FIRST shared
        // token onward lie in those suffixes), while J >= 0.7 needs
        // 17*o >= 7*(nx + ny).  Matches failing the bound generate no
        // candidate; LOSSLESS because a qualifying pair's first shared
        // token always passes (o <= 1 + min of its suffixes by
        // definition of "first").  Prunes the pair stream BEFORE the
        // distinct and the verify join ever see it.
        val cand = prefix.as("x").join(prefix.as("y"),
            col("x.tid") === col("y.tid") && col("x.doc_id") < col("y.doc_id") &&
              (lit(1L) + least(col("x.n") - col("x.rn"),
                col("y.n") - col("y.rn"))) * 17 >=
                (col("x.n") + col("y.n")) * 7)
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
          .distinct()
        // sort_array once per doc so the per-pair verify is a LINEAR
        // MERGE (SortedIntersect kernel) instead of array_intersect's
        // per-pair hash-set build — same |intersection| on the same id
        // sets, O(na+nb) with zero allocation per candidate (r15; the
        // verify stage is this query's dominant cost).
        val toksets = ids.groupBy(col("doc_id"))
          .agg(sort_array(collect_set(col("tid"))).as("toks"),
            count(lit(1)).as("n"))
        // Lossless length filter before the array verify: J(a,b) >= 0.7
        // forces 10*min(na,nb) >= 7*max(na,nb) (inter <= min, uni >=
        // max), so size-discordant candidates drop while carrying only
        // (doc_id, n) — the arrays attach after.
        val sizes = toksets.select(col("doc_id"), col("n"))
        cand
          .join(broadcast(sizes).as("sa"), col("a") === col("sa.doc_id"))
          .join(broadcast(sizes).as("sb"), col("b") === col("sb.doc_id"))
          .filter(least(col("sa.n"), col("sb.n")) * 10 >=
            greatest(col("sa.n"), col("sb.n")) * 7)
          .select(col("a"), col("b"))
          .join(toksets.as("ta"), col("a") === col("ta.doc_id"))
          .join(toksets.as("tb"), col("b") === col("tb.doc_id"))
          .withColumn("inter", graft.functions.MinHashKernel
            .sortedIntersect(col("ta.toks"), col("tb.toks")))
          .withColumn("uni", col("ta.n") + col("tb.n") - col("inter"))
          .filter(col("inter") * 10 >= col("uni") * 7)
          .select(col("a"), col("b"),
            expr("(inter * 1000) div uni").as("jacc_permille"))
      },
      Some(s"""WITH corpus AS (${Corpus.cte}),
        |sub AS (SELECT * FROM corpus WHERE doc_id % 10 = 0),
        |sets AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM sub),
        |pairs AS (SELECT a.doc_id AS a, b.doc_id AS b,
        |    len(list_intersect(a.toks, b.toks))::BIGINT AS inter,
        |    (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))::BIGINT AS uni
        |  FROM sets a JOIN sets b ON a.doc_id < b.doc_id)
        |SELECT a, b, (inter * 1000) // uni AS jacc_permille
        |FROM pairs WHERE inter * 10 >= uni * 7""".stripMargin),
      "Set-similarity join with exact prefix filtering (threshold 0.7): " +
        "rarest-first canonical order, per-doc prefix of len " +
        "n-ceil(0.7n)+1, candidates only from prefix-token matches, " +
        "then exact verify. The oracle brute-forces all pairs — results " +
        "are identical because prefix filtering is lossless. At 100 TB " +
        "the prefix join touches a tiny fraction of the token index " +
        "while the quadratic pair join never exists."),

    // ------------------------------------ sign-bit binary embedding ANN
    QueryDef(
      "hamming_topk_binary",
      (s, d) => {
        val packed = Tables.embeddings(s, d).select(col("vec_id"),
          expr("aggregate(sequence(0, 59), 0L, (acc, i) -> " +
            "acc + IF(element_at(embedding, i + 1) > 0.0, shiftleft(1L, i), 0L))")
            .as("sig"))
        val q = packed.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("sig").as("qs"))
        packed.select(col("vec_id").as("cid"), col("sig").as("cs"))
          .join(broadcast(q), col("qid") =!= col("cid"))
          .withColumn("hd", expr("CAST(bit_count(qs ^ cs) AS BIGINT)"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("hd"), col("cid"))).cast("bigint"))
          .filter(col("rn") <= 5)
          .select(col("qid"), col("cid"), col("hd"), col("rn"))
      },
      Some("""WITH bits AS (SELECT vec_id, i.i AS i,
        |    CASE WHEN embedding[i.i::INT + 1] > 0 THEN (1::BIGINT << i.i::INT)
        |         ELSE 0::BIGINT END AS b
        |  FROM embeddings, (SELECT range AS i FROM range(0, 60)) i),
        |packed AS (SELECT vec_id, sum(b)::BIGINT AS sig FROM bits GROUP BY vec_id),
        |scored AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
        |    bit_count(xor(q.sig, c.sig))::BIGINT AS hd
        |  FROM packed q JOIN packed c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |ranked AS (SELECT qid, cid, hd, row_number() OVER (
        |    PARTITION BY qid ORDER BY hd, cid)::BIGINT AS rn FROM scored)
        |SELECT qid, cid, hd, rn FROM ranked WHERE rn <= 5""".stripMargin),
      "Binary-sign embedding compaction: 60 sign bits packed into one " +
        "int64 (256x smaller than the float vector), Hamming top-5 via " +
        "xor+bit_count — 2 ALU ops per comparison, fully codegen'd. The " +
        "memory-bound rerank prefilter for billion-vector ANN; the " +
        "float-cosine rerank of the survivors is cosine_topk."),

    // ------------------------------------- content-defined chunking
    QueryDef(
      "cdc_chunk_boundaries",
      (s, d) => {
        val toks = docs(s, d).select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
          .withColumn("h", pmod(
            conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"), lit(P)))
          .withColumn("bflag", when(pmod(col("h"), lit(32)) === 0, 1L).otherwise(0L))
        toks
          .withColumn("chunk_id", sum(col("bflag")).over(
            Window.partitionBy(col("doc_id")).orderBy(col("pos"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("doc_id"), col("chunk_id"))
          .agg(count(lit(1)).as("n_toks"), sum(col("h")).as("fp"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, i.i AS pos,
        |    ((('0x' || substr(md5(string_split(text, ' ')[i.i + 1]), 1, 8))::BIGINT) % $P) AS h
        |  FROM documents, (SELECT range AS i FROM range(0, 4096)) i
        |  WHERE i.i < len(string_split(text, ' '))),
        |flagged AS (SELECT doc_id, pos, h,
        |    CASE WHEN h % 32 = 0 THEN 1 ELSE 0 END AS bflag FROM toks),
        |chunked AS (SELECT doc_id, h, sum(bflag) OVER (
        |    PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk_id
        |  FROM flagged)
        |SELECT doc_id, chunk_id::BIGINT AS chunk_id, count(*)::BIGINT AS n_toks,
        |       sum(h)::BIGINT AS fp
        |FROM chunked GROUP BY doc_id, chunk_id""".stripMargin),
      "Content-defined chunking: per-token 31-bit hash, boundary where " +
        "hash % 32 == 0, chunk id by running boundary count, one " +
        "fingerprint per chunk. Boundaries depend only on content, so " +
        "insertions shift chunk ids but not downstream chunk hashes — " +
        "the property that makes chunk-level dedup robust to edits. " +
        "Window + agg share the doc_id partitioning: one shuffle."),

    // ---------------------------------------- time-decayed activity
    QueryDef(
      "decayed_user_activity",
      (s, d) => Tables.events(s, d)
        .select(col("user_id"),
          expr("datediff(DATE'2024-01-31', to_date(ts))").as("days"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(expr("CASE WHEN days BETWEEN 0 AND 62 " +
            "THEN shiftright(2147483648L, days) ELSE 0L END")).as("decay_score")),
      Some("""SELECT user_id, count(*)::BIGINT AS n_events,
        | sum(CASE WHEN date_diff('day', ts::DATE, DATE '2024-01-31') BETWEEN 0 AND 62
        |     THEN (2147483648::BIGINT >> date_diff('day', ts::DATE, DATE '2024-01-31'))
        |     ELSE 0 END)::BIGINT AS decay_score
        |FROM events GROUP BY user_id""".stripMargin),
      "Half-life-per-day decayed activity score: weight 2^(31-days) is " +
        "an exact power of two, so the decayed sum is pure integer — " +
        "order-independent, partial-aggregatable, no float drift. The " +
        "recency-weighted engagement signal for mixture weighting, as " +
        "one map-side-combinable aggregation."),

    // ----------------------------------------------- 2-D Pareto skyline
    QueryDef(
      "skyline_pareto",
      (s, d) => {
        val base = docs(s, d)
          .withColumn("wlen_sum", expr(wlenSumExpr))
          .withColumn("quality_e3", expr(
            "(wlen_sum * 1000) div CAST(size(split(text, ' ')) AS BIGINT)"))
        val pairs = base.groupBy(col("n_chars"), col("quality_e3"))
          .agg(min(col("doc_id")).as("min_doc"), count(lit(1)).as("n_docs"))
        // Distinct metric pairs sorted (x desc, y desc): a pair is on the
        // skyline iff its y strictly exceeds every preceding y — any
        // dominator sorts strictly earlier and carries y' >= y. The
        // strictly-preceding running max executes as ScalablePrefix
        // (range partition + offset merge, exclusive frame) — the pair
        // lattice is value-domain-sized but never single-partitions.
        graft.operators.ScalablePrefix.withRunningAggs(pairs,
            Seq(col("n_chars").desc, col("quality_e3").desc),
            Seq("quality_e3" -> "max"), 8, exclusive = true)
          .filter(col("cum_quality_e3").isNull ||
            col("quality_e3") > col("cum_quality_e3"))
          .select(col("n_chars"), col("quality_e3"), col("min_doc"), col("n_docs"))
      },
      Some(s"""WITH base AS (SELECT doc_id, n_chars,
        |   ($wlenSumSql * 1000) // len(string_split(text, ' ')) AS quality_e3
        | FROM documents),
        |pairs AS (SELECT n_chars, quality_e3, min(doc_id) AS min_doc,
        |    count(*)::BIGINT AS n_docs
        |  FROM base GROUP BY n_chars, quality_e3),
        |scanned AS (SELECT n_chars, quality_e3, min_doc, n_docs,
        |    max(quality_e3) OVER (ORDER BY n_chars DESC, quality_e3 DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
        |  FROM pairs)
        |SELECT n_chars, quality_e3, min_doc, n_docs
        |FROM scanned WHERE prevmax IS NULL OR quality_e3 > prevmax""".stripMargin),
      "Pareto skyline over (length, quality): dedupe metric pairs, sort " +
        "desc, keep rows whose y beats the running max — the sort-scan " +
        "skyline. At scale the agg first collapses to distinct metric " +
        "pairs (tiny), so the global window sorts the pair space, not " +
        "the corpus; a per-partition local skyline pre-filter keeps the " +
        "pair space bounded under adversarial metric cardinality."))
}
