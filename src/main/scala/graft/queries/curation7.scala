package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Round-4 continuation batch: corpus-fingerprinting, retrieval-quality
  * and collocation operators a 100 TB curation pipeline runs between
  * ingest and training.
  *
  *  - winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003) local document
  *    fingerprints — the guaranteed-coverage alternative to MinHash for
  *    sub-document (plagiarism-style) overlap over regenerated narratives
  *    (data_generation/generate_narratives_from_data.py:79-96);
  *  - MAP@20 — completes the retrieval-eval metric family next to the
  *    MRR-style avg_first_hit_rank (rag_evaluation/RAG-eval-test_model
  *    .py:137-153);
  *  - PMI collocations — corpus-level bigram association mining;
  *  - overlap-graph edges over content chunks — the OLC-assembly
  *    stage-1 shape (suffix/prefix overlap join) applied to the V1
  *    chunker output (RAG-eval-test_model.py:239-240);
  *  - Gopher-style duplicate-character repetition signals (Rae et al.
  *    2021 §A1.1) next to the distinct-share text_repetition_ratio.
  *
  * All arithmetic is integer / fixed-point (floor div both engines), all
  * hashes md5-derived — bit-parity with the DuckDB oracle by
  * construction, and results independent of partitioning at any scale.
  */
object Curation7Queries {

  private val P = 2147483647L // 2^31 - 1, same 31-bit hash space as dedup

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------ winnowing
    QueryDef(
      "winnow_fingerprints",
      (s, d) => graft.Scratch.spread(Tables.documents(s, d)
          .filter(length(col("text")) >= 8 + 4 - 1)
          .select(col("doc_id"), col("text")))
        .select(col("doc_id"),
          graft.functions.WinnowKernel.winnowFps(col("text")).as("fps"))
        // the kernel returns the SORTED distinct fingerprint set, so
        // count/min/max are row-local array ops — no window, no re-agg
        .select(col("doc_id"),
          size(col("fps")).cast("bigint").as("n_fps"),
          element_at(col("fps"), 1).as("fp_min"),
          element_at(col("fps"), -1).as("fp_max")),
      Some(s"""WITH pos AS (
        |  SELECT doc_id, text, (i.i + 1)::INT AS pos,
        |         length(text) - 7 AS npos
        |  FROM documents, (SELECT range AS i FROM range(0, 4096)) i
        |  WHERE length(text) >= 11 AND i.i < length(text) - 7),
        |h AS (SELECT doc_id, pos, npos,
        |        (('0x' || substr(md5(substr(text, pos, 8)), 1, 8))::BIGINT
        |          % $P) AS h
        |      FROM pos),
        |wm AS (SELECT doc_id, pos, npos,
        |         min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
        |       FROM h)
        |SELECT doc_id, count(DISTINCT wmin)::BIGINT AS n_fps,
        |       min(wmin) AS fp_min, max(wmin) AS fp_max
        |FROM wm WHERE pos <= npos - 3 GROUP BY doc_id""".stripMargin),
      "Winnowing (Schleimer et al. 2003): char 8-gram 31-bit hashes, " +
        "window w=4 minimum selection, distinct fingerprint set per doc " +
        "— guarantees any >= k+w-1 char shared span yields a shared " +
        "fingerprint (MinHash gives no such per-span guarantee). Narrow " +
        "ops until the per-doc agg: one shuffle on doc_id. At 100 TB " +
        "the fingerprint rows (not shown) join on fp value to find " +
        "sub-document overlap — the MOSS layout."),

    // ------------------------------------------------ MAP@20
    QueryDef(
      "map_at_20",
      (s, d) => {
        val top = VectorQueries.rankedRelevant(s, d)
          .filter(col("rank") <= 20)
          .withColumn("cum_rel",
            sum(when(col("relevant"), lit(1L)).otherwise(lit(0L))).over(
              Window.partitionBy(col("qid")).orderBy(col("rank"))
                .rowsBetween(Window.unboundedPreceding, 0)))
        top.groupBy(col("qid"))
          .agg(
            coalesce(sum(when(col("relevant"),
              expr("(cum_rel * 1000000) div rank"))), lit(0L)).as("psum"),
            sum(when(col("relevant"), lit(1L)).otherwise(lit(0L)))
              .as("nrel"))
          .select(col("qid"), col("nrel"),
            when(col("nrel") === 0, lit(0L))
              .otherwise(expr("psum div nrel")).as("ap_e6"))
      },
      Some(s"""WITH ${VectorQueries.rankedRelevantSql},
        |topk AS (SELECT qid, rank, relevant,
        |    (sum(CASE WHEN relevant THEN 1 ELSE 0 END) OVER (
        |       PARTITION BY qid ORDER BY rank))::BIGINT AS cum_rel
        |  FROM ranked WHERE rank <= 20),
        |per AS (SELECT qid,
        |    coalesce(sum(CASE WHEN relevant
        |                      THEN (cum_rel * 1000000) // rank END),
        |             0)::BIGINT AS psum,
        |    sum(CASE WHEN relevant THEN 1 ELSE 0 END)::BIGINT AS nrel
        |  FROM topk GROUP BY qid)
        |SELECT qid, nrel,
        |       (CASE WHEN nrel = 0 THEN 0 ELSE psum // nrel END)::BIGINT
        |         AS ap_e6
        |FROM per""".stripMargin),
      "Average precision at k=20 per query over the flagship ranked " +
        "retrieval (RAG-eval-test_model.py:137-153): precision@i summed " +
        "at relevant positions, normalized by relevant-in-topk; zero-hit " +
        "queries score 0 (TREC convention). All terms are integer floor " +
        "divisions at e6 scale — order-independent and engine-exact, " +
        "unlike a float mean of fractions."),

    // ------------------------------------------------ PMI collocations
    QueryDef(
      "collocation_pmi",
      (s, d) => {
        val toks = split(col("text"), " ")
        val n = size(toks)
        val docs = Tables.documents(s, d)
        val uni = docs.select(explode(toks).as("x"))
          .groupBy(col("x")).agg(count(lit(1)).as("cx"))
        val bi = docs.filter(n >= 2)
          .select(explode(zip_with(
            slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
            (a, b) => struct(a.as("x"), b.as("y")))).as("p"))
          .select(col("p.x").as("x"), col("p.y").as("y"))
          .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
        val nu = uni.agg(sum(col("cx")).as("nu"))
        val nb = bi.agg(sum(col("cxy")).as("nb"))
        bi.filter(col("cxy") >= 3)
          .join(broadcast(uni), Seq("x"))
          .join(broadcast(uni.select(col("x").as("y"), col("cx").as("cy"))),
            Seq("y"))
          .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
          .withColumn("score_e3",
            expr("(cxy * nu * nu * 1000) div (nb * cx * cy)"))
          .withColumn("rn", row_number().over(
            Window.orderBy(col("score_e3").desc, col("x"), col("y"))))
          .filter(col("rn") <= 20)
          .select(col("x"), col("y"), col("cxy"), col("score_e3"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |               FROM documents),
        |uni AS (SELECT t[i.i + 1] AS x
        |        FROM toks, (SELECT range AS i FROM range(0, 4096)) i
        |        WHERE i.i < len(t)),
        |cu AS (SELECT x, count(*)::BIGINT AS cx FROM uni GROUP BY x),
        |bi AS (SELECT t[i.i + 1] AS x, t[i.i + 2] AS y
        |       FROM toks, (SELECT range AS i FROM range(0, 4096)) i
        |       WHERE len(t) >= 2 AND i.i < len(t) - 1),
        |cb AS (SELECT x, y, count(*)::BIGINT AS cxy FROM bi GROUP BY x, y),
        |tot AS (SELECT (SELECT count(*) FROM uni)::BIGINT AS nu,
        |               (SELECT count(*) FROM bi)::BIGINT AS nb),
        |scored AS (SELECT cb.x, cb.y, cxy,
        |    (cxy * nu * nu * 1000) // (nb * cux.cx * cuy.cx) AS score_e3
        |  FROM cb JOIN cu cux ON cb.x = cux.x
        |          JOIN cu cuy ON cb.y = cuy.x, tot
        |  WHERE cxy >= 3),
        |ranked AS (SELECT x, y, cxy, score_e3, row_number() OVER (
        |             ORDER BY score_e3 DESC, x, y) AS rn
        |           FROM scored)
        |SELECT x, y, cxy, score_e3::BIGINT AS score_e3
        |FROM ranked WHERE rn <= 20""".stripMargin),
      "Top-20 bigram collocations by a PMI-proportional integer score: " +
        "c(xy)*N_uni^2*1000 div (N_bi*c(x)*c(y)) — the log is monotone, " +
        "so ranking by the ratio ranks by PMI with zero float ops. " +
        "Unigram table broadcast (vocab << corpus); global top-k via " +
        "rank window benefits from InferWindowGroupLimit's per-partition " +
        "limit pushdown. At 100 TB counts move to 128-bit / log-space; " +
        "the min-support filter (c >= 3) prunes the long tail before " +
        "the join."),

    // ------------------------------------------------ overlap graph
    QueryDef(
      "overlap_graph_edges",
      (s, d) => {
        val ch = VectorQueries.chunks(s, d)
        val src = ch.filter(length(col("chunk")) === 256)
          .select(col("doc_id").as("src_doc"),
            col("chunk_idx").as("src_idx"),
            md5(expr("substring(chunk, 157, 100)")).as("okey"))
        val dst = ch.filter(length(col("chunk")) >= 100)
          .select(col("doc_id").as("dst_doc"),
            col("chunk_idx").as("dst_idx"),
            md5(expr("substring(chunk, 1, 100)")).as("okey"))
        src.join(dst, Seq("okey"))
          .filter(!(col("src_doc") === col("dst_doc") &&
            col("src_idx") === col("dst_idx")))
          .select(col("src_doc"), col("src_idx"),
            col("dst_doc"), col("dst_idx"))
      },
      Some(s"""WITH c AS (SELECT * FROM ${VectorQueries.chunksSql}),
        |src AS (SELECT doc_id AS src_doc, chunk_idx AS src_idx,
        |          md5(substr(chunk, 157, 100)) AS okey
        |        FROM c WHERE length(chunk) = 256),
        |dst AS (SELECT doc_id AS dst_doc, chunk_idx AS dst_idx,
        |          md5(substr(chunk, 1, 100)) AS okey
        |        FROM c WHERE length(chunk) >= 100)
        |SELECT src_doc, src_idx, dst_doc, dst_idx
        |FROM src JOIN dst USING (okey)
        |WHERE NOT (src_doc = dst_doc AND src_idx = dst_idx)""".stripMargin),
      "Overlap-graph construction over the V1 chunker output " +
        "(RAG-eval-test_model.py:239-240): an edge where a full chunk's " +
        "100-char suffix equals another chunk's 100-char prefix — the " +
        "suffix/prefix overlap join of OLC genome assembly, here " +
        "recovering chunk adjacency from an unordered chunk set. Joining " +
        "on md5(span) shuffles 32-byte digests instead of 100-char " +
        "spans; both engines hash identically so parity is by " +
        "construction."),

    // ------------------------------------------------ Gopher dup chars
    QueryDef(
      "gopher_repetition_chars",
      (s, d) => {
        // Both signals are PER-DOCUMENT, so they are computed scan-side
        // by the native BigramRepStats kernel (one pass over the
        // document bytes, per-doc bigram census in a local hash map;
        // GramKernelSpec pins parity incl. codepoint lengths): the old
        // explode + two groupBys shuffled the entire bigram-string
        // stream to aggregate values each row already owned.  Zero
        // exchanges at any scale.
        Tables.documents(s, d)
          .select(col("doc_id"),
            length(col("text")).cast("bigint").as("tlen"),
            graft.functions.GramKernel.bigramRepStats(col("text")).as("r"))
          .filter(col("r").isNotNull)
          .select(col("doc_id"),
            expr("(r.dup_chars * 1000) div tlen").as("dup2_char_permille"),
            expr("(r.top_chars * 1000) div tlen").as("top2_char_permille"))
      },
      Some("""WITH grams AS (
        |  SELECT doc_id, length(text)::BIGINT AS tlen,
        |         concat(toks[i.i + 1], ' ', toks[i.i + 2]) AS g
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks
        |        FROM documents),
        |       (SELECT range AS i FROM range(0, 4096)) i
        |  WHERE len(toks) >= 2 AND i.i < len(toks) - 1),
        |counted AS (SELECT doc_id, tlen, g, count(*)::BIGINT AS c
        |            FROM grams GROUP BY doc_id, tlen, g),
        |agg AS (SELECT doc_id, tlen,
        |    coalesce(sum(CASE WHEN c >= 2 THEN c * length(g) END),
        |             0)::BIGINT AS dup_chars,
        |    max(c * length(g))::BIGINT AS top_chars
        |  FROM counted GROUP BY doc_id, tlen)
        |SELECT doc_id, (dup_chars * 1000) // tlen AS dup2_char_permille,
        |       (top_chars * 1000) // tlen AS top2_char_permille
        |FROM agg""".stripMargin),
      "Gopher repetition signals (Rae et al. 2021 §A1.1) on the " +
        "character axis: permille of characters inside duplicated word " +
        "bigrams, and inside the single most char-covering bigram — " +
        "complements text_repetition_ratio's distinct-share. Values can " +
        "exceed 1000 on overlapping grams (documented, matches both " +
        "engines). Per-doc signals computed scan-side by the native " +
        "bigram census kernel — no gram stream leaves the scan stage."),
  )
}
