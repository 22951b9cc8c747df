package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 48: substring-level exact dedup (the ExactSubstr pass of
  * Lee et al., "Deduplicating Training Data Makes Language Models
  * Better", ACL 2022) and the combined IVF-PQ search path (coarse
  * inverted lists + asymmetric-distance re-rank, Jegou et al., TPAMI
  * 2011).  Both close gaps the existing families skirt: the dedup
  * family is document/line/fingerprint-grained (dedup_exact,
  * line_dedup_global, winnow_overlap_pairs sample positions rather
  * than prove maximal spans), and the ANN family has IVF and PQ-ADC
  * as separate queries but not the composed index the two exist for.
  */
object Curation48Queries {

  import Vector2Queries.{quant, quantSql, sqDist, sqDistSql}

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------ exact duplicated substrings
    QueryDef(
      "exact_substring_spans",
      (s, d) => {
        // Corpus: documents plus injected "quotation" docs that embed a
        // 40-token slice of every 20th document — the train-set-quotes-
        // the-web shape ExactSubstr dedup exists to catch.  Word-level
        // 5-grams with their positions; a gram is duplicated when it
        // appears in >= 2 distinct docs; duplicated gram start
        // positions then merge into maximal spans (two hits merge when
        // their k-token windows overlap or touch: pos gap <= k).
        val k = 5
        val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val corpus = base.unionByName(
          base.filter(pmod(col("doc_id"), lit(20)) === 0)
            .select((col("doc_id") + 10000L).as("doc_id"),
              expr("array_join(slice(split(text, ' '), 4, 40), ' ')")
                .as("text")))
        // The gram build runs through the native PosGrams generator
        // (one pass over the document bytes, 0-based positions matching
        // posexplode; GramKernelSpec pins parity) instead of the
        // interpreted transform/slice/array_join HOF.  The stream feeds
        // two consumers (the dup census and the probe side of the
        // survivor join) and is NOT materialized (r15 re-measure): with
        // the generator the rebuild is one cheap kernel pass, while the
        // r14 scratch parquet WROTE the k-x-corpus gram-string stream
        // every invocation — measured 1.48-1.81 s with the write vs
        // 1.18-1.58 s without, back to back.  At scale the census agg
        // and the probe join hash-partition on the same key over the
        // identical subtree, so runtime exchange reuse makes it one
        // pass with no k-x-corpus scratch I/O at all.
        val grams = corpus
          .select(col("doc_id"),
            graft.functions.GramKernel.posGrams(col("text"), k)
              .as(Seq("pos", "gram")))
        // shuffle #1 (the only data-sized one): gram -> distinct-doc
        // count.  At 100 TB this is the canonical shuffle-the-shingles
        // MapReduce form of ExactSubstr; gram strings could carry a
        // 64-bit hash instead, but exactness keeps the oracle exact.
        val dup = grams.groupBy(col("gram"))
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2)
          .select(col("gram"))
        val hits = grams.join(dup, "gram")
          .select(col("doc_id"), col("pos"))
        // gaps-and-islands per doc: window is partitioned by doc_id
        // (bounded by doc token count — never a global sort).
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        hits
          .withColumn("newspan",
            when(col("pos") - lag(col("pos"), 1).over(w) <= k, 0L)
              .otherwise(1L))
          .withColumn("island", sum(col("newspan")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("doc_id"), col("island"))
          .agg(min(col("pos")).cast("long").as("span_start"),
            (max(col("pos")) + (k - 1)).cast("long").as("span_end"),
            count(lit(1)).as("n_grams"))
          .select(col("doc_id"), col("span_start"), col("span_end"),
            col("n_grams"))
      },
      Some("""WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000 AS doc_id,
        |    array_to_string(string_split(text, ' ')[4:43], ' ') AS text
        |  FROM documents WHERE doc_id % 20 = 0),
        |tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus
        |        WHERE len(string_split(text, ' ')) >= 5),
        |grams AS (
        |  SELECT doc_id, i.i AS pos,
        |    array_to_string(toks[i.i + 1 : i.i + 5], ' ') AS gram
        |  FROM tok, (SELECT range AS i FROM range(0, 4096)) i
        |  WHERE i.i <= len(toks) - 5),
        |dup AS (SELECT gram FROM grams
        |        GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
        |hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)),
        |lagged AS (SELECT doc_id, pos,
        |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |  FROM hits),
        |isl AS (SELECT doc_id, pos,
        |    sum(CASE WHEN prev IS NOT NULL AND pos - prev <= 5
        |             THEN 0 ELSE 1 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |  FROM lagged)
        |SELECT doc_id, min(pos)::BIGINT AS span_start,
        |  (max(pos) + 4)::BIGINT AS span_end, count(*)::BIGINT AS n_grams
        |FROM isl GROUP BY doc_id, island""".stripMargin),
      "Substring-level exact dedup (ExactSubstr, Lee et al. ACL 2022): " +
        "positional word 5-grams, grams appearing in >= 2 distinct docs " +
        "mark duplicated regions, and overlapping/adjacent hits merge " +
        "into maximal spans by gaps-and-islands.  One data-sized " +
        "shuffle (gram -> doc count, the suffix-array stand-in that " +
        "actually distributes); the island window is per-doc bounded.  " +
        "Injected quotation docs prove both sides of a real duplicated " +
        "span are localized, with exact token coordinates."),

    // ------------------------------------------------ IVF-PQ combined
    QueryDef(
      "ivf_pq_topk",
      (s, d) => {
        // The composed index: coarse quantizer routes each vector to an
        // inverted list; queries probe their 2 nearest lists; candidates
        // are scored by PQ asymmetric distance (4 code lookups against a
        // per-query distance table), never by raw vectors.  Codebooks
        // and centroids are deterministic subsamples (swap-in point for
        // kmeans_cluster_assign's iterated centroids, as pq_encode
        // documents); all arithmetic on the e6 integer grid.
        // the quantized scan feeds FIVE consumers (cents, assign, sub,
        // probes, dt) — persist it once per the cache contract so the
        // parquet scan + float->e6 quantization run once, not five
        // times (measured 2.1-2.9 s -> see PLANS.md)
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), quant(col("embedding")).as("qe"))
          .persist()
        val cents = e.filter(pmod(col("vec_id"), lit(31)) === 7)
          .select(col("vec_id").as("ivf_cid"), col("qe").as("cvec"))
        // coarse assignment: min integer L2, ties to the lowest list id
        val assign = e.crossJoin(broadcast(cents))
          .select(col("vec_id"),
            struct(sqDist(col("qe"), col("cvec")).as("dist"),
              col("ivf_cid")).as("dc"))
          .groupBy(col("vec_id"))
          .agg(min(col("dc")).as("m"))
          .select(col("vec_id"), col("m.ivf_cid").as("list_id"))
        // PQ codes: 4 subspaces x 16 dims, codebook = first 8 vectors
        // the subvector explode feeds three consumers (cb, codes, dt)
        val sub = e.select(col("vec_id"),
            explode(sequence(lit(0), lit(3))).as("m"), col("qe"))
          .select(col("vec_id"), col("m"),
            expr("slice(qe, m * 16 + 1, 16)").as("sv"))
          .persist()
        val cb = sub.filter(col("vec_id") < 8)
          .select(col("m"), col("vec_id").as("cid"), col("sv").as("csub"))
        val codes = sub.join(broadcast(cb), "m")
          .select(col("vec_id"), col("m"),
            struct(sqDist(col("sv"), col("csub")).as("dist"),
              col("cid")).as("dc"))
          .groupBy(col("vec_id"), col("m"))
          .agg(min(col("dc")).as("mm"))
          .select(col("vec_id"), col("m"), col("mm.cid").as("code"))
        // queries: 6 probes x their top-2 coarse lists
        val probes = e.filter(col("vec_id") < 6).crossJoin(broadcast(cents))
          .select(col("vec_id").as("qid"),
            sqDist(col("qe"), col("cvec")).as("cdist"), col("ivf_cid"))
          .withColumn("crn", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("cdist"), col("ivf_cid"))))
          .filter(col("crn") <= 2)
          .select(col("qid"), col("ivf_cid").as("list_id"))
        // per-query ADC distance tables: 6 x 4 x 8 cells, broadcast
        val dt = sub.filter(col("vec_id") < 6)
          .select(col("vec_id").as("qid"), col("m").as("dm"),
            col("sv").as("qsv"))
          .join(broadcast(cb), col("dm") === col("m"))
          .select(col("qid"), col("dm"), col("cid"),
            sqDist(col("qsv"), col("csub")).as("dist"))
        // candidates = union of probed lists; scored by code lookups
        val cand = probes.join(assign, "list_id")
          .filter(col("qid") =!= col("vec_id"))
          .select(col("qid"), col("vec_id"))
        cand.join(codes, "vec_id")
          .join(broadcast(dt),
            col("dm") === col("m") && col("cid") === col("code") &&
              dt("qid") === cand("qid"))
          .groupBy(cand("qid").as("qid"), col("vec_id"))
          .agg(sum(col("dist")).as("adc_dist"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("adc_dist"), col("vec_id"))).cast("long"))
          .filter(col("rk") <= 5)
          .select(col("qid"), col("vec_id"), col("rk"), col("adc_dist"))
      },
      Some(s"""WITH q AS (SELECT vec_id,
        |    ${quantSql.format("embedding")} AS qe FROM embeddings),
        |cents AS (SELECT vec_id AS ivf_cid, qe AS cvec FROM q
        |          WHERE vec_id % 31 = 7),
        |assign AS (SELECT vec_id, ivf_cid AS list_id FROM (
        |    SELECT e.vec_id, c.ivf_cid, row_number() OVER (
        |        PARTITION BY e.vec_id
        |        ORDER BY ${sqDistSql("e.qe", "c.cvec")}, c.ivf_cid) AS rn
        |    FROM q e CROSS JOIN cents c) WHERE rn = 1),
        |sub AS (SELECT vec_id, m.m AS m,
        |    qe[m.m * 16 + 1 : m.m * 16 + 16] AS sv
        |  FROM q, (SELECT range AS m FROM range(0, 4)) m),
        |cb AS (SELECT m, vec_id AS cid, sv AS csub FROM sub
        |       WHERE vec_id < 8),
        |codes AS (SELECT vec_id, m, cid AS code FROM (
        |    SELECT s.vec_id, s.m, c.cid, row_number() OVER (
        |        PARTITION BY s.vec_id, s.m
        |        ORDER BY ${sqDistSql("s.sv", "c.csub")}, c.cid) AS rn
        |    FROM sub s JOIN cb c ON s.m = c.m) WHERE rn = 1),
        |probes AS (SELECT qid, ivf_cid AS list_id FROM (
        |    SELECT e.vec_id AS qid, c.ivf_cid, row_number() OVER (
        |        PARTITION BY e.vec_id
        |        ORDER BY ${sqDistSql("e.qe", "c.cvec")}, c.ivf_cid) AS crn
        |    FROM q e CROSS JOIN cents c WHERE e.vec_id < 6)
        |  WHERE crn <= 2),
        |dt AS (SELECT s.vec_id AS qid, s.m AS dm, c.cid,
        |    ${sqDistSql("s.sv", "c.csub")} AS dist
        |  FROM sub s JOIN cb c ON s.m = c.m WHERE s.vec_id < 6),
        |cand AS (SELECT p.qid, a.vec_id FROM probes p
        |  JOIN assign a ON p.list_id = a.list_id
        |  WHERE p.qid <> a.vec_id),
        |adc AS (SELECT cand.qid, cand.vec_id,
        |    sum(dt.dist)::BIGINT AS adc_dist
        |  FROM cand JOIN codes ON codes.vec_id = cand.vec_id
        |  JOIN dt ON dt.qid = cand.qid AND dt.dm = codes.m
        |         AND dt.cid = codes.code
        |  GROUP BY 1, 2)
        |SELECT qid, vec_id, rk, adc_dist FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid
        |    ORDER BY adc_dist, vec_id)::BIGINT AS rk FROM adc)
        |WHERE rk <= 5""".stripMargin),
      "The composed IVF-PQ index (Jegou et al., TPAMI 2011): coarse " +
        "quantizer routes vectors to inverted lists (broadcast " +
        "centroids, one narrow pass), queries probe their 2 nearest " +
        "lists, and candidates are scored by asymmetric distance — 4 " +
        "table lookups against a broadcast per-query 4x8 distance " +
        "table — never by raw vectors.  At 100 TB list_id is the " +
        "write-time partition column and the probe reads 2 partitions " +
        "of 4-byte codes: candidate I/O ~ lists-probed x code bytes, " +
        "while ann_ivf_topk (exact re-rank) and pq_adc_topk (full-" +
        "corpus ADC) each pay one of the two costs this query " +
        "composes away.  Integer-exact on the e6 grid end to end."),
  )
}
