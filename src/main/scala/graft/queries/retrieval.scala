package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Retrieval-index construction over the corpus: inverted-index posting
  * lists, exact phrase search through a positional index, and
  * IDF-weighted set similarity.  The reference's retrieval layer
  * (rag_evaluation/RAG-eval-test_model.py:123-137) regex-scans every
  * document per query keyword — a full corpus pass per query; an
  * inverted index is the engine-native structure that turns that scan
  * into a posting-list lookup, and the index build itself is the
  * shuffle-heavy batch job that must scale.
  */
object RetrievalQueries {

  /** Distinct 5-gram shingle sets over a deterministic 1-in-5 slice of
    * the dup-injected corpus (the fixture's 31-word vocabulary makes
    * every unigram common; shingles restore a rare-feature tail). */
  private def shingleSets(s: org.apache.spark.sql.SparkSession, d: String) =
    // Per-doc DISTINCT moved scan-side through the native DistinctGrams
    // kernel (r15): the old explode + .distinct() shuffled the whole
    // gram-string stream to remove within-doc repeats that each row
    // already owned, and built every gram in an interpreted HOF lambda
    // (5 element_at lookups + concat_ws per gram).  Same (doc_id, sh)
    // row set — concat_ws(' ', 5 raw tokens) is exactly the joined
    // token byte range, GramKernelSpec pins string parity — with NO
    // pre-candidate exchange.  Kept lazy (measured, round 14): the
    // consumers all sit inside ONE action, where runtime exchange reuse
    // already deduplicates the repeated subtrees.
    graft.Corpus.withDups(s, d)
      .filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"), explode(
        graft.functions.GramKernel.distinctGrams(col("text"), 5)).as("sh"))

  private val shingleSetsSql: String =
    s"""corpus AS (${graft.Corpus.cte}),
      |t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |      FROM corpus WHERE doc_id % 5 = 0
      |        AND len(string_split(text, ' ')) >= 5),
      |toksd AS (SELECT DISTINCT doc_id,
      |    toks[i.i] || ' ' || toks[i.i+1] || ' ' || toks[i.i+2] || ' ' ||
      |      toks[i.i+3] || ' ' || toks[i.i+4] AS sh
      |  FROM t, (SELECT range AS i FROM range(1, 4096)) i
      |  WHERE i.i <= len(toks) - 4)""".stripMargin

  /** Candidate (a, b) doc pairs sharing a shingle with df in [2, 3] —
    * rare-feature blocking bounds candidates at C(3,2) per shingle. */
  private def blockedPairs(toksD: org.apache.spark.sql.DataFrame) = {
    val rare = toksD.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= 3).select(col("sh"))
    val byRare = toksD.join(rare, "sh")
    byRare.as("l").join(byRare.as("r"),
        col("l.sh") === col("r.sh") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .distinct()
  }

  private val blockedPairsSql: String =
    """dfs AS (SELECT sh, count(*)::BIGINT AS df FROM toksd GROUP BY sh),
      |rare AS (SELECT sh FROM dfs WHERE df BETWEEN 2 AND 3),
      |byrare AS (SELECT d.doc_id, d.sh FROM toksd d JOIN rare USING (sh)),
      |pairs AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      |          FROM byrare l JOIN byrare r
      |            ON l.sh = r.sh AND l.doc_id < r.doc_id)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // -------------------------------------------- inverted index
    QueryDef(
      "inverted_index_postings",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .filter(length(col("tok")) >= 4)
        val tf = toks.groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("tf"))
        tf.groupBy(col("tok")).agg(
            count(lit(1)).as("df"),
            sum(col("tf")).as("tf_total"),
            slice(sort_array(collect_list(col("doc_id"))), 1, 8)
              .as("postings_arr"))
          .filter(col("df") >= 2)
          // CSV-stringified head: scalar-sortable rows for the oracle
          // hash-compare (pandas can't sort ndarray cells).
          .select(col("tok"), col("df"), col("tf_total"),
            expr("array_join(transform(postings_arr, x -> cast(x AS string)), ',')")
              .as("postings_head"))
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, t.tok FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents) t
        |  WHERE length(t.tok) >= 4),
        |tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf
        |       FROM toks GROUP BY doc_id, tok)
        |SELECT tok, count(*)::BIGINT AS df, sum(tf)::BIGINT AS tf_total,
        |  array_to_string((list(doc_id ORDER BY doc_id))[1:8], ',') AS postings_head
        |FROM tf GROUP BY tok HAVING count(*) >= 2""".stripMargin),
      "Inverted-index build: term -> document frequency, total term " +
        "frequency, and the head of the sorted posting list. Two " +
        "shuffles — (doc,term) tf then term — both partial-" +
        "aggregatable; posting lists are collected per term so the " +
        "reduce-side state is bounded by df, and the stored head is " +
        "capped at 8 (full lists would be written bucketed-by-term at " +
        "100 TB, turning query-time lookups into pruned single-bucket " +
        "reads). Replaces the reference's per-query corpus regex scan " +
        "(RAG-eval-test_model.py:130-137) with an indexed lookup."),

    // ------------------------------------------------ phrase search
    QueryDef(
      "phrase_bigram_search",
      (s, d) => {
        val t = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .filter(size(col("toks")) >= 2)
        // positional bigram index; toks is a materialized child column so
        // the element_at lookups inside the lambda are O(1) each (see
        // DedupQueries.shingles for the inline-split O(n^2) trap)
        val bg = t.select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(toks) - 1), i -> " +
              "struct(CAST(i AS BIGINT) AS pos, " +
              "concat(element_at(toks, i), ' ', element_at(toks, i + 1)) AS bg))"))
            .as("x"))
          .select(col("doc_id"), col("x.pos").as("pos"), col("x.bg").as("bg"))
        // phase 1: the globally most frequent bigram (deterministic
        // tie-break); phase 2: positional hits via a 1-row broadcast join
        val top = bg.groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("bg")).limit(1).select(col("bg"))
        bg.join(broadcast(top), "bg")
          .select(col("doc_id"), col("pos"), col("bg"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |bgs AS (SELECT doc_id, i.i::BIGINT AS pos,
        |          toks[i.i] || ' ' || toks[i.i + 1] AS bg
        |        FROM t, (SELECT range AS i FROM range(1, 4096)) i
        |        WHERE i.i <= len(toks) - 1),
        |top AS (SELECT bg FROM (SELECT bg, count(*) AS cnt FROM bgs
        |          GROUP BY bg ORDER BY cnt DESC, bg LIMIT 1))
        |SELECT b.doc_id, b.pos, b.bg FROM bgs b JOIN top USING (bg)""".stripMargin),
      "Exact phrase search via a positional bigram index: phase 1 finds " +
        "the corpus's most frequent bigram (stand-in for a user phrase; " +
        "deterministic tie-break), phase 2 returns every (doc, position) " +
        "hit. The phrase row is broadcast into an equi-join on the bigram " +
        "key — a hash probe per index row, no NL join, no per-query " +
        "corpus rescan. Longer phrases chain position+1 self-joins on " +
        "the same index."),

    // ----------------------------------- IDF-weighted set similarity
    QueryDef(
      "idf_weighted_jaccard",
      (s, d) => {
        val toksD = shingleSets(s, d)
        val w = toksD.groupBy(col("sh"))
          .agg(count(lit(1)).as("df"))
          .withColumn("w", expr("1000000000 div df"))
        val pairs = blockedPairs(toksD)
        val tokW = toksD.join(w.select(col("sh"), col("w")), "sh")
        val docW = tokW.groupBy(col("doc_id")).agg(sum(col("w")).as("sw"))
        val inter = pairs
          .join(tokW.as("ta"), col("a") === col("ta.doc_id"))
          .join(tokW.as("tb"),
            col("b") === col("tb.doc_id") && col("ta.sh") === col("tb.sh"))
          .groupBy(col("a"), col("b")).agg(sum(col("ta.w")).as("swi"))
        pairs
          .join(inter, Seq("a", "b"), "left")
          .join(docW.as("wa"), col("a") === col("wa.doc_id"))
          .join(docW.as("wb"), col("b") === col("wb.doc_id"))
          .select(col("a"), col("b"),
            expr("(1000 * coalesce(swi, 0L)) div " +
              "(wa.sw + wb.sw - coalesce(swi, 0L))").as("wj_permille"))
      },
      Some(s"""WITH $shingleSetsSql,
        |$blockedPairsSql,
        |w AS (SELECT sh, df, (1000000000 // df)::BIGINT AS w FROM dfs),
        |tokw AS (SELECT d.doc_id, d.sh, w.w FROM toksd d JOIN w USING (sh)),
        |docw AS (SELECT doc_id, sum(w)::BIGINT AS sw FROM tokw GROUP BY doc_id),
        |inter AS (SELECT p.a, p.b, sum(ta.w)::BIGINT AS swi
        |          FROM pairs p
        |          JOIN tokw ta ON ta.doc_id = p.a
        |          JOIN tokw tb ON tb.doc_id = p.b AND ta.sh = tb.sh
        |          GROUP BY p.a, p.b)
        |SELECT p.a, p.b,
        |  ((1000 * coalesce(i.swi, 0)) //
        |   (wa.sw + wb.sw - coalesce(i.swi, 0)))::BIGINT AS wj_permille
        |FROM pairs p
        |LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
        |JOIN docw wa ON wa.doc_id = p.a
        |JOIN docw wb ON wb.doc_id = p.b""".stripMargin),
      "IDF-weighted Jaccard over rare-shingle-blocked candidate pairs: " +
        "rare shared features are a far stronger near-dup/plagiarism " +
        "signal than raw overlap, and the integer weight 1e9 div df is " +
        "monotone in idf without cross-engine ln() rounding. Blocking " +
        "on df in [2,3] bounds candidates per shingle at C(3,2) (same " +
        "principle as LSH banding: only feature-collided pairs are " +
        "scored); every join is an equi-join on shingle or doc_id — no " +
        "quadratic stage anywhere, so the shape survives 100 TB with " +
        "the blocking band and shingle width as the knobs."),

    // ------------------------------------ asymmetric containment
    QueryDef(
      "shingle_containment_pairs",
      (s, d) => {
        val toksD = shingleSets(s, d)
        val pairs = blockedPairs(toksD)
        val sizes = toksD.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
        val inter = pairs
          .join(toksD.as("ta"), col("a") === col("ta.doc_id"))
          .join(toksD.as("tb"),
            col("b") === col("tb.doc_id") && col("ta.sh") === col("tb.sh"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("ni"))
        inter
          .join(sizes.as("sa"), col("a") === col("sa.doc_id"))
          .join(sizes.as("sb"), col("b") === col("sb.doc_id"))
          .select(col("a"), col("b"),
            expr("(1000 * ni) div sa.nsh").as("containment_a_permille"),
            expr("(1000 * ni) div sb.nsh").as("containment_b_permille"))
      },
      Some(s"""WITH $shingleSetsSql,
        |$blockedPairsSql,
        |sizes AS (SELECT doc_id, count(*)::BIGINT AS nsh
        |          FROM toksd GROUP BY doc_id),
        |inter AS (SELECT p.a, p.b, count(*)::BIGINT AS ni
        |          FROM pairs p
        |          JOIN toksd ta ON ta.doc_id = p.a
        |          JOIN toksd tb ON tb.doc_id = p.b AND ta.sh = tb.sh
        |          GROUP BY p.a, p.b)
        |SELECT i.a, i.b,
        |  ((1000 * i.ni) // sa.nsh)::BIGINT AS containment_a_permille,
        |  ((1000 * i.ni) // sb.nsh)::BIGINT AS containment_b_permille
        |FROM inter i
        |JOIN sizes sa ON sa.doc_id = i.a
        |JOIN sizes sb ON sb.doc_id = i.b""".stripMargin),
      "Asymmetric containment (|A∩B|/|A| vs /|B|) over the same " +
        "rare-shingle-blocked candidates as idf_weighted_jaccard: " +
        "catches sub-document duplication — quotation, boilerplate " +
        "embedding, truncated re-crawls — that symmetric Jaccard " +
        "under-scores (a 90%-prefix truncation has containment ~1000 " +
        "from the short side but Jaccard ~900). Same bounded blocking " +
        "and equi-join shape; only the final scoring differs, and " +
        "Catalyst shares the shingle/pair subtrees when both run."),

    // ------------------------------ Jaro-Winkler fuzzy matching
    QueryDef(
      "fuzzy_match_jw",
      (s, d) => {
        // Sorted-neighborhood candidates WITHOUT the lang-partitioned
        // lead() window (corpus/|lang| rows per task): a ScalableIndex
        // dense index over the total order (lang, key, doc_id) makes
        // "next 1/2 neighbors within my lang" an equi-join on idx+off —
        // fine-grained long keys, one shuffle, every lang split across
        // tasks.  The lang equality keeps pairs from crossing the
        // language boundary, exactly like the partitioned lead().
        val k = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            substring(col("text"), 1, 40).as("key"))
        val idxd = graft.operators.ScalableIndex.withDenseIndex(
          k, Seq(col("lang"), col("key"), col("doc_id")), 8, "idx")
        val lhs = idxd
          .withColumn("off", explode(array(lit(1L), lit(2L))))
          .select(col("doc_id").as("a"), col("lang"), col("key"),
            (col("idx") + col("off")).as("nidx"))
        val rhs = idxd.select(col("doc_id").as("b"),
          col("lang").as("nlang"), col("key").as("nkey"),
          col("idx").as("nidx"))
        lhs.join(rhs, Seq("nidx"))
          .filter(col("lang") === col("nlang"))
          .select(col("a"), col("b"),
            floor(graft.functions.JaroWinkler
              .jaroWinkler(col("key"), col("nkey")) * 1000000)
              .cast("long").as("jw_e6"))
      },
      Some("""WITH k AS (SELECT doc_id, lang, substr(text, 1, 40) AS key
        |        FROM documents),
        |o AS (SELECT doc_id, key,
        |    lead(doc_id, 1) OVER w AS n1, lead(key, 1) OVER w AS k1,
        |    lead(doc_id, 2) OVER w AS n2, lead(key, 2) OVER w AS k2
        |  FROM k WINDOW w AS (PARTITION BY lang ORDER BY key, doc_id)),
        |pairs AS (
        |  SELECT doc_id AS a, n1 AS b, key, k1 AS nkey FROM o WHERE n1 IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, n2, key, k2 FROM o WHERE n2 IS NOT NULL)
        |SELECT a, b,
        |  floor(jaro_winkler_similarity(key, nkey) * 1000000)::BIGINT AS jw_e6
        |FROM pairs""".stripMargin),
      "Jaro-Winkler fuzzy matching over sorted-neighborhood blocks: " +
        "per-lang lexicographic sort on a 40-char key, each record " +
        "scored against its next 2 neighbors — neighbors come from a " +
        "ScalableIndex dense index joined on idx+1/idx+2 (range " +
        "exchange + fine-grained equi-join, no enum-partitioned lead " +
        "window) — with the native JaroWinklerSimilarity expression " +
        "(whole-stage codegen calling a static kernel — no UDF " +
        "serialization). The kernel is " +
        "bit-identical to DuckDB's jaro_winkler_similarity (floored " +
        "half-transpositions, 0.7 boost threshold — pinned on 11k " +
        "pairs), so the oracle is full hash parity, not rows-only. " +
        "Candidates are linear in corpus size (2 per record) — the " +
        "sorted-neighborhood alternative to LSH when the match key " +
        "sorts near-duplicates adjacently."),
  )
}
