package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.VectorOps._

/** §2.8 vector / array / text-chunking operators (V1–V6) plus the
  * similarity theta-join J5 and the §3.3 flagship retrieval-evaluation
  * pipeline (A1 avg_search_rank / A2 avg_first_hit_rank / V6 sentinel).
  *
  * Scale notes: the query side of every similarity join here is small
  * (a rubric of query terms / query vectors) and broadcast; the corpus
  * side streams.  At 100 TB the brute-force variants below are the
  * correctness baseline; AnnQueries adds the LSH-bucketed scale path.
  */
object VectorQueries {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)
  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  // chunk_size=256, chunk_overlap=100 -> stride 156
  // (rag_evaluation/RAG-eval-test_model.py:239-240).
  private val ChunkSize = 256
  private val Stride = 156

  /** documents -> overlapping chunks; shared by V1 and the dedup family. */
  def chunks(s: SparkSession, d: String): DataFrame = chunksOf(docs(s, d))

  /** The chunker over an arbitrary (doc_id, text, ...) frame — ONE
    * definition shared with the end-to-end scenario spec, which chunks
    * a VERSIONED corpus snapshot rather than the fixture table. */
  def chunksOf(in: DataFrame): DataFrame =
    in
      .withColumn("n_chunks",
        lit(1) + greatest(lit(0),
          ceil((length(col("text")) - ChunkSize) / Stride.toDouble).cast("int")))
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx").cast("bigint").as("chunk_idx"),
        expr(s"substring(text, 1 + chunk_idx * $Stride, $ChunkSize)").as("chunk"))

  val chunksSql: String =
    s"""(WITH n AS (SELECT doc_id, text,
       |   (1 + greatest(0, ceil((length(text) - $ChunkSize) / $Stride.0)::INT)) AS n_chunks
       |   FROM documents),
       | k AS (SELECT range AS chunk_idx FROM range(0, 64))
       | SELECT doc_id, k.chunk_idx::BIGINT AS chunk_idx,
       |        substr(text, (1 + k.chunk_idx * $Stride)::INT, $ChunkSize) AS chunk
       | FROM n, k WHERE k.chunk_idx < n.n_chunks) chunks""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- V1
    QueryDef(
      "chunk_text_overlap",
      (s, d) => chunks(s, d),
      Some(s"SELECT doc_id, chunk_idx, chunk FROM $chunksSql"),
      "RecursiveCharacterTextSplitter(256, overlap 100) " +
        "(RAG-eval-test_model.py:239-240) as a declarative " +
        "explode(sequence) + substring — stride-156 windows, no UDTF; " +
        "codegen'd end to end. chunk_text_recursive carries the " +
        "separator-faithful boundaries."),

    // ------------------------------------------------------ V1 (faithful)
    QueryDef(
      "chunk_text_recursive",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.RecursiveChunks
            .recursiveChunks(col("text"), 256, 100))
        .select(col("doc_id"), col("chunk_idx"),
          length(col("chunk")).cast("bigint").as("chunk_len"),
          col("chunk")),
      Some("""WITH RECURSIVE
        |wl AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |words AS (SELECT doc_id, unnest(ws) AS w,
        |          unnest(range(1, len(ws) + 1)) AS i FROM wl),
        |pre AS (SELECT doc_id, i,
        |    length(w) + CASE WHEN i > 1 THEN 1 ELSE 0 END AS L FROM words),
        |cum AS (SELECT doc_id, i, L,
        |    (sum(L) OVER (PARTITION BY doc_id ORDER BY i))::BIGINT AS cum,
        |    (sum(L) OVER (PARTITION BY doc_id ORDER BY i) - L)::BIGINT
        |      AS cumprev
        |  FROM pre),
        |nn AS (SELECT doc_id, max(i) AS n FROM cum GROUP BY doc_id),
        |tr1 AS (SELECT s.doc_id, s.i AS s, min(o.i) AS o
        |  FROM cum s JOIN cum o ON o.doc_id = s.doc_id
        |   AND o.i > s.i AND o.i <= s.i + 257 AND o.cum - s.cumprev > 256
        |  GROUP BY s.doc_id, s.i),
        |tr AS (SELECT t.doc_id, t.s, t.o, min(x.i) AS s2
        |  FROM tr1 t
        |  JOIN cum co ON co.doc_id = t.doc_id AND co.i = t.o
        |  JOIN cum x ON x.doc_id = t.doc_id AND x.i > t.s AND x.i <= t.o
        |   AND co.cumprev - x.cumprev <= 100 AND co.cum - x.cumprev <= 256
        |  GROUP BY t.doc_id, t.s, t.o),
        |rec AS (
        |  SELECT doc_id, 1 AS idx, 1 AS s FROM nn
        |  UNION ALL
        |  SELECT r.doc_id, r.idx + 1, t.s2 FROM rec r
        |  JOIN tr t ON t.doc_id = r.doc_id AND t.s = r.s),
        |chunks AS (SELECT r.doc_id, r.idx - 1 AS chunk_idx, r.s,
        |    coalesce(t.o - 1, nn.n) AS e
        |  FROM rec r
        |  LEFT JOIN tr t ON t.doc_id = r.doc_id AND t.s = r.s
        |  JOIN nn ON nn.doc_id = r.doc_id)
        |SELECT c.doc_id, c.chunk_idx::BIGINT AS chunk_idx,
        |  length(trim(array_to_string(wl.ws[c.s:c.e], ' ')))::BIGINT
        |    AS chunk_len,
        |  trim(array_to_string(wl.ws[c.s:c.e], ' ')) AS chunk
        |FROM chunks c JOIN wl ON wl.doc_id = c.doc_id""".stripMargin),
      "Separator-faithful RecursiveCharacterTextSplitter(256, 100) " +
        "(rag_evaluation/RAG-eval-test_model.py:239-240): paragraph -> " +
        "line -> word -> char fallback, keep-separator fragments, " +
        "greedy merge-until-256 with 100-char overlap carry — a native " +
        "Generator (RecursiveChunks), one row per chunk, narrow and " +
        "partition-parallel. The oracle mirrors the merge as a " +
        "prefix-sum transition table + recursive chain over word " +
        "fragments (exact on the fixture, whose text is single-line; " +
        "RecursiveChunkerSpec pins the multi-separator fallback " +
        "semantics on golden cases)."),

    // ---------------------------------------------------------------- V2
    QueryDef(
      "mean_pool_embedding",
      (s, d) => emb(s, d).select(
        col("vec_id"),
        meanPool(col("embedding")).as("mean_component")),
      Some("SELECT vec_id, " + meanPoolSql("embedding") +
        " AS mean_component FROM embeddings"),
      "Mean over the token axis (RAG-eval-test_model.py:81-83,109-111) as " +
        "a sequential HOF fold — bit-identical to the oracle's fold."),

    // ---------------------------------------------------------------- V3
    QueryDef(
      "l2_normalize",
      (s, d) => emb(s, d).select(
        col("vec_id"),
        element_at(l2Normalize(col("embedding")), 1).as("u0"),
        element_at(l2Normalize(col("embedding")), 2).as("u1"),
        floor(sqrt(norm2(transform(l2Normalize(col("embedding")),
          _.cast("float")))) * 1000).cast("bigint").as("unit_norm_e3")),
      Some(s"""SELECT vec_id,
        | (embedding[1]::DOUBLE / sqrt(${norm2Sql("embedding")})) AS u0,
        | (embedding[2]::DOUBLE / sqrt(${norm2Sql("embedding")})) AS u1,
        | floor(sqrt(${norm2Sql(s"list_transform(embedding, x -> (x::DOUBLE / sqrt(${norm2Sql("embedding")}))::FLOAT)")}) * 1000)::BIGINT AS unit_norm_e3
        |FROM embeddings""".stripMargin),
      "normalize_embeddings=True unit vectors (RAG-eval-test_model.py:42," +
        "51,59); projects two components plus a norm check."),

    // ---------------------------------------------------------------- V5
    QueryDef(
      "truncate_pad_tokens",
      (s, d) => {
        val toks = split(col("text"), " ")
        docs(s, d).select(
          col("doc_id"),
          size(toks).cast("bigint").as("n_tokens"),
          concat_ws(" ",
            concat(slice(toks, 1, 16),
              array_repeat(lit("<pad>"),
                greatest(lit(0), lit(16) - size(toks))))).as("padded"))
      },
      Some("""SELECT doc_id,
        | len(string_split(text, ' '))::BIGINT AS n_tokens,
        | CASE WHEN len(string_split(text, ' ')) >= 16
        |   THEN array_to_string(string_split(text, ' ')[1:16], ' ')
        |   ELSE array_to_string(string_split(text, ' '), ' ')
        |        || repeat(' <pad>', 16 - len(string_split(text, ' ')))
        | END AS padded
        |FROM documents""".stripMargin),
      "padding=True, truncation=True, max_length tokenizer clamp " +
        "(RAG-eval-test_model.py:74,99; RAG-eval-create_model.py:152) on " +
        "whitespace tokens, max_length=16."),

    // ---------------------------------------------------------------- V6
    QueryDef(
      "miss_sentinel",
      (s, d) => {
        import s.implicits._
        val terms = Seq("join", "shuffle", "window", "zzznotaword")
          .toDF("term")
        val hits = terms.join(docs(s, d),
          concat(lit(" "), col("text"), lit(" "))
            .contains(concat(lit(" "), col("term"), lit(" "))), "left")
        hits.groupBy(col("term"))
          .agg(coalesce(min(col("doc_id")), lit(999999L)).as("first_doc"))
      },
      Some("""SELECT term, coalesce(min(doc_id), 999999) AS first_doc
        |FROM (VALUES ('join'),('shuffle'),('window'),('zzznotaword')) t(term)
        |LEFT JOIN documents
        |  ON contains(concat(' ', text, ' '), concat(' ', term, ' '))
        |GROUP BY term""".stripMargin),
      "No-hit queries record zone (corpus size) as penalty rank " +
        "(RAG-eval-test_model.py:145-147)."),

    // ---------------------------------------------------------------- J5/V4
    QueryDef(
      "cosine_topk",
      (s, d) => {
        val q = emb(s, d).filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val c = emb(s, d)
          .select(col("vec_id").as("cid"), col("embedding").as("ce"))
        val scored = broadcast(q).crossJoin(c)
          .select(col("qid"), col("cid"),
            cosine(col("qe"), col("ce")).as("cos"))
        scored
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("cos").desc, col("cid"))).cast("bigint"))
          .filter(col("rank") <= 5)
          .select(col("qid"), col("cid"), col("rank"),
            floor(col("cos") * 1000000).cast("bigint").as("score_e6"))
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe
        |            FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
        |scored AS (SELECT qid, cid, ${cosineSql("qe", "ce")} AS cos
        |           FROM q CROSS JOIN c),
        |ranked AS (SELECT qid, cid, cos, row_number() OVER (
        |             PARTITION BY qid ORDER BY cos DESC, cid) AS rank
        |           FROM scored)
        |SELECT qid, cid, rank, floor(cos * 1000000)::BIGINT AS score_e6
        |FROM ranked WHERE rank <= 5""".stripMargin),
      "Brute-force full-corpus cosine ranking, k-cap " +
        "(RAG-eval-test_model.py:130,242-248): broadcast query side x " +
        "streamed corpus + per-query top-k window — the J5 theta-join."),

    // ---------------------------------------------------------------- A1
    QueryDef(
      "avg_search_rank",
      (s, d) => rankedRelevant(s, d)
        .groupBy(col("qid"))
        .agg(sum(when(col("relevant"), col("rank"))).as("rsum"),
          count(when(col("relevant"), lit(1))).as("nrel"))
        .agg((sum(coalesce(col("rsum"), lit(500L))) /
          sum(when(col("nrel") === 0, lit(1L)).otherwise(col("nrel"))))
          .as("avg_search_rank")),
      Some(s"""WITH $rankedRelevantSql,
        |per AS (SELECT qid,
        |          sum(CASE WHEN relevant THEN rank END)::BIGINT AS rsum,
        |          count(CASE WHEN relevant THEN 1 END)::BIGINT AS nrel
        |        FROM ranked GROUP BY qid)
        |SELECT sum(coalesce(rsum, 500))::BIGINT
        |       / sum(CASE WHEN nrel = 0 THEN 1 ELSE nrel END)::BIGINT
        |         AS avg_search_rank
        |FROM per""".stripMargin),
      "Mean of all relevant-hit ranks (RAG-eval-test_model.py:149,152): " +
        "a query with zero relevant docs contributes one zone-sentinel " +
        "rank (500), mirroring the reference's super_index_list.append " +
        "on miss (RAG-eval-test_model.py:145-147) — same sentinel rule " +
        "as avg_first_hit_rank. Integer sums keep the mean " +
        "order-independent; the final division is one IEEE op."),

    // ---------------------------------------------------------------- A2
    QueryDef(
      "avg_first_hit_rank",
      (s, d) => {
        val firstHits = rankedRelevant(s, d)
          .groupBy(col("qid"))
          .agg(coalesce(min(when(col("relevant"), col("rank"))),
            lit(500L)).as("first_hit"))
        firstHits.agg(
          (sum(col("first_hit")) / count(lit(1))).as("avg_first_hit_rank"))
      },
      Some(s"""WITH $rankedRelevantSql,
        |fh AS (SELECT qid, coalesce(min(CASE WHEN relevant THEN rank END),
        |                            500) AS first_hit
        |       FROM ranked GROUP BY qid)
        |SELECT sum(first_hit) / count(*) AS avg_first_hit_rank FROM fh""".stripMargin),
      "Mean first-hit rank with zone sentinel on miss " +
        "(RAG-eval-test_model.py:137-138,145-153) — the reference's " +
        "MRR-family headline metric."),

    // ------------------------------------------------------- flagship detail
    QueryDef(
      "retrieval_eval_detail",
      (s, d) => rankedRelevant(s, d)
        .groupBy(col("qid"))
        .agg(
          coalesce(min(when(col("relevant"), col("rank"))), lit(500L))
            .as("first_hit"),
          count(when(col("relevant"), lit(1))).as("n_relevant"),
          coalesce(sum(when(col("relevant"), col("rank"))), lit(0L))
            .as("rank_sum")),
      Some(s"""WITH $rankedRelevantSql
        |SELECT qid,
        |  coalesce(min(CASE WHEN relevant THEN rank END), 500) AS first_hit,
        |  count(CASE WHEN relevant THEN 1 END) AS n_relevant,
        |  coalesce(sum(CASE WHEN relevant THEN rank END), 0)::BIGINT AS rank_sum
        |FROM ranked GROUP BY qid""".stripMargin),
      "Per-query retrieval scorecard (RAG-eval-test_model.py:119-154): the " +
        "full §3.3 pipeline — crossJoin score -> window rank -> relevance " +
        "-> per-query agg with sentinel."),
  )

  /** Flagship pipeline core: 20 query vectors x full corpus, cosine-ranked,
    * relevance = label match (stand-in for the reference's regex answer-key
    * test, RAG-eval-test_model.py:131-142). */
  def rankedRelevant(s: SparkSession, d: String): DataFrame = {
    val q = emb(s, d).filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("label").as("qlabel"))
    val c = emb(s, d)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"),
        col("label").as("clabel"))
    broadcast(q).crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), col("qlabel"), col("clabel"),
        cosine(col("qe"), col("ce")).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("cid"))).cast("bigint"))
      .withColumn("relevant", col("qlabel") === col("clabel"))
  }

  val rankedRelevantSql: String =
    s"""ranked AS (
       |  SELECT qid, cid, relevant, row_number() OVER (
       |           PARTITION BY qid ORDER BY cos DESC, cid) AS rank
       |  FROM (SELECT q.vec_id AS qid, c.vec_id AS cid,
       |               q.label = c.label AS relevant,
       |               ${cosineSql("q.embedding", "c.embedding")} AS cos
       |        FROM embeddings q CROSS JOIN embeddings c
       |        WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id))""".stripMargin
}
