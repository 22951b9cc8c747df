package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 24: search-engine operators over the token substrate — pseudo-
  * relevance query expansion, field-boosted ranking, best-window snippet
  * extraction, and edit-distance spell suggestion.  Everything is
  * posting-list shaped: per-token work is keyed by (doc, token), the
  * query side is a tiny broadcast, and no stage holds state beyond a
  * vocabulary row — the shapes a 100 TB search index build pipeline is
  * made of.
  */
object Curation30Queries {

  private def toks(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))

  private val toksSql =
    """toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |         FROM documents)""".stripMargin

  /** Top-5 corpus tokens (frequency desc, token asc) as query terms. */
  private def queries5(s: SparkSession, d: String): DataFrame =
    toks(s, d).groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(5)
      .select(col("tok").as("q"))

  private val queries5Sql =
    """q5 AS (SELECT tok AS q FROM (SELECT tok, count(*) AS c FROM toks
      |       GROUP BY tok ORDER BY c DESC, tok LIMIT 5))""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------------------- RM3 query expansion
    QueryDef(
      "rm3_query_expansion",
      (s, d) => {
        val tf = toks(s, d).groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("tf"))
        val dl = toks(s, d).groupBy(col("doc_id"))
          .agg(count(lit(1)).as("dl"))
        val scored = broadcast(queries5(s, d))
          .join(tf, col("tok") === col("q"))
          .join(dl, Seq("doc_id"))
          .select(col("q"), col("doc_id"),
            expr("(1000 * tf) div dl").as("score"))
        val top3 = scored
          .withColumn("rn", row_number().over(Window.partitionBy(col("q"))
            .orderBy(col("score").desc, col("doc_id"))))
          .filter(col("rn") <= 3).select(col("q"), col("doc_id"))
        top3.join(tf, Seq("doc_id"))
          .filter(col("tok") =!= col("q"))
          .groupBy(col("q"), col("tok"))
          .agg(sum(col("tf")).as("weight"))
          .withColumn("rank", row_number().over(Window.partitionBy(col("q"))
            .orderBy(col("weight").desc, col("tok"))).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("q"), col("tok").as("expansion_tok"), col("weight"),
            col("rank"))
      },
      Some(s"""WITH $toksSql,
        |$queries5Sql,
        |tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf
        |       FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*)::BIGINT AS dl
        |       FROM toks GROUP BY 1),
        |scored AS (SELECT q5.q, tf.doc_id,
        |    ((1000 * tf.tf) // dl.dl)::BIGINT AS score
        |  FROM q5 JOIN tf ON tf.tok = q5.q JOIN dl USING (doc_id)),
        |top3 AS (SELECT q, doc_id FROM (
        |    SELECT q, doc_id, row_number() OVER (PARTITION BY q
        |      ORDER BY score DESC, doc_id) AS rn FROM scored)
        |  WHERE rn <= 3),
        |exp AS (SELECT t3.q, tf.tok, sum(tf.tf)::BIGINT AS weight
        |  FROM top3 t3 JOIN tf ON tf.doc_id = t3.doc_id
        |  WHERE tf.tok <> t3.q GROUP BY 1, 2)
        |SELECT q, tok AS expansion_tok, weight, rn::BIGINT AS rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY q
        |        ORDER BY weight DESC, tok) AS rn FROM exp)
        |WHERE rn <= 5""".stripMargin),
      "RM3-style pseudo-relevance feedback: retrieve top-3 docs per " +
        "query term by normalized tf, then harvest the heaviest co-" +
        "occurring terms from those docs as expansion candidates " +
        "(weight = summed tf, query term excluded).  The feedback " +
        "round-trip costs one extra broadcast join over the posting " +
        "list — no second corpus scan — which is why RM3 survives at " +
        "index-build scale while document-side embeddings need a GPU " +
        "fleet."),

    // ----------------------------------------- field-boosted ranking
    QueryDef(
      "field_boosted_search",
      (s, d) => {
        val pos = Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        val fieldTf = pos.groupBy(col("doc_id"), col("tok"))
          .agg(sum(when(col("pos") < 10, 1L).otherwise(0L)).as("tf_title"),
            sum(when(col("pos") >= 10, 1L).otherwise(0L)).as("tf_body"))
        broadcast(queries5(s, d))
          .join(fieldTf, col("tok") === col("q"))
          .select(col("q"), col("doc_id"), col("tf_title"), col("tf_body"),
            (lit(3L) * col("tf_title") + col("tf_body")).as("score"))
          .withColumn("rank", row_number().over(Window.partitionBy(col("q"))
            .orderBy(col("score").desc, col("doc_id"))).cast("long"))
          .filter(col("rank") <= 5)
      },
      Some(s"""WITH $toksSql,
        |$queries5Sql,
        |tokpos AS (SELECT doc_id, i.i AS pos,
        |    string_split(text, ' ')[i.i + 1] AS tok
        |  FROM documents, (SELECT range AS i FROM range(0, 4096)) i
        |  WHERE i.i < len(string_split(text, ' '))),
        |ft AS (SELECT doc_id, tok,
        |    sum(CASE WHEN pos < 10 THEN 1 ELSE 0 END)::BIGINT AS tf_title,
        |    sum(CASE WHEN pos >= 10 THEN 1 ELSE 0 END)::BIGINT AS tf_body
        |  FROM tokpos GROUP BY 1, 2)
        |SELECT q, doc_id, tf_title, tf_body, score, rn::BIGINT AS rank
        |FROM (SELECT q5.q, ft.doc_id, ft.tf_title, ft.tf_body,
        |        (3 * ft.tf_title + ft.tf_body)::BIGINT AS score,
        |        row_number() OVER (PARTITION BY q5.q
        |          ORDER BY (3 * ft.tf_title + ft.tf_body) DESC,
        |                   ft.doc_id) AS rn
        |      FROM q5 JOIN ft ON ft.tok = q5.q)
        |WHERE rn <= 5""".stripMargin),
      "Field-boosted ranking: the first 10 tokens act as the title " +
        "field (weight 3), the rest as body (weight 1) — the standard " +
        "structured-document scoring that one flat tf cannot express. " +
        "Field decomposition happens once at posting-list build " +
        "(position threshold in the same pass as tokenization); query " +
        "time is the usual broadcast probe."),

    // ------------------------------------------- snippet extraction
    QueryDef(
      "snippet_extraction",
      (s, d) => {
        val term = toks(s, d).groupBy(col("tok")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("tok")).limit(1)
          .select(col("tok").as("term"))
        val hits = Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
          .join(broadcast(term), col("tok") === col("term"))
          .select(col("doc_id"), col("pos").cast("long").as("pos"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rangeBetween(0, 7)
        hits
          .withColumn("window_hits", count(lit(1)).over(w))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("doc_id"))
              .orderBy(col("window_hits").desc, col("pos"))))
          .filter(col("rn") === 1 && col("window_hits") >= 2)
          .select(col("doc_id"), col("pos").as("best_start"),
            col("window_hits"))
      },
      Some(s"""WITH $toksSql,
        |term AS (SELECT tok AS term FROM (SELECT tok, count(*) AS c
        |         FROM toks GROUP BY tok ORDER BY c DESC, tok LIMIT 1)),
        |tokpos AS (SELECT doc_id, i.i::BIGINT AS pos,
        |    string_split(text, ' ')[i.i + 1] AS tok
        |  FROM documents, (SELECT range AS i FROM range(0, 4096)) i
        |  WHERE i.i < len(string_split(text, ' '))),
        |hits AS (SELECT doc_id, pos FROM tokpos, term
        |         WHERE tok = term),
        |win AS (SELECT doc_id, pos,
        |    count(*) OVER (PARTITION BY doc_id ORDER BY pos
        |      RANGE BETWEEN CURRENT ROW AND 7 FOLLOWING)::BIGINT
        |      AS window_hits
        |  FROM hits)
        |SELECT doc_id, pos AS best_start, window_hits
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY window_hits DESC, pos) AS rn FROM win)
        |WHERE rn = 1 AND window_hits >= 2""".stripMargin),
      "Best-window snippet extraction: for the probe term, the 8-token " +
        "window with the most term hits per document (RANGE frame over " +
        "hit positions — the window never materializes the text).  " +
        "Only hit positions flow through the plan, so cost scales with " +
        "postings, not characters; this is the context-picker a RAG " +
        "chunker or a SERP highlighter runs after retrieval."),

    // --------------------------------------------- spell suggestion
    QueryDef(
      "did_you_mean_edit1",
      (s, d) => {
        val vocab = toks(s, d).groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val probes = vocab
          .orderBy(col("c").asc, col("tok")).limit(5)
          .select(concat(col("tok"), lit("z")).as("probe"))
        broadcast(probes).crossJoin(vocab)
          .filter(levenshtein(col("probe"), col("tok")) <= 1)
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("probe"))
              .orderBy(col("c").desc, col("tok"))).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("probe"), col("tok").as("suggestion"),
            col("c").as("freq"), col("rank"))
      },
      Some(s"""WITH $toksSql,
        |vocab AS (SELECT tok, count(*)::BIGINT AS c FROM toks
        |          GROUP BY tok),
        |probes AS (SELECT tok || 'z' AS probe FROM (SELECT tok, c
        |           FROM vocab ORDER BY c ASC, tok LIMIT 5))
        |SELECT probe, suggestion, freq, rn::BIGINT AS rank
        |FROM (SELECT p.probe, v.tok AS suggestion, v.c AS freq,
        |        row_number() OVER (PARTITION BY p.probe
        |          ORDER BY v.c DESC, v.tok) AS rn
        |      FROM probes p CROSS JOIN vocab v
        |      WHERE levenshtein(p.probe, v.tok) <= 1)
        |WHERE rn <= 3""".stripMargin),
      "Edit-distance-1 spell suggestion: deterministic probe terms " +
        "(rarest vocabulary words with a trailing typo) matched against " +
        "the vocabulary by levenshtein <= 1, ranked by corpus " +
        "frequency.  The probe side is a 5-row broadcast against the " +
        "vocabulary — NOT the corpus — so suggestion cost is bounded by " +
        "distinct words; at 100 TB you additionally block by length " +
        "and first character before the distance call (the fuzzy_match " +
        "family's blocking substrate does exactly that)."),
  )
}
