package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Text-analysis operators for a training-data pipeline: language ID
  * (token-marker heuristic), quality scoring, token counting
  * (whitespace + BPE-ish regex), and rolling-hash document
  * fingerprinting.  All-integer scoring so both engines agree exactly.
  *
  * These model the text-hygiene steps around the reference's corpus
  * handling (blank/short-line drops, generate_narratives_from_data.py:83;
  * terminator stripping, :55-61) extended to what a 100 TB LLM-data
  * pipeline needs.
  */
object TextQueries {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** Deterministic per-language marker lexicon over the fixture vocab
    * (shared with langid_confusion_matrix in Curation41Queries). */
  private[queries] val lexicon: Seq[(String, String)] = Seq(
    "en" -> "table", "en" -> "row", "en" -> "value",
    "de" -> "join", "de" -> "shuffle", "de" -> "batch",
    "fr" -> "column", "fr" -> "window", "fr" -> "scan",
    "es" -> "spark", "es" -> "data", "es" -> "order",
    "zh" -> "hash", "zh" -> "key", "zh" -> "agg")

  private[queries] val lexiconSql: String =
    lexicon.map { case (l, w) => s"('$l','$w')" }
      .mkString("(VALUES ", ",", ") lex(cand, marker)")

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------ lang id
    QueryDef(
      "text_langid",
      (s, d) => {
        import s.implicits._
        val lex = lexicon.toDF("cand", "marker")
        val toks = docs(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val scores = toks.join(broadcast(lex), col("tok") === col("marker"))
          .groupBy(col("doc_id"), col("cand"))
          .agg(count(lit(1)).as("hits"))
        val best = scores.withColumn("rn", row_number().over(
            Window.partitionBy(col("doc_id"))
              .orderBy(col("hits").desc, col("cand"))))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("cand").as("pred_lang"), col("hits"))
        docs(s, d).select(col("doc_id"))
          .join(best, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
            coalesce(col("hits"), lit(0L)).as("marker_hits"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |scores AS (SELECT doc_id, cand, count(*) AS hits
        |  FROM toks JOIN $lexiconSql ON tok = marker
        |  GROUP BY doc_id, cand),
        |best AS (SELECT doc_id, cand AS pred_lang, hits, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY hits DESC, cand) AS rn
        |  FROM scores)
        |SELECT d.doc_id, coalesce(b.pred_lang, 'und') AS pred_lang,
        |       coalesce(b.hits, 0) AS marker_hits
        |FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
        |ON d.doc_id = b.doc_id""".stripMargin),
      "n-gram/marker-token language ID: explode tokens, broadcast-join a " +
        "tiny lexicon, argmax per doc with alphabetical tiebreak. The " +
        "lexicon side always broadcasts; corpus side never shuffles until " +
        "the per-doc agg."),

    // ---------------------------------------------- extract-all matches
    QueryDef(
      "regexp_extract_all_long_words",
      (s, d) => docs(s, d)
        .select(col("doc_id"),
          regexp_extract_all(col("text"), lit("[a-z]{8,}"), lit(0))
            .as("longs"))
        .select(col("doc_id"),
          size(col("longs")).cast("bigint").as("n_long"),
          // ANSI mode: element_at throws on an empty array; try_ variant
          // yields NULL, matching DuckDB's out-of-range list index
          coalesce(expr("try_element_at(longs, 1)"), lit(""))
            .as("first_long")),
      Some("""SELECT doc_id,
        | len(regexp_extract_all(text, '[a-z]{8,}'))::BIGINT AS n_long,
        | coalesce(regexp_extract_all(text, '[a-z]{8,}')[1], '')
        |   AS first_long
        |FROM documents""".stripMargin),
      "All-occurrence regex extraction into an array column (the " +
        "multi-match sibling of regexp_extract): long-word inventory " +
        "per doc. Array stays row-local — consumed by size/element_at " +
        "in the same codegen stage, never shuffled."),

    // -------------------------------------------- null-preserving explode
    QueryDef(
      "explode_outer_short_docs",
      (s, d) => {
        // 3-gram arrays are empty for docs under 3 tokens; explode_outer
        // keeps those docs as a null row instead of dropping them — the
        // difference between "no grams" and "document lost".
        val toks = split(col("text"), " ")
        val n = size(toks)
        val grams = when(n >= 3,
          slice(toks, lit(1), n - 2)).otherwise(array())
        docs(s, d).filter(col("doc_id") < 50)
          .select(col("doc_id"), explode_outer(grams).as("g"))
          .groupBy(col("doc_id"))
          .agg(count(col("g")).as("n_grams"),
            count(lit(1)).as("n_rows"))
      },
      Some("""WITH g AS (SELECT doc_id,
        |    CASE WHEN len(string_split(text,' ')) >= 3
        |         THEN string_split(text,' ')[1:len(string_split(text,' '))-2]
        |         ELSE [] END AS grams
        |  FROM documents WHERE doc_id < 50),
        |ex AS (SELECT doc_id, unnest(
        |         CASE WHEN len(grams) = 0 THEN [NULL] ELSE grams END) AS tok
        |       FROM g)
        |SELECT doc_id, count(tok)::BIGINT AS n_grams,
        |       count(*)::BIGINT AS n_rows
        |FROM ex GROUP BY doc_id""".stripMargin),
      "explode_outer: generators drop rows whose array is empty; the " +
        "outer variant emits one null row instead, so per-doc accounting " +
        "(count(col) vs count(*)) distinguishes empty from missing — " +
        "essential when a 100 TB pipeline must prove no document was " +
        "silently lost across a generate stage."),

    // ---------------------------------------------- positional explode
    QueryDef(
      "posexplode_tokens",
      (s, d) => docs(s, d).filter(col("doc_id") < 20)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .select(col("doc_id"), col("pos").cast("bigint").as("pos"),
          col("tok")),
      Some("""SELECT doc_id, i.i AS pos, toks[i.i+1] AS tok
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |      FROM documents WHERE doc_id < 20),
        |     (SELECT range AS i FROM range(0, 4096)) i
        |WHERE i.i < len(toks)""".stripMargin),
      "Generator with ordinality: posexplode keeps each token's 0-based " +
        "position — the index the reference's enumerate()-style file " +
        "suffixes and chunk offsets rely on. Narrow generate, no " +
        "shuffle; position comes from the array, not a window, so no " +
        "global ordering is involved."),

    // -------------------------------------------------- repetition ratio
    QueryDef(
      "text_repetition_ratio",
      (s, d) => {
        // distinct vs total word 3-grams per doc: highly repetitive
        // (looping/boilerplate) text shows a low distinct share — the
        // standard "repeated n-gram" quality gate in pretraining
        // pipelines.  Both counts are PER-DOCUMENT, so they are
        // computed scan-side by the native GramDistinctStats kernel
        // (one pass over the document bytes; GramKernelSpec pins
        // parity): the old explode + groupBy(doc_id) countDistinct
        // shuffled the entire gram-string stream twice (distinct
        // expand + final agg) to aggregate values each row already
        // owned.  Zero exchanges at any scale.
        docs(s, d)
          .select(col("doc_id"),
            graft.functions.GramKernel.gramDistinctStats(col("text"), 3)
              .as("r"))
          .filter(col("r").isNotNull)
          .select(col("doc_id"), col("r.n_grams").as("n_grams"),
            col("r.n_distinct").as("n_distinct"))
          .select(col("doc_id"), col("n_grams"), col("n_distinct"),
            expr("((n_grams - n_distinct) * 1000) div n_grams")
              .as("repetition_permille"))
      },
      Some("""WITH grams AS (
        |  SELECT doc_id, concat_ws(' ', toks[i.i+1], toks[i.i+2],
        |                           toks[i.i+3]) AS g
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents),
        |       (SELECT range AS i FROM range(0, 4096)) i
        |  WHERE len(toks) >= 3 AND i.i <= len(toks) - 3)
        |SELECT doc_id, count(*)::BIGINT AS n_grams,
        |       count(DISTINCT g)::BIGINT AS n_distinct,
        |       (((count(*) - count(DISTINCT g)) * 1000) // count(*))::BIGINT
        |         AS repetition_permille
        |FROM grams GROUP BY doc_id""".stripMargin),
      "Repeated-3-gram ratio per document — the boilerplate/loop-output " +
        "quality gate: permille of n-grams that are duplicates within " +
        "the doc. Per-doc counts computed scan-side by the native gram " +
        "census kernel (no explode, no distinct shuffle, no joins); " +
        "integer permille for cross-engine parity."),

    // ------------------------------------------------------ quality score
    QueryDef(
      "text_quality_score",
      (s, d) => {
        val toks = split(col("text"), " ")
        docs(s, d).select(
          col("doc_id"),
          size(toks).cast("bigint").as("n_tokens"),
          size(array_distinct(toks)).cast("bigint").as("n_distinct"),
          length(col("text")).cast("bigint").as("n_chars_obs"),
          // type-token ratio e3 + mean word length e3: all integer div
          expr("(size(split(text, ' ')) * 1000) div greatest(size(split(text, ' ')), 1)")
            .as("dummy_one_e3"),
          expr("(size(array_distinct(split(text, ' '))) * 1000) div size(split(text, ' '))")
            .as("ttr_e3"),
          expr("((length(text) - size(split(text, ' ')) + 1) * 1000) div size(split(text, ' '))")
            .as("mean_wordlen_e3"))
          .drop("dummy_one_e3")
          .withColumn("quality_e3",
            least(col("ttr_e3"), lit(1000L)) +
              when(col("n_tokens") >= 20 && col("n_tokens") <= 200, 500L)
                .otherwise(0L))
      },
      Some("""SELECT doc_id,
        | len(string_split(text, ' '))::BIGINT AS n_tokens,
        | len(list_distinct(string_split(text, ' ')))::BIGINT AS n_distinct,
        | length(text)::BIGINT AS n_chars_obs,
        | ((len(list_distinct(string_split(text, ' '))) * 1000)
        |   // len(string_split(text, ' ')))::BIGINT AS ttr_e3,
        | (((length(text) - len(string_split(text, ' ')) + 1) * 1000)
        |   // len(string_split(text, ' ')))::BIGINT AS mean_wordlen_e3,
        | (least((len(list_distinct(string_split(text, ' '))) * 1000)
        |   // len(string_split(text, ' ')), 1000)
        |  + CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 200
        |         THEN 500 ELSE 0 END)::BIGINT AS quality_e3
        |FROM documents""".stripMargin),
      "Quality scoring from length / type-token ratio / mean word length " +
        "(all-integer fixed point) — the filter family used to gate LLM " +
        "training corpora."),

    // ------------------------------------------------------- token count
    QueryDef(
      "text_token_count",
      (s, d) => docs(s, d).select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .cast("bigint").as("bpe_ish_tokens")),
      Some("""SELECT doc_id,
        | len(string_split(text, ' '))::BIGINT AS ws_tokens,
        | len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT
        |   AS bpe_ish_tokens
        |FROM documents""".stripMargin),
      "Token counting: whitespace split + BPE-ish regex segmentation " +
        "(letters / digits / punct singletons), the max_length currency of " +
        "RAG-eval-test_model.py:74,99."),

    // ------------------------------------------------------- fingerprint
    QueryDef(
      "text_fingerprint",
      (s, d) => docs(s, d).select(
        col("doc_id"),
        aggregate(
          transform(split(col("text"), " "),
            w => (ascii(w) * 100 + length(w)).cast("long")),
          lit(0L),
          (acc, v) => (acc * 31 + v) % 1000000007L).as("fingerprint")),
      Some("""SELECT doc_id,
        | list_reduce(list_prepend(0::BIGINT,
        |   list_transform(string_split(text, ' '),
        |                  w -> (unicode(w) * 100 + length(w))::BIGINT)),
        |   (acc, v) -> (acc * 31 + v) % 1000000007) AS fingerprint
        |FROM documents""".stripMargin),
      "Rolling polynomial hash over the token stream (mod 1e9+7) — " +
        "order-sensitive document fingerprint, exact in both engines."),

    // ---------------------------------------------------- PII redaction
    QueryDef(
      "redact_pii",
      (s, d) => {
        // Inject synthetic PII deterministically (fixture text has none),
        // then scrub it — the redaction pass every training corpus runs.
        // Patterns kept to the regex subset with identical semantics in
        // Java regex and DuckDB's RE2: character classes, +, {n,m};
        // no backrefs, no lookaround.
        val withPii = concat(col("text"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5)) === 0,
            lit(" call 555-867-5309")).otherwise(lit("")))
        docs(s, d).select(
          col("doc_id"),
          regexp_replace(
            regexp_replace(withPii,
              "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
            "[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>").as("redacted"))
      },
      Some("""SELECT doc_id,
        | regexp_replace(
        |   regexp_replace(
        |     text
        |       || CASE WHEN doc_id % 3 = 0
        |            THEN ' contact user' || doc_id || '@example.com'
        |            ELSE '' END
        |       || CASE WHEN doc_id % 5 = 0
        |            THEN ' call 555-867-5309' ELSE '' END,
        |     '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |   '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
        |FROM documents""".stripMargin),
      "PII redaction (emails, phone numbers -> placeholder tokens) over " +
        "deterministically injected matches: pure regexp_replace, codegen " +
        "scalar pass, no shuffle — the compliance scrub stage of a " +
        "training-data pipeline."),

    // ----------------------------------------------- mixture weighting
    QueryDef(
      "mixture_weighted_sample",
      (s, d) => {
        // Per-source mixture weights (25/50/75/100 % by source index mod
        // 4), applied as deterministic Bernoulli keeps keyed on
        // md5(source:doc_id) — the dataset-mixing stage that reweights
        // corpora before training; reproducible under any partitioning.
        val srcNum = expr("substring(source, 4)").cast("int")
        val weight = (pmod(srcNum, lit(4)) + 1) * 25
        val h = pmod(conv(substring(md5(concat(col("source"), lit(":"),
          col("doc_id"))), 1, 8), 16, 10).cast("long"), lit(100L))
        Tables.documents(s, d)
          .withColumn("weight_pct", weight.cast("long"))
          .filter(h < col("weight_pct"))
          .groupBy(col("source"), col("weight_pct"))
          .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("first_id"))
      },
      Some("""SELECT source, ((substr(source, 4)::INT % 4 + 1) * 25)::BIGINT
        |         AS weight_pct,
        |       count(*) AS n_kept, min(doc_id) AS first_id
        |FROM documents
        |WHERE (('0x' || substr(md5(source || ':' || doc_id), 1, 8))::BIGINT
        |        % 100) < ((substr(source, 4)::INT % 4 + 1) * 25)
        |GROUP BY source""".stripMargin),
      "Dataset mixture weighting: per-source keep rates applied as " +
        "deterministic hash Bernoulli — corpus reweighting before " +
        "training; narrow filter + one small agg shuffle."),

    // ----------------------------------------------------- bigram table
    QueryDef(
      "ngram_counts",
      (s, d) => {
        // Corpus bigram frequency table, built with the same shifted-
        // slice zip_with pattern as the dedup shingler (no expressions
        // re-evaluated inside lambda bodies).
        val toks = split(col("text"), " ")
        val n = size(toks)
        val t1 = slice(toks, lit(1), n - 1)
        val t2 = slice(toks, lit(2), n - 1)
        Tables.documents(s, d).filter(n >= 2)
          .select(explode(zip_with(t1, t2,
            (a, b) => concat(a, lit(" "), b))).as("bigram"))
          .filter(length(col("bigram")) >= 9)
          .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram"))
          .limit(20)
      },
      Some("""SELECT concat_ws(' ', toks[i.i+1], toks[i.i+2]) AS bigram,
        |       count(*) AS n
        |FROM (SELECT string_split(text, ' ') AS toks FROM documents),
        |     (SELECT range AS i FROM range(0, 4096)) i
        |WHERE len(toks) >= 2 AND i.i <= len(toks) - 2
        |  AND length(concat_ws(' ', toks[i.i+1], toks[i.i+2])) >= 9
        |GROUP BY bigram
        |ORDER BY n DESC, bigram
        |LIMIT 20""".stripMargin),
      "Corpus bigram frequency table (top-20): explode 2-gram windows " +
        "-> count agg (map-side combinable) -> bounded ordered limit. " +
        "The phrase-statistics pass behind contamination checks and " +
        "boilerplate detection; at 100 TB the count shuffles by bigram " +
        "hash and the top-k is a per-partition heap + small merge."),
  )
}

/** Approximate-nearest-neighbor over the embedding column: brute-force
  * cosine top-k as the correctness baseline (cosine_topk in
  * VectorQueries) and a random-hyperplane LSH-bucketed variant as the
  * scale path. */
object AnnQueries {

  private val NumPlanes = 8
  private val Dim = 64

  /** Deterministic pseudo-random integer hyperplane weights, generated by
    * a fixed LCG and inlined as literals in BOTH engines. */
  private[queries] val planes: IndexedSeq[IndexedSeq[Long]] = {
    var state = 88172645463325252L
    def next(): Long = { // xorshift64
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      state
    }
    IndexedSeq.fill(NumPlanes)(IndexedSeq.fill(Dim)(next() % 1001))
  }

  private[queries] val planesSql: String =
    (for (j <- 0 until NumPlanes; dd <- 0 until Dim)
      yield s"($j,$dd,${planes(j)(dd)})")
      .mkString("(VALUES ", ",", ") pl(j, d, w)")

  /** Integer dot of an embedding with plane j: components scaled by 1e6
    * and floored, so the sign is an exact integer decision. */
  private[queries] def intDot(embCol: Column, j: Int): Column = {
    val w = array(planes(j).map(x => lit(x)): _*)
    aggregate(
      zip_with(embCol, w,
        (x, ww) => floor(x.cast("double") * 1000000).cast("long") * ww),
      lit(0L), (acc, x) => acc + x)
  }

  private[queries] def bucketCol(embCol: Column): Column =
    (0 until NumPlanes).map(j =>
      when(intDot(embCol, j) >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)

  import graft.functions.VectorOps._

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ann_bucket_assign",
      (s, d) => Tables.embeddings(s, d).select(
        col("vec_id"), bucketCol(col("embedding")).as("bucket")),
      Some(s"""WITH comps AS (
        |  SELECT vec_id, pl.j,
        |    sum(floor(embedding[pl.d + 1]::DOUBLE * 1000000)::BIGINT * pl.w)
        |      AS dotj
        |  FROM embeddings CROSS JOIN $planesSql
        |  GROUP BY vec_id, pl.j)
        |SELECT vec_id,
        |  sum(CASE WHEN dotj >= 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT
        |    AS bucket
        |FROM comps GROUP BY vec_id""".stripMargin),
      "Random-hyperplane (SimHash-for-vectors) LSH bucket assignment: 8 " +
        "integer hyperplanes -> 256 buckets. Integer dots so the bucket " +
        "decision is exact and partition-independent."),

    QueryDef(
      "ann_lsh_topk",
      (s, d) => {
        val withB = Tables.embeddings(s, d).select(
          col("vec_id"), col("embedding"),
          bucketCol(col("embedding")).as("bucket"))
        val q = withB.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("bucket"))
        val scored = q.join(withB.withColumnRenamed("vec_id", "cid")
            .withColumnRenamed("embedding", "ce"), Seq("bucket"))
          .filter(col("qid") =!= col("cid"))
          .select(col("qid"), col("cid"), col("bucket"),
            cosine(col("qe"), col("ce")).as("cos"))
        scored.withColumn("rank", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("cos").desc, col("cid"))).cast("bigint"))
          .filter(col("rank") <= 3)
          .select(col("qid"), col("cid"), col("bucket"), col("rank"),
            floor(col("cos") * 1000000).cast("bigint").as("score_e6"))
      },
      Some(s"""WITH comps AS (
        |  SELECT vec_id, pl.j,
        |    sum(floor(embedding[pl.d + 1]::DOUBLE * 1000000)::BIGINT * pl.w)
        |      AS dotj
        |  FROM embeddings CROSS JOIN $planesSql
        |  GROUP BY vec_id, pl.j),
        |buckets AS (
        |  SELECT vec_id,
        |    sum(CASE WHEN dotj >= 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT
        |      AS bucket
        |  FROM comps GROUP BY vec_id),
        |withb AS (SELECT e.vec_id, e.embedding, b.bucket
        |  FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id),
        |scored AS (SELECT q.vec_id AS qid, c.vec_id AS cid, q.bucket,
        |    ${cosineSql("q.embedding", "c.embedding")} AS cos
        |  FROM withb q JOIN withb c
        |    ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 10),
        |ranked AS (SELECT qid, cid, bucket, cos, row_number() OVER (
        |    PARTITION BY qid ORDER BY cos DESC, cid) AS rank FROM scored)
        |SELECT qid, cid, bucket, rank, floor(cos * 1000000)::BIGINT AS score_e6
        |FROM ranked WHERE rank <= 3""".stripMargin),
      "LSH-bucketed ANN: candidates restricted to the query's bucket, " +
        "then exact cosine re-rank. The join is an equi-join on bucket — " +
        "shuffle-partitioned by bucket, never all-pairs; the 100 TB " +
        "similarity-search layout."),

    // ---------------------------------------------------------- IVF ANN
    QueryDef(
      "ann_ivf_topk",
      (s, d) => {
        // IVF: coarse quantization against a fixed centroid set (a
        // deterministic subsample standing in for k-means centroids),
        // then probe the query's top-2 centroid lists only.
        val e = Tables.embeddings(s, d)
        val centroids = e.filter(pmod(col("vec_id"), lit(31)) === 7)
          .select(col("vec_id").as("centroid_id"),
            col("embedding").as("cvec"))
        // assign every vector to its nearest centroid (argmax cosine)
        val assign = e.crossJoin(broadcast(centroids))
          .select(col("vec_id"), col("embedding"), col("centroid_id"),
            cosine(col("embedding"), col("cvec")).as("ccos"))
          .withColumn("crn", row_number().over(
            Window.partitionBy(col("vec_id"))
              .orderBy(col("ccos").desc, col("centroid_id"))))
          .filter(col("crn") === 1)
          .select(col("vec_id"), col("embedding"), col("centroid_id"))
        // per query: probe the 2 nearest centroids' lists
        val probes = e.filter(col("vec_id") < 10).crossJoin(broadcast(centroids))
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("centroid_id"),
            cosine(col("embedding"), col("cvec")).as("ccos"))
          .withColumn("crn", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("ccos").desc, col("centroid_id"))))
          .filter(col("crn") <= 2)
          .select(col("qid"), col("qe"), col("centroid_id"))
        val scored = probes.join(assign, Seq("centroid_id"))
          .filter(col("qid") =!= col("vec_id"))
          .select(col("qid"), col("vec_id").as("cid"),
            cosine(col("qe"), col("embedding")).as("cos"))
        scored.withColumn("rank", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("cos").desc, col("cid"))).cast("bigint"))
          .filter(col("rank") <= 3)
          .select(col("qid"), col("cid"), col("rank"),
            floor(col("cos") * 1000000).cast("bigint").as("score_e6"))
      },
      Some(s"""WITH centroids AS (
        |  SELECT vec_id AS centroid_id, embedding AS cvec
        |  FROM embeddings WHERE vec_id % 31 = 7),
        |assign AS (
        |  SELECT vec_id, embedding, centroid_id FROM (
        |    SELECT e.vec_id, e.embedding, c.centroid_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        ${cosineSql("e.embedding", "c.cvec")} DESC, c.centroid_id)
        |        AS crn
        |    FROM embeddings e CROSS JOIN centroids c)
        |  WHERE crn = 1),
        |probes AS (
        |  SELECT qid, qe, centroid_id FROM (
        |    SELECT e.vec_id AS qid, e.embedding AS qe, c.centroid_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        ${cosineSql("e.embedding", "c.cvec")} DESC, c.centroid_id)
        |        AS crn
        |    FROM embeddings e CROSS JOIN centroids c
        |    WHERE e.vec_id < 10)
        |  WHERE crn <= 2),
        |scored AS (
        |  SELECT p.qid, a.vec_id AS cid,
        |    ${cosineSql("p.qe", "a.embedding")} AS cos
        |  FROM probes p JOIN assign a ON p.centroid_id = a.centroid_id
        |  WHERE p.qid <> a.vec_id),
        |ranked AS (
        |  SELECT qid, cid, cos, row_number() OVER (
        |    PARTITION BY qid ORDER BY cos DESC, cid) AS rank FROM scored)
        |SELECT qid, cid, rank, floor(cos * 1000000)::BIGINT AS score_e6
        |FROM ranked WHERE rank <= 3""".stripMargin),
      "IVF ANN: coarse-quantize the corpus against broadcast centroids " +
        "(one narrow pass), probe only the query's 2 nearest lists. At " +
        "100 TB the assignment is a write-time partitioning column — " +
        "probing reads 2 partitions instead of the corpus."),

    // ------------------------------------------- ANN recall evaluation
    QueryDef(
      "ann_recall_at_k",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        // exact top-3 per query by brute force
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val exact = broadcast(q)
          .crossJoin(e.select(col("vec_id").as("cid"),
            col("embedding").as("ce")))
          .filter(col("qid") =!= col("cid"))
          .select(col("qid"), col("cid"),
            cosine(col("qe"), col("ce")).as("cos"))
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("cos").desc, col("cid"))))
          .filter(col("rank") <= 3)
          .select(col("qid"), col("cid"))
        // LSH top-3 per query (same construction as ann_lsh_topk)
        val withB = e.select(col("vec_id"), col("embedding"),
          bucketCol(col("embedding")).as("bucket"))
        val lsh = withB.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("bucket"))
          .join(withB.withColumnRenamed("vec_id", "cid")
            .withColumnRenamed("embedding", "ce"), Seq("bucket"))
          .filter(col("qid") =!= col("cid"))
          .select(col("qid"), col("cid"),
            cosine(col("qe"), col("ce")).as("cos"))
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("cos").desc, col("cid"))))
          .filter(col("rank") <= 3)
          .select(col("qid"), col("cid"))
        exact.join(lsh, Seq("qid", "cid"), "left_semi")
          .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
          .join(exact.groupBy(col("qid")).agg(count(lit(1)).as("k")),
            Seq("qid"), "right")
          .select(col("qid"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"),
            expr("(coalesce(n_hits, 0) * 1000) div k")
              .as("recall_permille"))
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe
        |           FROM embeddings WHERE vec_id < 10),
        |exact AS (SELECT qid, cid FROM (
        |    SELECT q.qid, c.vec_id AS cid, row_number() OVER (
        |      PARTITION BY q.qid ORDER BY
        |        ${cosineSql("q.qe", "c.embedding")} DESC, c.vec_id) AS rank
        |    FROM q CROSS JOIN embeddings c WHERE q.qid <> c.vec_id)
        |  WHERE rank <= 3),
        |comps AS (
        |  SELECT vec_id, pl.j,
        |    sum(floor(embedding[pl.d + 1]::DOUBLE * 1000000)::BIGINT * pl.w)
        |      AS dotj
        |  FROM embeddings CROSS JOIN $planesSql
        |  GROUP BY vec_id, pl.j),
        |buckets AS (
        |  SELECT vec_id,
        |    sum(CASE WHEN dotj >= 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT
        |      AS bucket
        |  FROM comps GROUP BY vec_id),
        |withb AS (SELECT e.vec_id, e.embedding, b.bucket
        |  FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id),
        |lsh AS (SELECT qid, cid FROM (
        |    SELECT x.vec_id AS qid, c.vec_id AS cid, row_number() OVER (
        |      PARTITION BY x.vec_id ORDER BY
        |        ${cosineSql("x.embedding", "c.embedding")} DESC, c.vec_id)
        |        AS rank
        |    FROM withb x JOIN withb c
        |      ON x.bucket = c.bucket AND x.vec_id <> c.vec_id
        |    WHERE x.vec_id < 10)
        |  WHERE rank <= 3),
        |hits AS (SELECT exact.qid, count(*)::BIGINT AS n_hits
        |  FROM exact JOIN lsh ON exact.qid = lsh.qid
        |                     AND exact.cid = lsh.cid
        |  GROUP BY exact.qid),
        |ks AS (SELECT qid, count(*)::BIGINT AS k FROM exact GROUP BY qid)
        |SELECT ks.qid, coalesce(n_hits, 0)::BIGINT AS n_hits,
        |       (coalesce(n_hits, 0) * 1000) // k AS recall_permille
        |FROM ks LEFT JOIN hits ON ks.qid = hits.qid""".stripMargin),
      "ANN quality as a first-class query: recall@3 of the LSH path " +
        "against the exact brute-force top-3, per query — the number a " +
        "pipeline tracks when it trades scan cost for bucket probes " +
        "(AnnRecallSpec pins the aggregate floor; this exposes the " +
        "per-query detail on the oracle-checked surface). Both sides " +
        "derive from the same deterministic constructions as " +
        "cosine_topk / ann_lsh_topk, so the recall itself is exact and " +
        "partition-independent."),

    // ------------------------------------------- multi-probe LSH
    QueryDef(
      "ann_multiprobe_topk",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val withB = e.select(col("vec_id"), col("embedding"),
          bucketCol(col("embedding")).as("bucket"))
        // weakest plane = smallest |dot| (tie: smallest j) — the bit
        // most likely to be on the wrong side of the hyperplane
        val weakest = array_min(array((0 until NumPlanes).map(j =>
          struct(abs(intDot(col("embedding"), j)).as("a"),
            lit(j.toLong).as("j"))): _*)).getField("j")
        val q = withB.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("bucket").as("qbucket"),
            weakest.as("weakest"))
          .select(col("qid"), col("qe"),
            explode(array(col("qbucket"),
              expr("qbucket ^ shiftleft(CAST(1 AS BIGINT), " +
                "CAST(weakest AS INT))"))).as("bucket"))
        val scored = q.join(withB.withColumnRenamed("vec_id", "cid")
            .withColumnRenamed("embedding", "ce"), Seq("bucket"))
          .filter(col("qid") =!= col("cid"))
          .select(col("qid"), col("cid"),
            cosine(col("qe"), col("ce")).as("cos"))
        scored.withColumn("rank", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("cos").desc, col("cid"))).cast("bigint"))
          .filter(col("rank") <= 3)
          .select(col("qid"), col("cid"), col("rank"),
            floor(col("cos") * 1000000).cast("bigint").as("score_e6"))
      },
      Some(s"""WITH comps AS (
        |  SELECT vec_id, pl.j,
        |    sum(floor(embedding[pl.d + 1]::DOUBLE * 1000000)::BIGINT * pl.w)
        |      AS dotj
        |  FROM embeddings CROSS JOIN $planesSql
        |  GROUP BY vec_id, pl.j),
        |buckets AS (
        |  SELECT vec_id,
        |    sum(CASE WHEN dotj >= 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT
        |      AS bucket
        |  FROM comps GROUP BY vec_id),
        |weak AS (SELECT vec_id, j AS weakest FROM (
        |    SELECT vec_id, j, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY abs(dotj), j) AS rn
        |    FROM comps) WHERE rn = 1),
        |withb AS (SELECT e.vec_id, e.embedding, b.bucket
        |  FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id),
        |probes AS (
        |  SELECT w.vec_id AS qid, w.embedding AS qe, w.bucket
        |  FROM withb w WHERE w.vec_id < 10
        |  UNION ALL
        |  SELECT w.vec_id, w.embedding,
        |         xor(w.bucket, (1::BIGINT << wk.weakest))
        |  FROM withb w JOIN weak wk ON w.vec_id = wk.vec_id
        |  WHERE w.vec_id < 10),
        |scored AS (SELECT p.qid, c.vec_id AS cid,
        |    ${cosineSql("p.qe", "c.embedding")} AS cos
        |  FROM probes p JOIN withb c ON p.bucket = c.bucket
        |  WHERE p.qid <> c.vec_id),
        |ranked AS (SELECT qid, cid, cos, row_number() OVER (
        |    PARTITION BY qid ORDER BY cos DESC, cid) AS rank FROM scored)
        |SELECT qid, cid, rank, floor(cos * 1000000)::BIGINT AS score_e6
        |FROM ranked WHERE rank <= 3""".stripMargin),
      "Multi-probe LSH (Lv et al. 2007): each query probes its own " +
        "bucket AND the bucket with its weakest hyperplane bit flipped " +
        "(smallest |dot| = the most marginal side decision) — 2x the " +
        "probes for a recall boost without re-hashing the corpus. All " +
        "margin decisions are exact integer dots; the probe expansion " +
        "is an explode + equi-join on bucket, never a widened scan."),
  )
}
