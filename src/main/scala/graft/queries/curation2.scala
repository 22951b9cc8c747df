package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Corpus, QueryDef, Tables}

/** Training-data curation operators, round 4: line-level corpus cleaning
  * (C4-style), incremental dedup against a historical fingerprint index,
  * statistical length-outlier removal, model-scored quality filtering
  * (stubbed scorer), and vocabulary-coverage / OOV profiling.
  *
  * These extend the reference's corpus hygiene (the per-record output-name
  * collision dedup of data_generation/generate_narratives_from_data.py:95-96
  * and the train/eval directory separation of
  * rag_evaluation/RAG-eval-test_model.py:237-243) to the operators a
  * 100 TB pretraining ingest actually runs between crawl and shard.
  */
object Curation2Queries {

  /** Canonical normalization shared with `text_normalize` — the pass every
    * fingerprint-based stage runs first. */
  private def norm(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  private val normSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------- C4-style line filter
    QueryDef(
      "c4_line_filter",
      (s, d) => {
        // The fixture corpus is unsegmented, so segmentation is explicit
        // and deterministic: fixed 10-token lines. The curation shape is
        // the C4 cleaning pass: segment -> per-line predicate (length,
        // lexical diversity) -> ordered rejoin of survivors.
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
        val lines = transform(
          sequence(lit(0), expr("(size(toks) - 1) div 10")),
          i => slice(col("toks"), i * lit(10) + lit(1), lit(10)))
        val keep = (a: Column) =>
          size(a) >= 5 && size(array_distinct(a)) >= 3
        docs
          .select(col("doc_id"), lines.as("la"))
          .select(col("doc_id"),
            size(col("la")).cast("bigint").as("n_lines"),
            filter(col("la"), keep).as("ka"))
          .select(col("doc_id"), col("n_lines"),
            size(col("ka")).cast("bigint").as("n_kept"),
            array_join(transform(col("ka"), a => array_join(a, " ")), "\n")
              .as("cleaned_text"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |lin AS (SELECT doc_id, i.i AS i,
        |    toks[i.i*10+1 : i.i*10+10] AS la
        |  FROM t, (SELECT range AS i FROM range(0, 16)) i
        |  WHERE i.i <= (len(toks) - 1) // 10),
        |flt AS (SELECT doc_id, i,
        |    array_to_string(la, ' ') AS line,
        |    (len(la) >= 5 AND len(list_distinct(la)) >= 3) AS keep
        |  FROM lin)
        |SELECT doc_id, count(*)::BIGINT AS n_lines,
        |  count(CASE WHEN keep THEN 1 END)::BIGINT AS n_kept,
        |  coalesce(string_agg(CASE WHEN keep THEN line END, chr(10)
        |                      ORDER BY i), '') AS cleaned_text
        |FROM flt GROUP BY doc_id""".stripMargin),
      "C4-style line-level cleaning: segment each document into lines, " +
        "apply per-line keep predicates (min length, min lexical " +
        "diversity), and reassemble survivors in order. Entirely " +
        "row-local HOFs (transform/filter/array_join) — a narrow, " +
        "codegen'd projection with zero shuffle, the only shape a " +
        "100 TB boilerplate-removal pass can afford. The 16-line " +
        "oracle range cap is pinned by FixtureBoundsSpec."),

    // -------------------------------------------------- incremental dedup
    QueryDef(
      "dedup_incremental",
      (s, d) => {
        val all = Corpus.withDups(s, d)
        // Historical index: normalized-text fingerprints of the already-
        // ingested corpus (even base ids). New batch: odd base ids plus
        // all injected re-crawls. Exact-dup injections collide with the
        // history; near-dup truncations do not (they are the LSH stage's
        // job) — incremental dedup is the exact-hash front gate.
        val hist = all
          .filter(col("doc_id") < 1000000L && pmod(col("doc_id"), lit(2)) === 0)
          .select(md5(norm(col("text"))).as("fp")).distinct()
        val batch = all
          .filter(col("doc_id") >= 1000000L || pmod(col("doc_id"), lit(2)) === 1)
          .select(col("doc_id"), md5(norm(col("text"))).as("fp"))
        batch.join(hist, Seq("fp"), "left_anti")
          .groupBy(col("fp"))
          .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
          .select(col("doc_id"), col("n_copies"),
            (col("doc_id") >= 1000000L).as("is_injected"))
      },
      Some(s"""WITH corpus AS (${Corpus.cte}),
        |hist AS (SELECT DISTINCT md5($normSql) AS fp
        |  FROM corpus WHERE doc_id < 1000000 AND doc_id % 2 = 0),
        |batch AS (SELECT doc_id, md5($normSql) AS fp
        |  FROM corpus WHERE doc_id >= 1000000 OR doc_id % 2 = 1)
        |SELECT min(doc_id) AS doc_id, count(*)::BIGINT AS n_copies,
        |       min(doc_id) >= 1000000 AS is_injected
        |FROM batch b
        |WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.fp = b.fp)
        |GROUP BY b.fp""".stripMargin),
      "Incremental ingest dedup: the new batch anti-joins a persistent " +
        "fingerprint index of everything already ingested (exact md5 of " +
        "normalized text), then first-wins dedups within itself. This is " +
        "how a continuously-crawled corpus stays exact-dup-free without " +
        "ever re-scanning history — the index is fingerprints only, " +
        "orders of magnitude smaller than the corpus, and the anti-join " +
        "shuffles fingerprints, never document bytes."),

    // -------------------------------------------- length outlier removal
    QueryDef(
      "length_outlier_filter",
      (s, d) => {
        val nt = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).cast("bigint").as("n_toks"))
        // Exact p5/p95 WITHOUT a global row sort: aggregate to a
        // value-level histogram first (|distinct lengths| rows, tiny at
        // any corpus scale), cumulate on that, and read the inverse-CDF
        // bounds off it. The only full-data ops are one groupBy and one
        // broadcast-bounds filter pass.
        val hist = nt.groupBy(col("n_toks")).agg(count(lit(1)).as("c"))
        val cum = hist.withColumn("cum",
          sum(col("c")).over(Window.orderBy(col("n_toks"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val tot = nt.agg(count(lit(1)).as("n"))
        val bounds = cum.crossJoin(broadcast(tot)).agg(
          min(when(col("cum") >= expr("(5*n + 99) div 100"), col("n_toks")))
            .as("lo_toks"),
          min(when(col("cum") >= expr("(95*n + 99) div 100"), col("n_toks")))
            .as("hi_toks"))
        nt.crossJoin(broadcast(bounds))
          .groupBy(col("lang"), col("lo_toks"), col("hi_toks"))
          .agg(
            count(when(col("n_toks").between(col("lo_toks"), col("hi_toks")),
              lit(1))).as("n_kept"),
            count(when(!col("n_toks").between(col("lo_toks"), col("hi_toks")),
              lit(1))).as("n_dropped"))
      },
      Some("""WITH nt AS (SELECT doc_id, lang,
        |    len(string_split(text, ' '))::BIGINT AS n_toks FROM documents),
        |hist AS (SELECT n_toks, count(*)::BIGINT AS c FROM nt GROUP BY 1),
        |cum AS (SELECT n_toks, (sum(c) OVER (ORDER BY n_toks))::BIGINT
        |          AS cum FROM hist),
        |tot AS (SELECT count(*)::BIGINT AS n FROM nt),
        |bounds AS (SELECT
        |    min(CASE WHEN cum >= (5*n + 99) // 100 THEN n_toks END)
        |      AS lo_toks,
        |    min(CASE WHEN cum >= (95*n + 99) // 100 THEN n_toks END)
        |      AS hi_toks
        |  FROM cum, tot)
        |SELECT lang, lo_toks, hi_toks,
        |  count(CASE WHEN n_toks BETWEEN lo_toks AND hi_toks THEN 1 END)
        |    ::BIGINT AS n_kept,
        |  count(CASE WHEN n_toks NOT BETWEEN lo_toks AND hi_toks THEN 1 END)
        |    ::BIGINT AS n_dropped
        |FROM nt, bounds GROUP BY 1, 2, 3""".stripMargin),
      "Statistical length-outlier removal: drop documents outside the " +
        "exact [p5, p95] token-length band (inverse-CDF bounds). The " +
        "quantiles come from a value-level histogram + cumulative sum — " +
        "never a global sort of the corpus — so the plan is one " +
        "map-side-combinable agg over ~|distinct lengths| values plus a " +
        "broadcast of two numbers back over the scan."),

    // ------------------------------------- model-scored quality filter
    QueryDef(
      "perplexity_filter_stub",
      (s, d) => {
        // Stubbed LM scorer (deterministic md5-derived pseudo-perplexity
        // in [1000, 9000) millinats) — the Spark-side plumbing of a
        // model-based quality filter: score every doc, threshold, report
        // retention per language. Swap `ppl` for a real inference UDF
        // (mapInPandas batch scoring) without touching the aggregation.
        val ppl = (pmod(conv(substring(md5(col("text")), 1, 8), 16, 10)
          .cast("long"), lit(8000L)) + lit(1000L)).as("ppl_e3")
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), ppl)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            count(when(col("ppl_e3") < 7400, lit(1))).as("n_kept"),
            sum(when(col("ppl_e3") < 7400, col("ppl_e3"))).as("sum_ppl_kept"))
          .select(col("lang"), col("n_docs"), col("n_kept"),
            expr("CASE WHEN n_kept = 0 THEN -1 " +
              "ELSE sum_ppl_kept div n_kept END").as("mean_ppl_kept_e3"))
      },
      Some("""WITH p AS (SELECT doc_id, lang,
        |    ((('0x' || substr(md5(text), 1, 8))::BIGINT) % 8000) + 1000
        |      AS ppl_e3
        |  FROM documents)
        |SELECT lang, count(*)::BIGINT AS n_docs,
        |  count(CASE WHEN ppl_e3 < 7400 THEN 1 END)::BIGINT AS n_kept,
        |  CASE WHEN count(CASE WHEN ppl_e3 < 7400 THEN 1 END) = 0 THEN -1
        |       ELSE sum(CASE WHEN ppl_e3 < 7400 THEN ppl_e3 END)
        |            // count(CASE WHEN ppl_e3 < 7400 THEN 1 END)
        |  END::BIGINT AS mean_ppl_kept_e3
        |FROM p GROUP BY lang""".stripMargin),
      "Model-scored quality filtering with the scorer stubbed " +
        "deterministically (md5-derived pseudo-perplexity): threshold at " +
        "7.4 nats, report per-language retention and mean kept score in " +
        "fixed-point millinats. The real-model swap-in point is the " +
        "score column only; the scale shape (narrow score pass, one " +
        "small agg) is exactly a production LM-filter stage."),

    // ------------------------------------------- vocabulary coverage
    QueryDef(
      "vocab_oov_rate",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        // Vocabulary = top-16 tokens by global frequency (deterministic
        // tie-break). The frequency agg collapses the corpus to
        // |token types| rows before the single-partition ranking window
        // — the window never sees corpus-scale data.
        val vocab = tok.groupBy(col("tok")).agg(count(lit(1)).as("c"))
          .select(col("tok"), row_number().over(
            Window.orderBy(col("c").desc, col("tok"))).as("r"))
          .filter(col("r") <= 16)
          .select(col("tok"), lit(1L).as("iv"))
        tok.join(broadcast(vocab), Seq("tok"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_toks"),
            (count(lit(1)) - count(col("iv"))).as("n_oov"))
          .select(col("doc_id"), col("n_toks"), col("n_oov"),
            expr("(n_oov * 1000) div n_toks").as("oov_permille"))
      },
      Some("""WITH tok AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |freq AS (SELECT tok, count(*)::BIGINT AS c FROM tok GROUP BY tok),
        |vocab AS (SELECT tok FROM (SELECT tok,
        |    row_number() OVER (ORDER BY c DESC, tok) AS r FROM freq)
        |  WHERE r <= 16)
        |SELECT t.doc_id, count(*)::BIGINT AS n_toks,
        |  count(CASE WHEN v.tok IS NULL THEN 1 END)::BIGINT AS n_oov,
        |  ((count(CASE WHEN v.tok IS NULL THEN 1 END) * 1000) // count(*))
        |    ::BIGINT AS oov_permille
        |FROM tok t LEFT JOIN vocab v ON v.tok = t.tok
        |GROUP BY t.doc_id""".stripMargin),
      "Tokenizer-vocabulary coverage profiling: build the top-k " +
        "frequency vocabulary, broadcast it, and compute each " +
        "document's out-of-vocabulary rate in permille. The token " +
        "explode stays narrow (broadcast membership probe, no " +
        "token-keyed shuffle); the only shuffle re-aggregates per " +
        "doc_id — the pass that decides tokenizer fit before a " +
        "100 TB tokenization run."),

    // --------------------------------------- statistical LM quality score
    QueryDef(
      "bigram_lm_score",
      (s, d) => {
        val toksC = split(col("text"), " ")
        val docs = Tables.documents(s, d)
        // Per-doc bigram instances, built row-locally from two shifted
        // slices (split runs once; no token-keyed explode before the
        // stats join).
        val bi = docs.select(col("doc_id"),
            explode(zip_with(
              slice(toksC, lit(1), size(toksC) - 1),
              slice(toksC, lit(2), size(toksC) - 1),
              (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
          .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
        val uni = docs
          .select(explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("cu"))
        val bc = bi.groupBy(col("w1"), col("w2"))
          .agg(count(lit(1)).as("cb"))
        bi.join(broadcast(bc), Seq("w1", "w2"))
          .join(broadcast(uni.withColumnRenamed("tok", "w1")), Seq("w1"))
          .select(col("doc_id"), expr("(1000000 * cb) div cu").as("sc"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"), sum(col("sc")).as("ssum"))
          .select(col("doc_id"), col("n_bigrams"),
            expr("ssum div n_bigrams").as("lm_score_e6"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |uni AS (SELECT t2.tok, count(*)::BIGINT AS cu
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
        |        FROM documents) t2 GROUP BY 1),
        |bi AS (SELECT doc_id, toks[i.i + 1] AS w1, toks[i.i + 2] AS w2
        |  FROM t, (SELECT range AS i FROM range(0, 128)) i
        |  WHERE i.i <= len(toks) - 2),
        |bc AS (SELECT w1, w2, count(*)::BIGINT AS cb FROM bi GROUP BY 1, 2)
        |SELECT b.doc_id, count(*)::BIGINT AS n_bigrams,
        |  (sum((1000000 * bc.cb) // u.cu) // count(*))::BIGINT
        |    AS lm_score_e6
        |FROM bi b JOIN bc ON bc.w1 = b.w1 AND bc.w2 = b.w2
        |JOIN uni u ON u.tok = b.w1
        |GROUP BY b.doc_id""".stripMargin),
      "Statistical bigram-LM quality score, no stub: corpus-MLE " +
        "P(w2|w1) in fixed point (floor(1e6 * c(w1 w2) / c(w1))), " +
        "averaged per document — the self-supervised fluency signal a " +
        "pretraining filter computes when no external LM is available. " +
        "The n-gram statistics collapse to vocabulary-sized tables and " +
        "broadcast; documents are scored in place, so the corpus scan " +
        "stays narrow and only the per-doc agg shuffles."),

    // ------------------------------------------- dataset mixture rates
    QueryDef(
      "domain_mixture_rebalance",
      (s, d) => {
        val perSrc = Tables.documents(s, d)
          .select(col("source"),
            size(split(col("text"), " ")).cast("bigint").as("n"))
          .groupBy(col("source")).agg(sum(col("n")).as("n_tokens"))
        val tot = perSrc.agg(sum(col("n_tokens")).as("total"),
          count(lit(1)).as("n_sources"))
        perSrc.crossJoin(broadcast(tot))
          .select(col("source"), col("n_tokens"),
            expr("(1000 * n_tokens) div total").as("share_permille"),
            least(lit(1000L),
              expr("(1000 * (total div n_sources)) div n_tokens"))
              .as("sample_rate_permille"))
          .withColumn("sampled_tokens",
            expr("(n_tokens * sample_rate_permille) div 1000"))
      },
      Some("""WITH per AS (SELECT source,
        |    sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT sum(n_tokens)::BIGINT AS total,
        |    count(*)::BIGINT AS n_sources FROM per)
        |SELECT source, n_tokens,
        |  ((1000 * n_tokens) // total)::BIGINT AS share_permille,
        |  least(1000, (1000 * (total // n_sources)) // n_tokens)::BIGINT
        |    AS sample_rate_permille,
        |  ((n_tokens * least(1000, (1000 * (total // n_sources))
        |      // n_tokens)) // 1000)::BIGINT AS sampled_tokens
        |FROM per, tot""".stripMargin),
      "Dataset-mixture rebalancing: per-domain token counts vs a " +
        "uniform target share, emitting the deterministic downsampling " +
        "rate (permille) that equalizes domains without upsampling — " +
        "the static mixture computation run before sharding a " +
        "pretraining corpus. One domain-level agg plus a broadcast of " +
        "the two totals; the rates then drive sample_subset-style " +
        "md5-bucket sampling over the full corpus."),
  )
}
