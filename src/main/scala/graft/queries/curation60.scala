package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{QueryDef, Tables}

/** Batch 60: exact duplicate-SUBSTRING detection — the Lee et al. 2022
  * ("Deduplicating Training Data Makes Language Models Better")
  * ExactSubstr operation, which document-level dedup (exact hash,
  * MinHash, SimHash — dedup.scala) cannot express: two distinct
  * documents sharing a 50-token boilerplate block are kept by every
  * document-level method, yet that block is exactly what the LM
  * memorizes.  Their tool builds one suffix array over the whole
  * corpus; the Spark-first equivalent is the k-gram form: a length-k
  * duplicated window exists iff every k-token gram inside it is
  * duplicated, so hashing all k-grams, keeping the ones that occur
  * more than once, and merging overlapping survivors per document
  * yields exactly the maximal duplicated spans at gram resolution.
  *
  * Scale shape vs the suffix array: a suffix array needs a global
  * sort of corpus-size suffixes (comparison cost O(match length));
  * the k-gram form needs one shuffle of corpus-token-count FIXED
  * 8-byte hashes (gram strings are hashed scan-side and never
  * shuffled) for the count, one equi-join on the same key to mark
  * survivors, and a per-DOCUMENT window to merge — doc_id is the
  * partition key, so window state is bounded by one document's
  * length, never by an enum (the PlanAuditSpec invariant).  All
  * stages are map-side-combinable aggregates or equi-joins: the plan
  * scales with cluster width.
  *
  * k = 8 tokens (the repo shingle convention); hashes are the 60-bit
  * md5 prefix (dedup.scala:80 convention).  At 2^60 over corpus-scale
  * gram counts, hash collisions would mark a non-duplicated gram as
  * duplicated with probability ~n^2/2^61 — at 100 TB one swaps to the
  * 128-bit digest or re-verifies survivors against gram text; at test
  * scale the oracle computes the identical hash, so results agree
  * regardless.  Positions are 1-based token indices in both engines.
  */
object Curation60Queries {

  private val K = 8

  /** (doc_id, source, pos, h) one row per k-gram occurrence, through
    * the native [[graft.functions.GramKernel.posGramHashes60]]
    * generator — one pass over the document bytes inside the scan
    * stage, no interpreted HOF lambda, no per-gram string/slice
    * allocation (GramKernelSpec pins byte parity with the declarative
    * filter/sequence/slice/md5 form, including the <K-token drop). */
  private def gramOccurrences(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        graft.functions.GramKernel.posGramHashes60(col("text"), K)
          .as(Seq("pos", "h")))

  /** occurrences of grams that appear more than once corpus-wide */
  private def dupOccurrences(s: SparkSession, d: String): DataFrame = {
    // The gram stream feeds two consumers (the count aggregate and
    // the probe side of the survivor join); materializing stops the
    // corpus tokenize+md5 pass — the dominant scan-side cost — from
    // running twice.  Through a per-invocation SCRATCH PARQUET
    // (Scratch.materialize), not persist(): the stream is ~k x the
    // corpus, and caching that in executor storage starves execution
    // memory at 100 TB — the parquet boundary spills to disk by
    // construction and survives executor loss; the plan above it is
    // unchanged.
    // Scratch.spread inside the write job only (pure scan -> kernel ->
    // write, no downstream exchange in that job — the one shape where
    // spreading the single fixture split wins; the direct
    // dup_gram_multiplicity path stays unspread, its kernel feeds an
    // aggregate exchange and spreading it measured slower)
    val occ = graft.Scratch.materialize(s,
      graft.Scratch.spread(Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text")))
        .select(col("doc_id"), col("source"),
          graft.functions.GramKernel.posGramHashes60(col("text"), K)
            .as(Seq("pos", "h"))), "dupocc")
    // count per hash (map-side partials; fixed-width key), keep h>1,
    // then equi-join the occurrence stream back on the same key — at
    // sf the count side broadcasts via AQE, at corpus scale both
    // sides shuffle on h, which is the algorithm's one inherent
    // corpus-size exchange (vs the suffix array's global sort)
    val dupH = occ.groupBy(col("h")).agg(count(lit(1)).as("n_occ"))
      .where(col("n_occ") > 1)
    occ.join(dupH, Seq("h"))
  }

  /** maximal duplicated spans per doc:
    * (doc_id, source, span_start, span_end, span_len) */
  private def dupSpans(s: SparkSession, d: String): DataFrame = {
    // gaps-and-islands over positions WITHIN one document: a new span
    // starts when this gram's window [pos, pos+K-1] neither overlaps
    // nor touches the previous one (pos - prev > K).  Ends pos+K-1
    // are monotone in pos with fixed K, so lag(pos) suffices — no
    // running max needed.  Partition key doc_id: state bounded by
    // one document's gram count.
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    dupOccurrences(s, d)
      .withColumn("new_span",
        when(lag(col("pos"), 1).over(w).isNull
          .or(col("pos") - lag(col("pos"), 1).over(w) > K), 1L)
          .otherwise(0L))
      .withColumn("span_id", sum(col("new_span")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("source"), col("span_id"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(K - 1)).as("span_end"))
      .withColumn("span_len", col("span_end") - col("span_start") + 1)
      .select(col("doc_id"), col("source"), col("span_start"),
        col("span_end"), col("span_len"))
  }

  /** DuckDB mirror of occurrences -> duplicated survivors -> spans */
  private val oracleCtes: String =
    s"""WITH toks AS (
      |  SELECT doc_id, source,
      |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS t
      |  FROM documents),
      |occ AS (
      |  SELECT doc_id, source, i AS pos,
      |    ('0x' || substr(md5(array_to_string(
      |       list_slice(t, i, i + ${K - 1}), ' ')), 1, 15))::BIGINT AS h
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - ${K - 2})) AS i) r
      |  WHERE len(t) >= $K),
      |duph AS (SELECT h FROM occ GROUP BY h HAVING count(*) > 1),
      |dupocc AS (SELECT o.* FROM occ o JOIN duph USING (h)),
      |flagged AS (
      |  SELECT doc_id, source, pos,
      |    CASE WHEN lag(pos) OVER w IS NULL THEN 1
      |         WHEN pos - lag(pos) OVER w > $K THEN 1 ELSE 0 END AS new_span
      |  FROM dupocc
      |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |islands AS (
      |  SELECT doc_id, source, pos,
      |    sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS UNBOUNDED PRECEDING) AS span_id
      |  FROM flagged),
      |spans AS (
      |  SELECT doc_id, source, min(pos)::BIGINT AS span_start,
      |    (max(pos) + ${K - 1})::BIGINT AS span_end,
      |    (max(pos) + ${K - 1} - min(pos) + 1)::BIGINT AS span_len
      |  FROM islands GROUP BY doc_id, source, span_id)
      |""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ----------------------------------------- the spans themselves
    QueryDef(
      "dup_kgram_spans",
      (s, d) => dupSpans(s, d)
        .select(col("doc_id"), col("span_start"), col("span_end"),
          col("span_len"))
        .orderBy(col("doc_id"), col("span_start")),
      Some(oracleCtes +
        """SELECT doc_id, span_start, span_end, span_len
          |FROM spans ORDER BY doc_id, span_start""".stripMargin),
      "Maximal duplicated substrings at 8-gram resolution, per " +
        "document, as 1-based token spans — the ExactSubstr " +
        "operation of Lee et al. 2022, re-expressed so the heavy " +
        "step is a fixed-width-key shuffle count + equi-join instead " +
        "of a corpus-global suffix-array sort.  The span merge is a " +
        "gaps-and-islands window partitioned by doc_id (state " +
        "bounded by one document, not an enum).  The span table " +
        "flags EVERY occurrence of duplicated material; a keep-one " +
        "policy (Lee et al. retain one copy per repeated block) is a " +
        "downstream choice — e.g. keep the span whose (doc_id, pos) " +
        "is minimal in its gram cluster — applied over this table."),

    // ---------------------------------- what removal would save, per source
    QueryDef(
      "dup_span_removal_stats",
      (s, d) => {
        val spans = dupSpans(s, d)
          .groupBy(col("source"))
          .agg(countDistinct(col("doc_id")).as("n_docs_hit"),
            sum(col("span_len")).as("dup_tokens"))
        val totals = Tables.documents(s, d)
          .select(col("source"),
            expr("size(filter(split(text, ' '), w -> length(w) > 0))")
              .cast("bigint").as("n_toks"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("total_tokens"))
        totals.join(spans, Seq("source"), "left")
          .select(col("source"), col("n_docs"),
            coalesce(col("n_docs_hit"), lit(0L)).as("n_docs_hit"),
            col("total_tokens"),
            coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
            expr("(coalesce(dup_tokens, 0L) * 1000L) div total_tokens")
              .as("dup_permille"))
          .orderBy(col("source"))
      },
      Some(oracleCtes +
        """, per_src AS (
          |  SELECT source, count(DISTINCT doc_id)::BIGINT AS n_docs_hit,
          |    sum(span_len)::BIGINT AS dup_tokens
          |  FROM spans GROUP BY source),
          |totals AS (
          |  SELECT source, count(*)::BIGINT AS n_docs,
          |    sum(len(list_filter(string_split(text, ' '),
          |      w -> length(w) > 0)))::BIGINT AS total_tokens
          |  FROM documents GROUP BY source)
          |SELECT t.source, t.n_docs,
          |  coalesce(p.n_docs_hit, 0)::BIGINT AS n_docs_hit,
          |  t.total_tokens, coalesce(p.dup_tokens, 0)::BIGINT AS dup_tokens,
          |  ((coalesce(p.dup_tokens, 0) * 1000) // t.total_tokens)::BIGINT
          |    AS dup_permille
          |FROM totals t LEFT JOIN per_src p ON p.source = t.source
          |ORDER BY t.source""".stripMargin),
      "The dedup planning readout: per source, how many documents " +
        "carry duplicated spans and what permille of the source's " +
        "tokens sits inside them — an UPPER BOUND on the ExactSubstr " +
        "cut (keep-one removal retains one copy per repeated block, " +
        "so it saves less than this flagged total), and the number " +
        "that decides whether a source is boilerplate-ridden enough " +
        "to need substring dedup before training.  Span stats and " +
        "source totals are both source-cardinality aggregates joined " +
        "at enum size; the corpus-size work is shared with " +
        "dup_kgram_spans."),

    // ------------------------------------------- gram multiplicity profile
    QueryDef(
      "dup_gram_multiplicity",
      (s, d) => gramOccurrences(s, d)
        .groupBy(col("h")).agg(count(lit(1)).as("n_occ"))
        .groupBy(col("n_occ")).agg(count(lit(1)).as("n_grams"))
        .orderBy(col("n_occ")),
      Some(s"""WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS t
        |  FROM documents),
        |occ AS (
        |  SELECT ('0x' || substr(md5(array_to_string(
        |      list_slice(t, i, i + ${K - 1}), ' ')), 1, 15))::BIGINT AS h
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - ${K - 2})) AS i) r
        |  WHERE len(t) >= $K),
        |counts AS (SELECT h, count(*)::BIGINT AS n_occ FROM occ GROUP BY h)
        |SELECT n_occ, count(*)::BIGINT AS n_grams FROM counts
        |GROUP BY n_occ ORDER BY n_occ""".stripMargin),
      "The multiplicity histogram of all 8-grams (how many grams " +
        "occur exactly n times) — the profile that sizes the " +
        "substring-dedup job before running it: the n>=2 tail is the " +
        "survivor set the span pass will shuffle, and a heavy tail " +
        "says raise k or pre-filter hot grams.  Two nested counts, " +
        "both map-side combinable; the second aggregates over " +
        "distinct-gram cardinality and its output is bounded by the " +
        "occurrence-count domain.")
  )
}
