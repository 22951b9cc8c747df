package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Corpus, QueryDef, Tables}

/** Training-data curation operators, round 4 continued: cross-document
  * line-level dedup (the C4 "keep one occurrence of any repeated span"
  * pass, as opposed to the per-document predicate filter of
  * `c4_line_filter`), boilerplate-line detection, SCD2 validity-interval
  * history, two-sided linear interpolation, per-dimension embedding
  * statistics, per-group heavy hitters, and fixed-count per-group
  * sampling.
  *
  * Reference grounding: the reference's only corpus hygiene is output-name
  * collision dedup (data_generation/generate_narratives_from_data.py:95-96)
  * and train/eval directory separation
  * (rag_evaluation/RAG-eval-test_model.py:237-243); these operators are
  * the cross-document and temporal generalizations a 100 TB ingest runs.
  */
object Curation3Queries {

  /** Fixed 10-token line segmentation shared with `c4_line_filter` —
    * (doc_id, i, line) rows. The 16-line oracle cap is pinned by
    * FixtureBoundsSpec. */
  private def lineRows(s: SparkSession, d: String): DataFrame =
    Corpus.withDups(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), expr("(size(toks) - 1) div 10")),
          i => array_join(slice(col("toks"), i * lit(10) + lit(1), lit(10)), " ")))
          .as(Seq("i", "line")))

  private val lineRowsSql: String =
    """corpus AS (%s),
      |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
      |lin AS (SELECT doc_id, i.i AS i,
      |    array_to_string(toks[i.i*10+1 : i.i*10+10], ' ') AS line
      |  FROM t, (SELECT range AS i FROM range(0, 16)) i
      |  WHERE i.i <= (len(toks) - 1) // 10)""".stripMargin.format(Corpus.cte)

  val defs: Seq[QueryDef] = Seq(

    // -------------------------------------- cross-document line dedup
    QueryDef(
      "line_dedup_global",
      (s, d) => {
        // Globally-first occurrence wins. NOT a row_number window over
        // partitionBy(line): a viral boilerplate line would funnel all
        // its instances into one partition and sort them. min(struct)
        // aggregation is partial-aggregatable — hot lines collapse
        // map-side to one candidate per task before the shuffle — and
        // the winner joins back to flag the single kept instance.
        val lines = lineRows(s, d)
        val winners = lines
          .groupBy(col("line"))
          .agg(min(struct(col("doc_id"), col("i"))).as("w"))
        lines.join(winners, Seq("line"))
          .withColumn("kept",
            col("doc_id") === col("w.doc_id") && col("i") === col("w.i"))
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_lines"),
            count(when(col("kept"), lit(1))).as("n_kept"),
            array_join(
              transform(
                array_sort(collect_list(
                  when(col("kept"), struct(col("i"), col("line"))))),
                x => x.getField("line")),
              "\n").as("cleaned_text"))
      },
      Some(s"""WITH $lineRowsSql,
        |rk AS (SELECT doc_id, i, line,
        |    row_number() OVER (PARTITION BY line ORDER BY doc_id, i) AS rk
        |  FROM lin)
        |SELECT doc_id, count(*)::BIGINT AS n_lines,
        |  count(CASE WHEN rk = 1 THEN 1 END)::BIGINT AS n_kept,
        |  coalesce(string_agg(CASE WHEN rk = 1 THEN line END, chr(10)
        |                      ORDER BY i), '') AS cleaned_text
        |FROM rk GROUP BY doc_id""".stripMargin),
      "Cross-document line-level dedup (the C4 span-dedup pass): every " +
        "repeated line keeps exactly its globally-first occurrence " +
        "(doc_id, position), all later copies are dropped, and documents " +
        "are reassembled in order. The winner per line is min(struct) — " +
        "partial-aggregatable, so a viral boilerplate line collapses " +
        "map-side instead of hot-spotting one sort partition (the " +
        "row_number-over-line form does not have this property). At " +
        "100 TB shuffle md5(line) instead of line bytes. Run over the " +
        "dup-injected corpus so cross-doc repeats exist."),

    // ------------------------------------------- boilerplate detection
    QueryDef(
      "boilerplate_lines",
      (s, d) => lineRows(s, d)
        .groupBy(col("line"))
        .agg(countDistinct(col("doc_id")).as("doc_freq"),
          min(col("doc_id")).as("first_doc"))
        .filter(col("doc_freq") >= 2),
      Some(s"""WITH $lineRowsSql
        |SELECT line, count(DISTINCT doc_id)::BIGINT AS doc_freq,
        |       min(doc_id) AS first_doc
        |FROM lin GROUP BY line HAVING count(DISTINCT doc_id) >= 2""".stripMargin),
      "Boilerplate-line detection: lines occurring in >= 2 distinct " +
        "documents (headers, footers, licence blocks in a crawl). One " +
        "hash aggregation on the line with map-side partial " +
        "count-distinct; the surviving list is tiny and broadcasts back " +
        "as a removal filter — the usual companion pass to " +
        "line_dedup_global when policy is 'drop everywhere' rather than " +
        "'keep first'."),

    // ------------------------------------------------- SCD2 history
    QueryDef(
      "scd2_history",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("valid_from_us"), col("o_orderkey"))
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("valid_from_us"))
          .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
          .withColumn("is_current", col("valid_to_us").isNull)
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus,
        |  epoch_us(o_orderdate::TIMESTAMP) AS valid_from_us,
        |  lead(epoch_us(o_orderdate::TIMESTAMP)) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS valid_to_us,
        |  lead(epoch_us(o_orderdate::TIMESTAMP)) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
        |FROM orders""".stripMargin),
      "SCD2 history build: each customer's change events become " +
        "[valid_from, valid_to) validity intervals via lead() — " +
        "valid_to NULL marks the current version. One shuffle on the " +
        "business key, sort within partition; ties broken by the " +
        "surrogate key so interval edges are deterministic. The " +
        "warehouse-side complement to compact_latest_state (which keeps " +
        "only the newest version)."),

    // ---------------------------------------- linear interpolation
    QueryDef(
      "interpolate_linear",
      (s, d) => {
        // Same null synthesis as forward_fill_locf: 'error' events carry
        // no reading. Interpolate linearly between the user's neighboring
        // readings; fall back to LOCF/NOCB at the edges (and on a
        // zero-width time gap).
        val ord = Seq(col("t_us"), col("event_id"))
        val wPrev = Window.partitionBy(col("user_id")).orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, -1)
        val wNext = Window.partitionBy(col("user_id")).orderBy(ord: _*)
          .rowsBetween(1, Window.unboundedFollowing)
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("t_us"),
            when(col("event_type") =!= "error",
              floor(col("value") * 1000).cast("bigint")).as("reading_e3"))
          .withColumn("pv", last(col("reading_e3"), ignoreNulls = true).over(wPrev))
          .withColumn("pt", last(when(col("reading_e3").isNotNull, col("t_us")),
            ignoreNulls = true).over(wPrev))
          .withColumn("nv", first(col("reading_e3"), ignoreNulls = true).over(wNext))
          .withColumn("nt", first(when(col("reading_e3").isNotNull, col("t_us")),
            ignoreNulls = true).over(wNext))
          .select(col("event_id"), col("user_id"), col("t_us"), col("reading_e3"),
            when(col("reading_e3").isNotNull, col("reading_e3").cast("double"))
              .when(col("pv").isNotNull && col("nv").isNotNull &&
                col("nt") =!= col("pt"),
                col("pv") + (col("nv") - col("pv")) *
                  ((col("t_us") - col("pt")) / (col("nt") - col("pt"))))
              .otherwise(coalesce(col("pv"), col("nv")).cast("double"))
              .as("interp_e3"))
      },
      Some("""WITH b AS (SELECT event_id, user_id,
        |    epoch_us(ts::TIMESTAMP) AS t_us,
        |    CASE WHEN event_type != 'error'
        |         THEN floor(value * 1000)::BIGINT END AS reading_e3
        |  FROM events),
        |w AS (SELECT *,
        |    last_value(reading_e3 IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY t_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
        |    last_value(CASE WHEN reading_e3 IS NOT NULL THEN t_us END
        |               IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY t_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
        |    first_value(reading_e3 IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY t_us, event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN reading_e3 IS NOT NULL THEN t_us END
        |               IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY t_us, event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
        |  FROM b)
        |SELECT event_id, user_id, t_us, reading_e3,
        |  CASE WHEN reading_e3 IS NOT NULL THEN reading_e3::DOUBLE
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt != pt
        |         THEN pv + (nv - pv) * ((t_us - pt) / (nt - pt))
        |       ELSE coalesce(pv, nv)::DOUBLE END AS interp_e3
        |FROM w""".stripMargin),
      "Two-sided linear interpolation of missing readings: each NULL " +
        "gets pv + (nv-pv) * elapsed-fraction from the user's " +
        "neighboring non-null readings (LOCF/NOCB at series edges). " +
        "Four ignoreNulls window passes over one sorted partition — one " +
        "shuffle total, linear per-partition cost regardless of gap " +
        "length. Readings are on the e3 fixed-point grid and the " +
        "interpolation expression tree is identical in both engines, so " +
        "the IEEE result is bit-reproducible."),

    // --------------------------------------- embedding dimension stats
    QueryDef(
      "embedding_dim_stats",
      (s, d) => Tables.embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("dim").cast("bigint").as("dim"),
          floor(col("x").cast("double") * 1000).cast("bigint").as("q"))
        .groupBy(col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("q")).as("s1"),
          sum(col("q") * col("q")).as("s2"),
          min(col("q")).as("min_e3"), max(col("q")).as("max_e3"))
        .select(col("dim"), col("n"),
          (col("s1") / col("n") / lit(1000.0)).as("mean"),
          ((col("s2") - col("s1") * col("s1") / col("n")) / col("n")
            / lit(1000000.0)).as("variance"),
          col("min_e3"), col("max_e3")),
      Some("""WITH q AS (SELECT i.i AS dim,
        |    floor(embedding[i.i + 1]::DOUBLE * 1000)::BIGINT AS q
        |  FROM embeddings, (SELECT range AS i FROM range(0, 64)) i),
        |m AS (SELECT dim, count(*)::BIGINT AS n,
        |    sum(q)::BIGINT AS s1, sum(q*q)::BIGINT AS s2,
        |    min(q) AS min_e3, max(q) AS max_e3
        |  FROM q GROUP BY dim)
        |SELECT dim, n, s1 / n / 1000.0 AS mean,
        |  (s2 - s1 * s1 / n) / n / 1000000.0 AS variance,
        |  min_e3, max_e3
        |FROM m""".stripMargin),
      "Per-dimension embedding statistics (mean/variance/range) on the " +
        "e3 fixed-point grid — exact integer moments make the result " +
        "order-independent (the variance_fixed_point argument), so the " +
        "same numbers come back at any partitioning. These are the " +
        "whitening/standardization stats: 64 rows broadcast back to " +
        "z-score every vector. At 100 TB replace posexplode (64x row " +
        "blow-up through the shuffle) with a single vector-sum " +
        "aggregate over the array column; the grid and moments are " +
        "unchanged."),

    // --------------------------------------- per-group heavy hitters
    QueryDef(
      "topk_terms_per_lang",
      (s, d) => {
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("n").desc, col("tok"))
        Tables.documents(s, d)
          .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("lang"), col("tok"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("lang"), col("tok"), col("n"), col("rk").cast("bigint").as("rk"))
      },
      Some("""WITH c AS (SELECT lang, t.tok AS tok, count(*)::BIGINT AS n
        |  FROM documents, unnest(string_split(text, ' ')) AS t(tok)
        |  GROUP BY lang, t.tok)
        |SELECT lang, tok, n, rk FROM (
        |  SELECT lang, tok, n,
        |    row_number() OVER (PARTITION BY lang
        |                       ORDER BY n DESC, tok) AS rk
        |  FROM c) WHERE rk <= 3""".stripMargin),
      "Per-group heavy hitters: top-3 most frequent tokens per language " +
        "by exact count, ties broken lexically. Token counts aggregate " +
        "map-side before the shuffle; the rank filter plans as " +
        "WindowGroupLimit, so each partition keeps only its top " +
        "candidates before the window sort (audited in PlanAuditSpec). " +
        "At 100 TB the exact count stage swaps to Count-Min + " +
        "candidate verification (SketchSpec documents the error bound)."),

    // ------------------------------------ fixed-count group sampling
    QueryDef(
      "sample_fixed_per_group",
      (s, d) => {
        val w = Window.partitionBy(col("lang"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"))
          .withColumn("rk", row_number().over(w).cast("bigint"))
          .filter(col("rk") <= 5)
      },
      Some("""SELECT doc_id, lang, rk FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |                       ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
        |  FROM documents) WHERE rk <= 5""".stripMargin),
      "Exactly-N-per-group deterministic sample: rank rows inside each " +
        "group by a content hash (uniform pseudo-random but " +
        "reproducible) and keep the first 5 — the eval-slice / " +
        "inspection-sample primitive where sample_stratified's " +
        "per-group *fractions* don't give fixed counts. Plans as " +
        "WindowGroupLimit: per-partition top-5 precedes the shuffle, so " +
        "the full table is never sorted. The md5 order also makes the " +
        "sample stable under re-partitioning and re-runs."),
  )
}
