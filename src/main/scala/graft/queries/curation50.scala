package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 50: code/infilling-era training-data mechanics — FIM span
  * planning (Bavarian et al. 2022, "Efficient Training of Language
  * Models to Fill in the Middle"), padding-waste accounting by
  * power-of-two batch bins (the serving/batching dual of
  * pack_sequences' packing), and per-source n-gram novelty (the
  * exclusive-content complement of source_overlap_matrix's shared-
  * vocabulary view).  Integer-exact throughout.
  */
object Curation50Queries {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------- FIM span plan
    QueryDef(
      "fim_split_plan",
      (s, d) => {
        // Deterministic prefix/middle/suffix token split at the 40% and
        // 60% boundaries: the PSM reordering plan (prefix, suffix,
        // middle + 3 sentinel tokens).  Pure per-row arithmetic — no
        // shuffle at all; at 100 TB this is a narrow map over the scan.
        Tables.documents(s, d)
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_toks"))
          .filter(col("n_toks") >= 5)
          .select(col("doc_id"), col("n_toks"),
            expr("n_toks * 2 div 5").as("p_len"),
            expr("n_toks * 3 div 5 - n_toks * 2 div 5").as("m_len"),
            expr("n_toks - n_toks * 3 div 5").as("s_len"))
          .withColumn("psm_len", col("p_len") + col("s_len") +
            col("m_len") + lit(3L))
      },
      Some("""WITH t AS (SELECT doc_id,
        |    len(string_split(text, ' '))::BIGINT AS n_toks
        |  FROM documents WHERE len(string_split(text, ' ')) >= 5)
        |SELECT doc_id, n_toks,
        |  n_toks * 2 // 5 AS p_len,
        |  n_toks * 3 // 5 - n_toks * 2 // 5 AS m_len,
        |  n_toks - n_toks * 3 // 5 AS s_len,
        |  n_toks + 3 AS psm_len
        |FROM t""".stripMargin),
      "Fill-in-the-middle span planning (Bavarian et al. 2022): each " +
        "doc split into prefix/middle/suffix at the deterministic " +
        "40%/60% token boundaries, with the reordered PSM length " +
        "including the 3 sentinel tokens.  Conservation (p+m+s = n) " +
        "holds by construction of the floor-division boundaries.  " +
        "Zero-shuffle narrow map — the FIM transform costs nothing " +
        "beyond the scan at any scale."),

    // ----------------------------------- batch-bin padding waste
    QueryDef(
      "seq_length_bins_waste",
      (s, d) => {
        // Pad-to-power-of-two batching: each doc rounds up to the next
        // bin in {16,...,2048}; waste = padding tokens the batcher
        // burns.  The CASE ladder is exact on both engines (no float
        // log2); one groupBy on a <= 8-value key.
        val binExpr = "CASE " +
          Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L)
            .map(b => s"WHEN n_toks <= $b THEN ${b}L").mkString(" ") +
          " ELSE 4096L END"
        Tables.documents(s, d)
          .select(size(split(col("text"), " ")).cast("long").as("n_toks"))
          .selectExpr("n_toks", s"$binExpr AS bin")
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_toks")).as("sum_toks"))
          .select(col("bin"), col("n_docs"), col("sum_toks"),
            (col("n_docs") * col("bin") - col("sum_toks")).as("pad_waste"),
            expr("sum_toks * 1000 div (n_docs * bin)").as("fill_permille"))
      },
      Some("""WITH t AS (SELECT len(string_split(text, ' '))::BIGINT
        |    AS n_toks FROM documents),
        |b AS (SELECT n_toks, CASE
        |    WHEN n_toks <= 16 THEN 16 WHEN n_toks <= 32 THEN 32
        |    WHEN n_toks <= 64 THEN 64 WHEN n_toks <= 128 THEN 128
        |    WHEN n_toks <= 256 THEN 256 WHEN n_toks <= 512 THEN 512
        |    WHEN n_toks <= 1024 THEN 1024 WHEN n_toks <= 2048 THEN 2048
        |    ELSE 4096 END::BIGINT AS bin FROM t)
        |SELECT bin, count(*)::BIGINT AS n_docs,
        |  sum(n_toks)::BIGINT AS sum_toks,
        |  (count(*)::BIGINT * bin - sum(n_toks)::BIGINT) AS pad_waste,
        |  sum(n_toks)::BIGINT * 1000 // (count(*)::BIGINT * bin)
        |    AS fill_permille
        |FROM b GROUP BY bin""".stripMargin),
      "Padding-waste accounting under pad-to-power-of-two batching — " +
        "the batching dual of pack_sequences (which eliminates the " +
        "waste this query measures).  The bin ladder is integer CASE " +
        "arithmetic, the aggregate is partial-aggregatable on a " +
        "bounded 9-value key: one map-side-combined shuffle of at " +
        "most 9 rows per partition regardless of corpus size."),

    // --------------------------------------- per-source n-gram novelty
    QueryDef(
      "cross_source_novelty",
      (s, d) => {
        // Which sources contribute content nobody else has?  Per
        // source: distinct word-4-grams, and the share of them found
        // in no other source.  ONE gram-keyed shuffle: collect_set
        // (bounded by the handful of distinct sources, partial-
        // aggregated map-side) yields both the spread count and the
        // per-source membership, so the join-back of the earlier
        // formulation — a second data-sized exchange of the gram
        // frame — disappears; the explode back out is narrow and the
        // source rollup runs on a bounded key domain.
        Tables.documents(s, d)
          // per-doc distinct BEFORE the explode: a gram repeated inside
          // one document is one shuffle row, not many — collect_set
          // output is identical (it dedups anyway); strictly fewer
          // bytes into the one gram-keyed exchange (guide §2.3).  Since
          // r15 through the native DistinctGrams kernel: one pass over
          // the document bytes in whole-stage codegen instead of the
          // interpreted transform/slice/array_join lambda per gram
          // (GramKernelSpec pins string parity, incl. the <4-token drop).
          .select(col("source"), explode(
            graft.functions.GramKernel.distinctGrams(col("text"), 4))
            .as("gram"))
          .groupBy(col("gram"))
          .agg(collect_set(col("source")).as("srcs"))
          .select(size(col("srcs")).cast("long").as("ns"),
            explode(col("srcs")).as("source"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("ns") === 1L, 1L).otherwise(0L))
              .as("n_exclusive"))
          .select(col("source"), col("n_grams"), col("n_exclusive"),
            expr("n_exclusive * 1000 div n_grams").as("novelty_permille"))
      },
      Some("""WITH tok AS (SELECT source, string_split(text, ' ') AS toks
        |  FROM documents WHERE len(string_split(text, ' ')) >= 4),
        |grams AS (SELECT DISTINCT source,
        |    array_to_string(toks[i.i + 1 : i.i + 4], ' ') AS gram
        |  FROM tok, (SELECT range AS i FROM range(0, 4096)) i
        |  WHERE i.i <= len(toks) - 4),
        |spread AS (SELECT gram, count(DISTINCT source)::BIGINT AS ns
        |  FROM grams GROUP BY gram)
        |SELECT g.source, count(*)::BIGINT AS n_grams,
        |  sum(CASE WHEN s.ns = 1 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_exclusive,
        |  sum(CASE WHEN s.ns = 1 THEN 1 ELSE 0 END)::BIGINT * 1000
        |    // count(*)::BIGINT AS novelty_permille
        |FROM grams g JOIN spread s ON g.gram = s.gram
        |GROUP BY g.source""".stripMargin),
      "Per-source n-gram novelty: the exclusive-content complement of " +
        "source_overlap_matrix — how much of each source's distinct " +
        "4-gram set appears in no other source (the deduped-corpus " +
        "contribution a mixture planner actually buys from a source).  " +
        "One gram-keyed shuffle (with per-partition distinct partials) " +
        "plus a join back on the same key — the second hop reuses the " +
        "gram hash partitioning, so no third data-sized exchange."),
  )
}
