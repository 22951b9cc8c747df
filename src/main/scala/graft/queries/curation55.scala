package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 55: BLEU — the classic generation-eval metric the eval family
  * (rouge_l_pairs, pass_at_k, ndcg/mrr/map) still lacked.  Candidate/
  * reference pairs come from the corpus's injected 90%-prefix
  * truncations (Corpus.withDups construction: candidate = the +1e6
  * near-dup, reference = its base document), the same known-truth
  * substrate the dedup calibration uses.
  */
object Curation55Queries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "bleu_ngram_precisions",
      (s, d) => {
        // Corpus-level modified n-gram precisions for n = 1..4 plus
        // the brevity ratio (n = 0 row) — every BLEU ingredient in
        // exact integers; the geometric-mean + exp tail is a trivial
        // driver-side float over FOUR numbers and deliberately stays
        // out of the engine (transcendental, not bit-portable).
        // Shape: per-pair n-gram counts on each side (narrow explode),
        // one (pair, n, gram) equi-join for clipping, bounded n-keyed
        // rollup.  No pair ever sees another pair's grams, so the join
        // key space is pair-local — the shape that survives a corpus
        // of any size as long as single documents stay bounded.
        val base = Tables.documents(s, d)
          .filter(pmod(col("doc_id"), lit(50)) === 0)
          .select(col("doc_id").as("pair"), col("text"))
        // candidate = the 90%-prefix truncation (the +1e6 near-dup)
        val cand = base.select(col("pair"),
          expr("substring(text, 1, (length(text)*9) div 10)").as("text"))
        def grams(df: org.apache.spark.sql.DataFrame, cnt: String) = df
          .select(col("pair"), split(col("text"), " ").as("toks"))
          .select(col("pair"), explode(expr(
            """flatten(transform(sequence(1, 4), n ->
              |  transform(if(size(toks) >= n,
              |      sequence(1, size(toks) - n + 1),
              |      cast(array() as array<int>)), i ->
              |    struct(n AS n, array_join(slice(toks, i, n), ' ')
              |      AS gram))))""".stripMargin)).as("g"))
          // the if() guard matters: for a doc shorter than n tokens,
          // sequence(1, size-n+1) has start > stop and Spark counts
          // DOWN (default step -1), so i reaches 0 and slice throws —
          // short docs must contribute the EMPTY gram set (the
          // oracle's `i + n <= len(toks)` bound), not an error
          .groupBy(col("pair"), col("g.n").as("n"), col("g.gram").as("gram"))
          .agg(count(lit(1)).as(cnt))
        val joined = grams(cand, "c_cand")
          .join(grams(base, "c_ref"), Seq("pair", "n", "gram"), "left")
          .select(col("n"), col("c_cand"),
            least(col("c_cand"), coalesce(col("c_ref"), lit(0L)))
              .as("clipped"))
        val precisions = joined.groupBy(col("n").cast("long").as("n"))
          .agg(sum(col("clipped")).as("matched"),
            sum(col("c_cand")).as("total"))
          .select(col("n"), col("matched"), col("total"),
            expr("matched * 1000 div total").as("prec_permille"))
        // brevity row: candidate vs reference token mass
        val brevity = cand.select(size(split(col("text"), " "))
            .cast("long").as("cl"))
          .agg(sum(col("cl")).as("matched"))
          .crossJoin(broadcast(base.select(size(split(col("text"), " "))
            .cast("long").as("rl")).agg(sum(col("rl")).as("total"))))
          .select(lit(0L).as("n"), col("matched"), col("total"),
            expr("matched * 1000 div total").as("prec_permille"))
        precisions.unionByName(brevity)
      },
      Some("""WITH base AS (
        |  SELECT doc_id AS pair, text FROM documents WHERE doc_id % 50 = 0),
        |cand AS (SELECT pair,
        |    substr(text, 1, (length(text)*9)//10) AS text FROM base),
        |cg AS (SELECT pair, n.n, array_to_string(toks[i.i+1 : i.i+n.n], ' ')
        |      AS gram, count(*)::BIGINT AS c_cand
        |  FROM (SELECT pair, string_split(text, ' ') AS toks FROM cand),
        |    (SELECT unnest([1,2,3,4]) AS n) n,
        |    (SELECT range AS i FROM range(0, 4096)) i
        |  WHERE i.i + n.n <= len(toks) GROUP BY 1, 2, 3),
        |rg AS (SELECT pair, n.n, array_to_string(toks[i.i+1 : i.i+n.n], ' ')
        |      AS gram, count(*)::BIGINT AS c_ref
        |  FROM (SELECT pair, string_split(text, ' ') AS toks FROM base),
        |    (SELECT unnest([1,2,3,4]) AS n) n,
        |    (SELECT range AS i FROM range(0, 4096)) i
        |  WHERE i.i + n.n <= len(toks) GROUP BY 1, 2, 3),
        |j AS (SELECT cg.n, cg.c_cand,
        |    least(cg.c_cand, coalesce(rg.c_ref, 0)) AS clipped
        |  FROM cg LEFT JOIN rg ON rg.pair = cg.pair AND rg.n = cg.n
        |    AND rg.gram = cg.gram),
        |prec AS (SELECT n::BIGINT AS n, sum(clipped)::BIGINT AS matched,
        |    sum(c_cand)::BIGINT AS total,
        |    (sum(clipped) * 1000 // sum(c_cand))::BIGINT AS prec_permille
        |  FROM j GROUP BY n),
        |brev AS (SELECT 0::BIGINT AS n,
        |    (SELECT sum(len(string_split(text, ' ')))::BIGINT FROM cand)
        |      AS matched,
        |    (SELECT sum(len(string_split(text, ' ')))::BIGINT FROM base)
        |      AS total)
        |SELECT n, matched, total, prec_permille FROM prec
        |UNION ALL
        |SELECT n, matched, total,
        |  (matched * 1000 // total)::BIGINT FROM brev""".stripMargin),
      "Corpus-level BLEU ingredients over the injected near-dup pairs: " +
        "modified (reference-clipped) n-gram precision for n = 1..4 " +
        "in exact permille, plus the candidate/reference length ratio " +
        "the brevity penalty needs (n = 0 row).  Clipping is one " +
        "pair-local (pair, n, gram) equi-join between the two count " +
        "tables; the geometric-mean + exp composite stays driver-side " +
        "by design — four numbers, transcendental, not bit-portable."),

    QueryDef(
      "chrf_char_ngram_f",
      (s, d) => {
        // chrF over the same pairs: CHARACTER n-gram (n = 1..6)
        // precision AND recall — recall is what BLEU's candidate-side
        // clipping cannot see, and chrF's F-score is a harmonic mean,
        // i.e. RATIONAL, so unlike BLEU's geometric mean the whole
        // metric stays in exact integers end to end.  Same pair-local
        // join shape as bleu_ngram_precisions; corpus-level (micro)
        // totals per order n.
        val base = Tables.documents(s, d)
          .filter(pmod(col("doc_id"), lit(50)) === 0)
          .select(col("doc_id").as("pair"), col("text"))
        val cand = base.select(col("pair"),
          expr("substring(text, 1, (length(text)*9) div 10)").as("text"))
        def grams(df: org.apache.spark.sql.DataFrame, cnt: String) = df
          .select(col("pair"), explode(expr(
            """flatten(transform(sequence(1, 6), n ->
              |  transform(if(length(text) >= n,
              |      sequence(1, length(text) - n + 1),
              |      cast(array() as array<int>)), i ->
              |    struct(n AS n, substring(text, i, n) AS gram))))"""
              .stripMargin)).as("g"))
          // same guard as bleu_ngram_precisions: a text shorter than n
          // chars must emit ZERO n-grams of order n — the unguarded
          // downward sequence reaches i <= 0 where substring silently
          // fabricates grams that don't exist (wrong counts, no error)
          .groupBy(col("pair"), col("g.n").as("n"), col("g.gram").as("gram"))
          .agg(count(lit(1)).as(cnt))
        grams(cand, "c_cand")
          .join(grams(base, "c_ref"), Seq("pair", "n", "gram"), "full_outer")
          .select(col("n"),
            coalesce(col("c_cand"), lit(0L)).as("c_cand"),
            coalesce(col("c_ref"), lit(0L)).as("c_ref"))
          .withColumn("m", least(col("c_cand"), col("c_ref")))
          .groupBy(col("n").cast("long").as("n"))
          .agg(sum(col("m")).as("matched"),
            sum(col("c_cand")).as("cand_total"),
            sum(col("c_ref")).as("ref_total"))
          .select(col("n"), col("matched"),
            expr("matched * 1000 div cand_total").as("p_permille"),
            expr("matched * 1000 div ref_total").as("r_permille"))
          .withColumn("f_permille", expr(
            "CASE WHEN p_permille + r_permille = 0 THEN 0 " +
              "ELSE (2 * p_permille * r_permille) " +
              "div (p_permille + r_permille) END"))
      },
      Some("""WITH base AS (
        |  SELECT doc_id AS pair, text FROM documents WHERE doc_id % 50 = 0),
        |cand AS (SELECT pair,
        |    substr(text, 1, (length(text)*9)//10) AS text FROM base),
        |cg AS (SELECT pair, n.n, substr(text, i.i + 1, n.n) AS gram,
        |    count(*)::BIGINT AS c_cand
        |  FROM cand, (SELECT unnest([1,2,3,4,5,6]) AS n) n,
        |    (SELECT range AS i FROM range(0, 8192)) i
        |  WHERE i.i + n.n <= length(text) GROUP BY 1, 2, 3),
        |rg AS (SELECT pair, n.n, substr(text, i.i + 1, n.n) AS gram,
        |    count(*)::BIGINT AS c_ref
        |  FROM base, (SELECT unnest([1,2,3,4,5,6]) AS n) n,
        |    (SELECT range AS i FROM range(0, 8192)) i
        |  WHERE i.i + n.n <= length(text) GROUP BY 1, 2, 3),
        |j AS (SELECT coalesce(cg.n, rg.n) AS n,
        |    coalesce(cg.c_cand, 0) AS c_cand,
        |    coalesce(rg.c_ref, 0) AS c_ref,
        |    least(coalesce(cg.c_cand, 0), coalesce(rg.c_ref, 0)) AS m
        |  FROM cg FULL OUTER JOIN rg ON rg.pair = cg.pair
        |    AND rg.n = cg.n AND rg.gram = cg.gram),
        |t AS (SELECT n::BIGINT AS n, sum(m)::BIGINT AS matched,
        |    (sum(m) * 1000 // sum(c_cand))::BIGINT AS p_permille,
        |    (sum(m) * 1000 // sum(c_ref))::BIGINT AS r_permille
        |  FROM j GROUP BY n)
        |SELECT n, matched, p_permille, r_permille,
        |  CASE WHEN p_permille + r_permille = 0 THEN 0
        |       ELSE (2 * p_permille * r_permille)
        |         // (p_permille + r_permille) END::BIGINT AS f_permille
        |FROM t""".stripMargin),
      "chrF ingredients: character n-gram precision, recall, and " +
        "harmonic-mean F per order n = 1..6 over the near-dup pairs — " +
        "the recall side BLEU cannot see, and (unlike BLEU's " +
        "geometric mean) fully rational, so every number is exact " +
        "permille.  The FULL OUTER count join makes reference-only " +
        "grams first-class (they lower recall, not precision); the " +
        "join stays pair-local, bounded by document length."),

    // ------------------------------- LATERAL correlated top-k per key
    QueryDef(
      "lateral_topk_per_customer",
      (s, d) => {
        // The declarative per-key top-k: a correlated LATERAL subquery
        // with ORDER BY + LIMIT — the SQL-surface twin of the window
        // row_number <= k pattern (limit_topk / budgeted_topk family).
        // Catalyst decorrelates the lateral into a partitioned ranked
        // window, so the executed plan is the same two-phase
        // WindowGroupLimit shape as the hand-written form: per-key
        // state is k rows, never the customer's whole order list.
        Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"))
          .createOrReplaceTempView("graft_lat_cust")
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .createOrReplaceTempView("graft_lat_orders")
        s.sql("""SELECT c.c_custkey, c.c_mktsegment, l.o_orderkey,
          |  CAST(floor(l.o_totalprice * 100) AS BIGINT) AS price_e2
          |FROM graft_lat_cust c,
          |LATERAL (SELECT o_orderkey, o_totalprice FROM graft_lat_orders o
          |         WHERE o.o_custkey = c.c_custkey
          |         ORDER BY o_totalprice DESC, o_orderkey
          |         LIMIT 2) l""".stripMargin)
      },
      Some("""SELECT c.c_custkey, c.c_mktsegment, l.o_orderkey,
        |  floor(l.o_totalprice * 100)::BIGINT AS price_e2
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey
        |         LIMIT 2) l""".stripMargin),
      "Per-customer top-2 orders through a correlated LATERAL " +
        "subquery (ORDER BY + LIMIT inside the lateral) — mirrored " +
        "verbatim in the DuckDB oracle.  Catalyst decorrelates it to " +
        "a partitioned ranked window, so despite the row-at-a-time " +
        "surface syntax the executed plan is the set-based two-phase " +
        "group-limit — per-key state is k rows at any scale.  " +
        "Deterministic under ties via the orderkey tiebreaker."),

    // -------------------------------- ordered string aggregation
    QueryDef(
      "listagg_sources_by_lang",
      (s, d) => {
        // Spark 4's listagg with WITHIN GROUP ordering: the ordered
        // string rollup (previously only expressible as
        // sort_array(collect_set(..)) + array_join).  DISTINCT +
        // explicit ORDER BY makes the result a deterministic function
        // of the grouped SET — order-independent, partitioning-
        // independent — which is the only way a string agg is usable
        // in an engine-portable pipeline.
        // dedupe BEFORE the agg: listagg(DISTINCT ..) WITHIN GROUP
        // trips an AttributeReference->SortOrder cast in the 4.1
        // planner, and the pre-distinct is the better plan anyway
        // (partial-aggregated set reduction before the string build)
        Tables.documents(s, d)
          .select(col("lang"), col("source")).distinct()
          .createOrReplaceTempView("graft_la_docs")
        s.sql("""SELECT lang,
          |  listagg(source, ',')
          |    WITHIN GROUP (ORDER BY source) AS sources,
          |  CAST(count(source) AS BIGINT) AS n_sources
          |FROM graft_la_docs GROUP BY lang""".stripMargin)
      },
      Some("""SELECT lang,
        |  string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
        |  count(DISTINCT source)::BIGINT AS n_sources
        |FROM documents GROUP BY lang""".stripMargin),
      "Ordered distinct string aggregation per language via Spark 4's " +
        "listagg WITHIN GROUP — deterministic because DISTINCT plus " +
        "the explicit ORDER BY make the result a pure function of the " +
        "grouped set, independent of row arrival order or " +
        "partitioning.  The oracle is DuckDB's ordered string_agg; " +
        "identical strings prove the ordering contract."),

    // ------------------------------ exact mergeable distinct (bitmaps)
    QueryDef(
      "bitmap_exact_distinct_users",
      (s, d) => {
        // The EXACT complement of the HLL sketch rollup: per-bucket
        // bitmaps over the dense user-id space (bitmap_bucket_number /
        // bitmap_bit_position partition ids into 32k-bit buckets), one
        // bitmap per (event_type, bucket) — partial-aggregatable OR
        // folds — then per-type counts, and the overall cardinality by
        // bitmap_or_agg MERGING the per-type bitmaps bucket-wise
        // without rescanning events.  Exact at any scale (bitmaps
        // never approximate); the cost model is bits over the id
        // domain per group, which dense ids keep linear — the
        // trade against HLL's fixed-size-but-approximate sketches.
        Tables.events(s, d)
          .select(col("event_type"), col("user_id"))
          .createOrReplaceTempView("graft_bm_events")
        s.sql("""WITH per_bucket AS (
          |  SELECT event_type, bitmap_bucket_number(user_id) AS bkt,
          |    bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm
          |  FROM graft_bm_events GROUP BY 1, 2)
          |SELECT event_type,
          |  CAST(sum(bitmap_count(bm)) AS BIGINT) AS n_users
          |FROM per_bucket GROUP BY event_type
          |UNION ALL
          |SELECT '_all', CAST(sum(cnt) AS BIGINT) FROM (
          |  SELECT bitmap_count(bitmap_or_agg(bm)) AS cnt
          |  FROM per_bucket GROUP BY bkt)""".stripMargin)
      },
      Some("""SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
        |FROM events GROUP BY event_type
        |UNION ALL
        |SELECT '_all', count(DISTINCT user_id)::BIGINT FROM events"""
        .stripMargin),
      "Exact distinct users per event type through Spark 4's bitmap " +
        "aggregates: ids partition into 32k-bit buckets, OR-folds " +
        "build one bitmap per (type, bucket) map-side, counts sum per " +
        "type, and the overall cardinality merges the per-type " +
        "bitmaps bucket-wise (bitmap_or_agg) with no second scan — " +
        "the exact mergeable-distinct pattern, complementing the HLL " +
        "sketch rollup's fixed-size approximate one.  Oracle: plain " +
        "exact count distinct."),
  )
}
