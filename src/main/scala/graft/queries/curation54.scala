package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 54: inference-side data planning — KV-cache prefix sharing.
  *
  * Serving (and preference-data generation, where one prompt fans out
  * to N completions) pays prefill cost per prompt unless prompts that
  * share a template prefix reuse the same KV-cache blocks.  Planning
  * that reuse over a 100 TB prompt log is a pure data problem: group
  * by a template key, measure the exact shared prefix per group, and
  * account the chars (∝ tokens ∝ cache blocks) saved.
  */
object Curation54Queries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "prefix_cache_sharing",
      (s, d) => {
        // Exact group-LCP without any pairwise compare: within a group,
        // the common prefix of ALL members equals the common prefix of
        // the lexicographic min and max alone (any divergence between
        // two members shows up between the extremes).  So the whole
        // plan is ONE hash agg (count/min/max are all partial-
        // aggregatable) + a scalar LCP on the two survivors per group —
        // no self-join, no explode, no window.  The LCP is evaluated
        // via the monotone prefix trick: prefix-equality at i implies
        // it at every j<i, so counting the positions where the i-char
        // prefixes match IS the LCP length (capped at 64 chars — one
        // 4-token cache block of headroom; the cap mirrors in the
        // oracle).
        // min/max run over the 64-char truncation, not the full text:
        // truncation is monotone for the lexicographic order, so
        // min(trunc(s)) = trunc(min(s)) (and dually for max), and
        // LCP(trunc64(a), trunc64(b)) = min(64, LCP(a, b)) — the exact
        // capped answer with aggregation state bounded at 64 chars per
        // group instead of two full documents (the unfiltered oracle
        // proves the identity end to end)
        Tables.documents(s, d)
          .select(substring(col("text"), 1, 12).as("tpl"),
            substring(col("text"), 1, 64).as("t64"))
          .groupBy(col("tpl"))
          .agg(count(lit(1)).as("n_prompts"),
            min(col("t64")).as("mn"), max(col("t64")).as("mx"))
          .filter(col("n_prompts") >= 2)
          // native codegen'd LCP kernel (one forward pass, stops at the
          // first divergence) in place of the O(cap^2)-bytes HOF count;
          // least(., 64) reproduces the capped count exactly since
          // prefix equality is monotone (parity: CommonPrefixLenSpec)
          .select(col("tpl"), col("n_prompts"),
            least(graft.functions.CommonPrefixLen
              .commonPrefixLen(col("mn"), col("mx")), lit(64L))
              .as("lcp_chars"))
          .withColumn("chars_saved",
            (col("n_prompts") - 1L) * col("lcp_chars"))
      },
      Some("""WITH g AS (
        |  SELECT substr(text, 1, 12) AS tpl, count(*)::BIGINT AS n_prompts,
        |    min(text) AS mn, max(text) AS mx
        |  FROM documents GROUP BY 1 HAVING count(*) >= 2)
        |SELECT tpl, n_prompts,
        |  len(list_filter(generate_series(1, 64),
        |    i -> i <= len(mn)
        |     AND substr(mn, 1, i::INTEGER) = substr(mx, 1, i::INTEGER)))
        |    ::BIGINT AS lcp_chars,
        |  ((n_prompts - 1) * len(list_filter(generate_series(1, 64),
        |    i -> i <= len(mn)
        |     AND substr(mn, 1, i::INTEGER) = substr(mx, 1, i::INTEGER))))
        |    ::BIGINT AS chars_saved
        |FROM g""".stripMargin),
      "KV-cache prefix-sharing planner: group prompts by a 12-char " +
        "template key, compute each group's EXACT longest common " +
        "prefix as LCP(min, max) — the lexicographic extremes bound " +
        "every member, so one partial-aggregatable hash agg replaces " +
        "any pairwise scan — and account (n-1) x LCP chars of prefill " +
        "the cache reuse saves.  Capped at 64 chars.  The LCP is the " +
        "native codegen'd common_prefix_len kernel (one forward pass, " +
        "stops at first divergence); the oracle's position count " +
        "guards i <= len(min) so saturating substr cannot overstate " +
        "equal-short-string LCPs (a prefix sorts before its " +
        "extensions, so the min side suffices)."),

    // ---------------------------- Spark 4 VARIANT semi-structured path
    QueryDef(
      "variant_shred_props",
      (s, d) => {
        // The engine's semi-structured fast path: parse the JSON props
        // column ONCE into Spark 4's binary-encoded VARIANT, then do
        // typed extractions against the encoded value — at 100 TB the
        // difference between parsing each payload per field touched
        // (get_json_object) and parsing it once per row.  variant_get
        // with a target type yields a typed column with no second
        // parse; the rollup is an ordinary bounded-key agg.
        Tables.events(s, d)
          .select(col("event_type"),
            expr("variant_get(parse_json(props), '$.k', 'bigint')")
              .as("k"))
          .groupBy(col("event_type"))
          .agg(count(col("k")).as("n_with_k"),
            sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"))
      },
      Some("""SELECT event_type,
        |  count(CAST(json_extract(props, '$.k') AS BIGINT))::BIGINT
        |    AS n_with_k,
        |  sum(CAST(json_extract(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
        |  min(CAST(json_extract(props, '$.k') AS BIGINT))::BIGINT AS min_k,
        |  max(CAST(json_extract(props, '$.k') AS BIGINT))::BIGINT AS max_k
        |FROM events GROUP BY event_type""".stripMargin),
      "Semi-structured payloads through Spark 4's VARIANT type: " +
        "parse_json once into the binary-encoded value, typed " +
        "variant_get extraction (no re-parse per field), bounded " +
        "event-type rollup of the extracted measure.  The oracle " +
        "reads the same field with DuckDB's JSON extraction — same " +
        "numbers, different encodings, proving the VARIANT path " +
        "preserves JSON semantics."),

    // ----------------------------- best-of-n sampling budget planning
    QueryDef(
      "best_of_n_reward_curve",
      (s, d) => {
        // How much reward does one more sample per prompt buy?  The
        // RLHF sampling-budget question, answered EXACTLY from the
        // empirical per-prompt reward distribution: for a group of N
        // candidates, E[max of n drawn without replacement] =
        // sum_i r_(i) * C(i-1, n-1) / C(N, n) over ascending ranks i
        // — the i-th smallest is the max of exactly C(i-1, n-1)
        // subsets.  All combinatorics stay in exact integers (one
        // floor division per group AFTER the sum), so the curve is
        // engine-portable bit for bit.  Rewards are the deterministic
        // md5 pseudo-scorer (the perplexity_filter_stub convention);
        // the window is partitioned by prompt group (bounded), and the
        // rollup is a 3-key agg.
        import org.apache.spark.sql.expressions.Window
        val r = Tables.documents(s, d).select(
          substring(col("text"), 1, 12).as("tpl"),
          pmod(conv(substring(md5(col("text")), 1, 8), 16, 10)
            .cast("long"), lit(1000000L)).as("reward"),
          col("doc_id"))
        val ranked = r.select(col("tpl"), col("reward"),
          row_number().over(Window.partitionBy(col("tpl"))
            .orderBy(col("reward"), col("doc_id"))).as("i"),
          count(lit(1)).over(Window.partitionBy(col("tpl"))).as("nn"))
        val per = ranked
          .select(col("*"),
            explode(array(lit(1), lit(2), lit(4))).as("n"))
          .filter(col("nn") >= col("n") && col("i") >= col("n"))
          .groupBy(col("tpl"), col("n"))
          .agg(expr("""sum(reward * (CASE n WHEN 1 THEN 1
            | WHEN 2 THEN i - 1
            | ELSE ((i-1)*(i-2)*(i-3)) div 6 END))
            | div max(CASE n WHEN 1 THEN nn
            | WHEN 2 THEN (nn*(nn-1)) div 2
            | ELSE (nn*(nn-1)*(nn-2)*(nn-3)) div 24 END)""".stripMargin
            .replace("\n", " ")).as("ev"))
        per.groupBy(col("n").cast("long").as("n"))
          .agg(count(lit(1)).as("n_groups"),
            expr("sum(ev) div count(1)").as("avg_ev_reward"))
      },
      Some("""WITH r AS (
        |  SELECT substr(text, 1, 12) AS tpl,
        |    (('0x' || substr(md5(text), 1, 8))::BIGINT % 1000000)
        |      AS reward,
        |    doc_id
        |  FROM documents),
        |ranked AS (SELECT tpl, reward,
        |    row_number() OVER (PARTITION BY tpl
        |      ORDER BY reward, doc_id) AS i,
        |    count(*) OVER (PARTITION BY tpl) AS nn
        |  FROM r),
        |expanded AS (SELECT tpl, reward, i, nn, n.n
        |  FROM ranked, (SELECT unnest([1, 2, 4]) AS n) n
        |  WHERE nn >= n.n AND i >= n.n),
        |per AS (SELECT tpl, n,
        |    sum(reward * (CASE n WHEN 1 THEN 1 WHEN 2 THEN i - 1
        |        ELSE (i-1)*(i-2)*(i-3)//6 END))::BIGINT
        |    // max(CASE n WHEN 1 THEN nn WHEN 2 THEN nn*(nn-1)//2
        |        ELSE nn*(nn-1)*(nn-2)*(nn-3)//24 END)::BIGINT AS ev
        |  FROM expanded GROUP BY tpl, n)
        |SELECT n::BIGINT AS n, count(*)::BIGINT AS n_groups,
        |  (sum(ev)::BIGINT // count(*)::BIGINT) AS avg_ev_reward
        |FROM per GROUP BY n""".stripMargin),
      "Best-of-n reward curve: exact E[max of n samples] per prompt " +
        "group from the empirical reward distribution (without " +
        "replacement; the i-th smallest reward is the max of exactly " +
        "C(i-1, n-1) of the C(N, n) subsets), averaged over groups " +
        "for n = 1, 2, 4.  Pure integer combinatorics — one floor " +
        "division per group after the sum — so the sampling-budget " +
        "decision (is 4x inference worth the reward lift?) is " +
        "reproducible bit for bit.  Bounded-group window + 3-key " +
        "rollup; no simulation, no floats."),

    // ---------------------- mergeable cardinality (DataSketches HLL)
    QueryDef(
      "hll_sketch_union_cardinality",
      (s, d) => {
        // Spark 4's native DataSketches HLL: per-event-type sketches
        // built in one pass, then UNIONED WITHOUT RESCANNING — the
        // mergeability that exact count-distinct lacks and that makes
        // per-day/per-partition cardinality rollups possible at 100 TB
        // (store the sketch bytes, merge on demand).  lgK=16 (48 KB
        // per sketch worst-case, still trivially broadcastable) keeps
        // the sketch in its exact coupon regime through every fixture
        // scale — the default lgK=12 left it at the sf0.1 cardinality
        // (1488 est vs 1500 exact, inside rsd but outside a hash
        // oracle) — so the DuckDB exact counts are a true oracle at
        // sf0.001/0.01/0.1 alike; at 100 TB cardinalities the same
        // plan returns ±0.4% estimates with identical shape.
        val byType = Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(expr("hll_sketch_agg(user_id, 16)").as("sk"))
        byType
          .select(col("event_type"),
            expr("hll_sketch_estimate(sk)").as("users_est"))
          .unionByName(byType.agg(
            expr("hll_sketch_estimate(hll_union_agg(sk))").as("users_est"))
            .select(lit("_all").as("event_type"), col("users_est")))
      },
      Some("""SELECT event_type, count(DISTINCT user_id)::BIGINT
        |    AS users_est
        |FROM events GROUP BY event_type
        |UNION ALL
        |SELECT '_all', count(DISTINCT user_id)::BIGINT FROM events"""
        .stripMargin),
      "Mergeable distinct-user cardinality via native DataSketches " +
        "HLL: one sketch per event type, estimates per type, and the " +
        "overall cardinality from hll_union_agg over the five sketch " +
        "BLOBS — no second scan of the events.  The union-of-sketches " +
        "is the operation that lets a 100 TB deployment keep per-" +
        "partition sketches and answer any rollup by merging; the " +
        "fixture cardinality sits in the sketch's exact sparse " +
        "regime, so the exact-count oracle holds bit for bit."),
  )
}
