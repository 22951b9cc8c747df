package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Corpus, QueryDef, Tables}

/** Advanced relational operators beyond the reference's own surface,
  * chosen for what a large-scale training-data pipeline needs: temporal
  * as-of joins (checkpoint chaining generalized to event time), bucketed
  * range joins, exact quantiles, tf-idf term ranking, duplicate-cluster
  * resolution (connected components), stratified sampling, and int8
  * embedding quantization.
  *
  * Every query here follows the engine's determinism contract (integer
  * or fixed-point math at agg boundaries, explicit tie-breaks) so the
  * DuckDB oracle hash-compares exactly — and every plan is shaped for
  * 1000-executor scale: single-shuffle as-of, candidate-bucketed range
  * join, no driver-side loops except the CC fixpoint driver (one count
  * per round over a shrinking frontier).
  */
object AdvancedQueries {

  // ------------------------------------------------------------------
  // As-of join: for each event, the most recent order of the same
  // customer at-or-before the event time.  The scalable formulation is
  // union + window (one shuffle on the key, no inequality join, no
  // per-row probe): tag build rows, sort each key's timeline, carry the
  // last build value forward with last_value(ignoreNulls).
  // Reference analog: epoch i consumes the latest checkpoint <= i
  // (train_adapters/create_all_models.py:54-63) lifted to event time.
  // ------------------------------------------------------------------
  private def asofJoined(s: SparkSession, d: String): DataFrame = {
    // Probes: purchase/error events; builds: the same user's
    // signup/click stream (genuinely interleaved in event time).
    // Pre-aggregate the build side to one row per (key, time): as-of
    // semantics need a unique value at each build timestamp for the
    // result to be well-defined (ties broken by max event id).
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val builds = ev
      .filter(col("event_type").isin("signup", "click"))
      .groupBy(col("user_id"), col("ts").as("t"))
      .agg(max(col("event_id")).as("ref_event"))
      .select(col("user_id"), col("t"), col("ref_event"),
        lit(null).cast("bigint").as("event_id"), lit(1).as("is_build"))
    val probes = ev
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("user_id"), col("ts").as("t"),
        lit(null).cast("bigint").as("ref_event"), col("event_id"),
        lit(0).as("is_build"))
    // At equal timestamps the build row sorts first (is_build desc), so
    // "at or before" includes the same instant; event_id breaks probe
    // ties deterministically.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("is_build").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    builds.unionByName(probes)
      .withColumn("asof_ref", last(col("ref_event"), ignoreNulls = true).over(w))
      .filter(col("is_build") === 0)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("t")).as("ts_us"),
        coalesce(col("asof_ref"), lit(-1L)).as("asof_ref"))
  }

  // ------------------------------------------------------------------
  // CC label propagation edges: exact-duplicate star edges (content
  // root -> copy) plus injected 90%-prefix near-dup pairs.
  // ------------------------------------------------------------------
  private def dupEdges(s: SparkSession, d: String): DataFrame = {
    val c = Corpus.withDups(s, d)
    val exact = c.select(md5(col("text")).as("h"), col("doc_id"))
    val roots = exact.groupBy(col("h")).agg(min(col("doc_id")).as("root"))
    val exactPairs = exact.join(roots, "h")
      .filter(col("doc_id") =!= col("root"))
      .select(col("root").as("a"), col("doc_id").as("b"))
    val nearPairs = Tables.documents(s, d)
      .filter(pmod(col("doc_id"), lit(50)) === 0)
      .select(col("doc_id").as("a"), (col("doc_id") + 1000000L).as("b"))
    exactPairs.unionByName(nearPairs)
  }

  // ------------------------------------------------------------------
  // Connected components over the near/exact-duplicate edge set by
  // iterative min-label propagation, run to the true fixpoint (the
  // driver loop does one distributed count per round; each round is a
  // shuffle join — the standard large-CC pattern, convergence in
  // O(log diameter) rounds with doubling, O(diameter) here). Returns
  // (doc_id, cluster_id) for every EDGE-INCIDENT node (r15): a
  // singleton has no incident edge, so its label can never change and
  // it never feeds viaNbr — and BOTH consumers drop singletons anyway
  // (dedup_clusters filters doc_id != cluster_id, dedup_keep_best
  // filters n_members > 1), so looping over them only inflated every
  // per-round shuffle from corpus-size to its dup-subset (guide §2.3:
  // shuffle fewer bytes; at 100 TB the label frame is the duplicated
  // fraction, not the corpus).  Same labels for every returned node;
  // round count unchanged (singleton labels never propagated — und.a
  // never matched them).
  // ------------------------------------------------------------------
  private def ccLabels(s: SparkSession, d: String): DataFrame = {
    val edges = dupEdges(s, d)
      .select(col("a"), col("b")).persist()
    val und = edges.unionByName(
      edges.select(col("b").as("a"), col("a").as("b")))
    var labels = und.select(col("a").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("lbl")).persist()
    // Convergence check without the per-round change join: the label
    // frame is MONOTONE — the node set only grows (the union keeps
    // every existing row) and each node's label only decreases (min
    // over a set containing its current label) — so the (row count,
    // label sum) pair is stable across a round iff no node appeared
    // and no label changed, i.e. iff the propagation hit its fixpoint.
    // One partial-aggregated action per round (which also materializes
    // that round's persist) replaces the old next-vs-labels shuffle
    // join + count: same fixpoint, identical labels, one action and
    // one less shuffle per round (guide §2.4).
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("lbl"))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var cur = sig(labels)
    var converged = false
    while (!converged) {
      val viaNbr = und.join(labels, und("a") === labels("doc_id"))
        .select(col("b").as("doc_id"), col("lbl"))
      val next = labels.select(col("doc_id"), col("lbl"))
        .unionByName(viaNbr)
        .groupBy(col("doc_id")).agg(min(col("lbl")).as("lbl"))
        .persist()
      val nextSig = sig(next)
      converged = nextSig == cur
      labels.unpersist()
      labels = next
      cur = nextSig
    }
    labels.select(col("doc_id"), col("lbl").as("cluster_id"))
  }

  val defs: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------- as-of
    QueryDef(
      "asof_join_latest_ref",
      (s, d) => asofJoined(s, d),
      Some("""WITH builds AS (
        |  SELECT user_id, ts AS t, max(event_id) AS ref_event
        |  FROM events WHERE event_type IN ('signup', 'click')
        |  GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts::TIMESTAMP) AS ts_us,
        |       coalesce(b.ref_event, -1) AS asof_ref
        |FROM events e
        |ASOF LEFT JOIN builds b
        |  ON e.user_id = b.user_id AND e.ts >= b.t
        |WHERE e.event_type IN ('purchase', 'error')""".stripMargin),
      "As-of join (latest signup/click at-or-before each purchase/" +
        "error) as union + per-key ordered window with last_value" +
        "(ignoreNulls): ONE shuffle on the join key, no inequality-" +
        "join explosion — the plan that survives a 100 TB fact " +
        "stream. Oracle uses DuckDB's native ASOF JOIN for an " +
        "independent formulation."),

    // ----------------------------------------------- tolerance as-of
    QueryDef(
      "asof_join_tolerance",
      (s, d) => {
        // asof_join_latest_ref with a max-staleness gate: a reference
        // older than 1 hour is no reference (the checkpoint-expiry /
        // sensor-staleness rule). Same single-shuffle union+window —
        // the window carries (build time, ref) as a struct so the gate
        // is a row-local check after the as-of resolution.
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"),
            col("event_type"))
        val builds = ev
          .filter(col("event_type").isin("signup", "click"))
          .groupBy(col("user_id"), col("ts").as("t"))
          .agg(max(col("event_id")).as("ref_event"))
          .select(col("user_id"), col("t"), col("ref_event"),
            lit(null).cast("bigint").as("event_id"), lit(1).as("is_build"))
        val probes = ev
          .filter(col("event_type").isin("purchase", "error"))
          .select(col("user_id"), col("ts").as("t"),
            lit(null).cast("bigint").as("ref_event"), col("event_id"),
            lit(0).as("is_build"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("t"), col("is_build").desc, col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        builds.unionByName(probes)
          .withColumn("asof", last(
            when(col("is_build") === 1,
              struct(col("t").as("bt"), col("ref_event").as("ref"))),
            ignoreNulls = true).over(w))
          .filter(col("is_build") === 0)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("t")).as("ts_us"),
            when(col("asof").isNotNull &&
              unix_micros(col("t")) - unix_micros(col("asof.bt"))
                <= 3600000000L,
              col("asof.ref")).otherwise(lit(-1L)).as("asof_ref_1h"))
      },
      Some("""WITH builds AS (
        |  SELECT user_id, ts AS t, max(event_id) AS ref_event
        |  FROM events WHERE event_type IN ('signup', 'click')
        |  GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts::TIMESTAMP) AS ts_us,
        |  CASE WHEN b.t IS NOT NULL
        |        AND epoch_us(e.ts::TIMESTAMP) - epoch_us(b.t::TIMESTAMP)
        |            <= 3600000000
        |       THEN b.ref_event ELSE -1 END AS asof_ref_1h
        |FROM events e
        |ASOF LEFT JOIN builds b
        |  ON e.user_id = b.user_id AND e.ts >= b.t
        |WHERE e.event_type IN ('purchase', 'error')""".stripMargin),
      "As-of join with staleness tolerance: the latest reference " +
        "at-or-before each probe counts only within a 1 h window — " +
        "older checkpoints are expired to the miss sentinel. The window " +
        "carries (build_time, ref) as one struct through the same " +
        "single-shuffle union+window as asof_join_latest_ref, so " +
        "tolerance costs one row-local comparison, not a second join. " +
        "Oracle: DuckDB native ASOF JOIN + the same gate."),

    // ------------------------------------------------- forward as-of
    QueryDef(
      "asof_join_next_ref",
      (s, d) => {
        // Forward twin of asof_join_latest_ref: the EARLIEST build
        // at-or-after each probe. Same tagged union, mirrored window:
        // frame open toward the future, first(ignoreNulls), probes
        // sorted before builds at equal t so the same instant counts.
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"),
            col("event_type"))
        val builds = ev
          .filter(col("event_type").isin("signup", "click"))
          .groupBy(col("user_id"), col("ts").as("t"))
          .agg(max(col("event_id")).as("ref_event"))
          .select(col("user_id"), col("t"), col("ref_event"),
            lit(null).cast("bigint").as("event_id"), lit(1).as("is_build"))
        val probes = ev
          .filter(col("event_type").isin("purchase", "error"))
          .select(col("user_id"), col("ts").as("t"),
            lit(null).cast("bigint").as("ref_event"), col("event_id"),
            lit(0).as("is_build"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("t"), col("is_build"), col("event_id"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        builds.unionByName(probes)
          .withColumn("next_ref",
            first(col("ref_event"), ignoreNulls = true).over(w))
          .filter(col("is_build") === 0)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("t")).as("ts_us"),
            coalesce(col("next_ref"), lit(-1L)).as("next_ref"))
      },
      Some("""WITH builds AS (
        |  SELECT user_id, ts AS t, max(event_id) AS ref_event
        |  FROM events WHERE event_type IN ('signup', 'click')
        |  GROUP BY 1, 2),
        |probes AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type IN ('purchase', 'error'))
        |SELECT p.event_id, p.user_id, epoch_us(p.ts::TIMESTAMP) AS ts_us,
        |       coalesce(min_by(b.ref_event, b.t), -1) AS next_ref
        |FROM probes p LEFT JOIN builds b
        |  ON b.user_id = p.user_id AND b.t >= p.ts
        |GROUP BY p.event_id, p.user_id, p.ts""".stripMargin),
      "Forward as-of join (earliest signup/click at-or-after each " +
        "purchase/error) — the 'next scheduled run' lookup, mirrored " +
        "from the backward form: same single shuffle + window, frame " +
        "opened toward the future. Oracle uses the independent " +
        "inequality-join + min_by formulation."),

    // ----------------------------------------------------- range join
    QueryDef(
      "range_join_bucketed",
      (s, d) => {
        // For each event: the same user's other events in the previous
        // hour.  The scalable shape: quantize time into 1 h buckets,
        // join on (key, bucket) with the probe side exploded over the
        // two candidate buckets, then apply the exact range predicate —
        // candidate volume is bounded per bucket instead of the
        // all-pairs inequality join.
        val BucketUs = 3600L * 1000000
        val base = Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"))
        val probes = base
          .withColumn("bkt",
            explode(array((col("ts_us") / BucketUs).cast("long"),
              (col("ts_us") / BucketUs).cast("long") - 1)))
        val builds = base
          .select(col("user_id"), col("event_id").as("prior_id"),
            col("ts_us").as("bt_us"))
          .withColumn("bkt", (col("bt_us") / BucketUs).cast("long"))
        probes.join(builds, Seq("user_id", "bkt"))
          .filter(col("bt_us") >= col("ts_us") - BucketUs &&
            col("bt_us") <= col("ts_us") &&
            col("prior_id") =!= col("event_id"))
          .groupBy(col("event_id"))
          .agg(count(lit(1)).as("n_prior"),
            min(col("prior_id")).as("first_prior"))
      },
      Some("""SELECT e.event_id, count(*) AS n_prior,
        | min(p.event_id) AS first_prior
        |FROM events e JOIN events p
        |  ON e.user_id = p.user_id
        | AND p.event_id <> e.event_id
        | AND epoch_us(p.ts::TIMESTAMP) >= epoch_us(e.ts::TIMESTAMP) - 3600000000
        | AND epoch_us(p.ts::TIMESTAMP) <= epoch_us(e.ts::TIMESTAMP)
        |GROUP BY e.event_id""".stripMargin),
      "Range (band) join via time-bucket quantization: equi-join on " +
        "(key, bucket) over two candidate buckets + exact range filter. " +
        "Same result as the inequality join (the oracle), but shuffles " +
        "by bucket — bounded candidates per task at any scale."),

    // ------------------------------------------------ exact quantiles
    QueryDef(
      "quantile_values",
      (s, d) => Tables.events(s, d)
        .select(floor(col("value") * 100).cast("long").as("v100"))
        .agg(
          expr("percentile(v100, 0.5)").as("p50"),
          expr("percentile(v100, 0.95)").as("p95"),
          expr("percentile(v100, 0.99)").as("p99")),
      Some("""SELECT quantile_cont(v100, 0.5) AS p50,
        | quantile_cont(v100, 0.95) AS p95,
        | quantile_cont(v100, 0.99) AS p99
        |FROM (SELECT floor(value * 100)::BIGINT AS v100 FROM events)""".stripMargin),
      "Exact interpolated quantiles over fixed-point values: both " +
        "engines use lower + frac*(upper-lower) over the sorted " +
        "multiset, on exact integers — bit-identical doubles. The " +
        "approx_percentile sketch is the 100 TB path; exact is the " +
        "oracle-checkable contract."),

    // --------------------------------------------- grouped quantiles
    QueryDef(
      "quantile_by_lang",
      (s, d) => Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          expr("percentile(n_chars, 0.5)").as("p50_chars"),
          expr("percentile(n_chars, 0.9)").as("p90_chars")),
      Some("""SELECT lang, count(*)::BIGINT AS n_docs,
        | quantile_cont(n_chars, 0.5) AS p50_chars,
        | quantile_cont(n_chars, 0.9) AS p90_chars
        |FROM documents GROUP BY lang""".stripMargin),
      "Per-group exact quantiles (length distribution per language) — " +
        "the distribution profile behind per-source length filters. One " +
        "shuffle on the group key; per-group sorted-multiset " +
        "interpolation on exact integers, so the doubles agree " +
        "bit-for-bit cross-engine. approx_percentile swaps in at 100 TB " +
        "as with quantile_values."),

    // ------------------------------------------------------- tf-idf
    QueryDef(
      "tfidf_top_terms",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .filter(length(col("tok")) >= 4)
        val tf = toks.groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("tf"))
        val df = toks.select(col("doc_id"), col("tok")).distinct()
          .groupBy(col("tok")).agg(count(lit(1)).as("df"))
        val scored = tf.join(df, "tok")
          // integer idf proxy: score = tf * 1e6 / df (monotone in 1/df);
          // avoids cross-engine ln() rounding at the floor boundary
          .withColumn("score", expr("(tf * 1000000) div df"))
        scored.withColumn("rk", row_number().over(
            Window.partitionBy(col("doc_id"))
              .orderBy(col("score").desc, col("tok"))))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk").cast("bigint").as("rk"),
            col("tok"), col("score"))
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, t.tok FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents) t
        |  WHERE length(t.tok) >= 4),
        |tf AS (SELECT doc_id, tok, count(*) AS tf
        |       FROM toks GROUP BY doc_id, tok),
        |df AS (SELECT tok, count(*) AS df
        |       FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok),
        |scored AS (SELECT tf.doc_id, tf.tok, ((tf.tf * 1000000) // df.df)::BIGINT AS score
        |           FROM tf JOIN df USING (tok)),
        |ranked AS (SELECT doc_id, tok, score, row_number() OVER (
        |             PARTITION BY doc_id ORDER BY score DESC, tok) AS rk
        |           FROM scored)
        |SELECT doc_id, rk::BIGINT AS rk, tok, score
        |FROM ranked WHERE rk <= 3""".stripMargin),
      "Per-document top-3 salient terms by tf-idf (integer 1/df idf " +
        "proxy for cross-engine determinism): tokenize -> tf agg -> df " +
        "agg -> join -> windowed top-k. The standard keyword-extraction " +
        "pass of a corpus-quality pipeline; df table broadcastable."),

    // ----------------------------------- duplicate cluster resolution
    QueryDef(
      "dedup_clusters",
      (s, d) => ccLabels(s, d)
        .filter(col("doc_id") =!= col("cluster_id")),
      Some(s"""WITH RECURSIVE corpus AS (${Corpus.cte}),
        |exact AS (SELECT md5(text) AS h, doc_id FROM corpus),
        |roots AS (SELECT h, min(doc_id) AS root FROM exact GROUP BY h),
        |pairs AS (
        |  SELECT root AS a, doc_id AS b FROM exact JOIN roots USING (h)
        |  WHERE doc_id <> root
        |  UNION ALL
        |  SELECT doc_id AS a, doc_id + 1000000 AS b FROM documents
        |  WHERE doc_id % 50 = 0),
        |und AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
        |reach AS (
        |  SELECT doc_id AS node, doc_id AS lbl FROM corpus
        |  UNION
        |  SELECT u.b AS node, r.lbl
        |  FROM reach r JOIN und u ON u.a = r.node),
        |cc AS (SELECT node AS doc_id, min(lbl) AS cluster_id
        |       FROM reach GROUP BY node)
        |SELECT doc_id, cluster_id FROM cc
        |WHERE doc_id <> cluster_id""".stripMargin),
      "Duplicate-cluster resolution: connected components over the " +
        "exact+near duplicate edge set via iterative min-label " +
        "propagation to fixpoint — each survivor doc maps to its " +
        "cluster representative (min doc_id). The step after pair " +
        "detection in any production dedup: pairs alone over-count " +
        "when duplicates chain."),

    // ----------------------------------- quality-aware dup resolution
    QueryDef(
      "dedup_keep_best",
      (s, d) => {
        // Survivor POLICY on top of the cluster structure: keep the
        // longest member (near-dups are truncations, so longest = the
        // un-truncated original), tie-broken by doc_id. Ranking runs
        // per cluster — cluster cardinality is small by construction
        // (bounded dup chains), so the window is cheap; mass clusters
        // would use the max_by aggregation form instead.
        val members = ccLabels(s, d)
          .join(Corpus.withDups(s, d)
            .select(col("doc_id"), length(col("text")).as("len")), "doc_id")
        val w = Window.partitionBy(col("cluster_id"))
          .orderBy(col("len").desc, col("doc_id"))
        members
          .withColumn("rk", row_number().over(w))
          .withColumn("n_members",
            count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
          .filter(col("rk") === 1 && col("n_members") > 1)
          .select(col("cluster_id"), col("doc_id").as("kept_doc"),
            col("len").cast("bigint").as("kept_len"), col("n_members"))
      },
      Some(s"""WITH RECURSIVE corpus AS (${Corpus.cte}),
        |exact AS (SELECT md5(text) AS h, doc_id FROM corpus),
        |roots AS (SELECT h, min(doc_id) AS root FROM exact GROUP BY h),
        |pairs AS (
        |  SELECT root AS a, doc_id AS b FROM exact JOIN roots USING (h)
        |  WHERE doc_id <> root
        |  UNION ALL
        |  SELECT doc_id AS a, doc_id + 1000000 AS b FROM documents
        |  WHERE doc_id % 50 = 0),
        |und AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
        |reach AS (
        |  SELECT doc_id AS node, doc_id AS lbl FROM corpus
        |  UNION
        |  SELECT u.b AS node, r.lbl
        |  FROM reach r JOIN und u ON u.a = r.node),
        |cc AS (SELECT node AS doc_id, min(lbl) AS cluster_id
        |       FROM reach GROUP BY node),
        |m AS (SELECT cc.cluster_id, cc.doc_id, length(c.text) AS len,
        |        row_number() OVER (PARTITION BY cc.cluster_id
        |                           ORDER BY length(c.text) DESC, cc.doc_id)
        |          AS rk,
        |        count(*) OVER (PARTITION BY cc.cluster_id) AS n_members
        |      FROM cc JOIN corpus c USING (doc_id))
        |SELECT cluster_id, doc_id AS kept_doc, len::BIGINT AS kept_len,
        |       n_members::BIGINT AS n_members
        |FROM m WHERE rk = 1 AND n_members > 1""".stripMargin),
      "Quality-aware duplicate resolution: each multi-member duplicate " +
        "cluster keeps its best member under an explicit policy " +
        "(longest text, deterministic tie-break) instead of first-seen " +
        "— the 'keep the canonical crawl, drop the truncated re-crawl' " +
        "rule. Composes the CC cluster structure with a per-cluster " +
        "argmax; the policy column is the only thing to swap for " +
        "quality-score- or recency-based retention."),

    // ------------------------------------------- stratified sampling
    QueryDef(
      "sample_stratified",
      (s, d) => {
        // Per-language sampling rates (downsample the dominant stratum),
        // deterministic via md5(doc_id) arithmetic — reproducible across
        // partitionings, no rand().
        val h = pmod(conv(substring(md5(concat(col("lang"), lit(":"),
          col("doc_id"))), 1, 8), 16, 10).cast("long"), lit(100L))
        Tables.documents(s, d)
          .withColumn("keep",
            when(col("lang") === "en", h < 10).otherwise(h < 50))
          .filter(col("keep"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_sampled"), min(col("doc_id")).as("first_id"))
      },
      Some(s"""SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_id
        |FROM (SELECT lang, doc_id,
        |        (('0x' || substr(md5(lang || ':' || doc_id), 1, 8))::BIGINT % 100)
        |          AS h
        |      FROM documents)
        |WHERE (lang = 'en' AND h < 10) OR (lang <> 'en' AND h < 50)
        |GROUP BY lang""".stripMargin),
      "Stratified deterministic sampling: per-stratum Bernoulli rates " +
        "(10% dominant language, 50% tail) keyed on md5(lang:doc_id) — " +
        "the rebalancing pass of corpus curation; reproducible across " +
        "any partitioning, no shuffle beyond the final count."),

    // --------------------------------------- embedding quantization
    QueryDef(
      "embedding_quantize_int8",
      (s, d) => {
        import graft.functions.VectorOps._
        val v = col("embedding")
        val maxabs = aggregate(asDouble(v), lit(0.0),
          (acc, x) => greatest(acc, abs(x)))
        // materialize the per-row scale into a parallel array so the
        // quantize lambda touches only its own variables (the l2Normalize
        // lesson: an outer expression inside a lambda body re-evaluates
        // per element in interpreted mode)
        val qs = zip_with(asDouble(v),
          array_repeat(lit(127.0) / maxabs, size(v)),
          (x, sc) => floor(x * sc).cast("long"))
        Tables.embeddings(s, d).select(
          col("vec_id"),
          element_at(qs, 1).as("q0"),
          element_at(qs, 2).as("q1"),
          aggregate(qs, lit(0L), (acc, x) => acc + x).as("qsum"))
      },
      Some({
        import graft.functions.VectorOps._
        val maxabsSql = "list_reduce(list_prepend(0.0::DOUBLE, " +
          "list_transform(embedding, x -> abs(x::DOUBLE))), " +
          "(acc, x) -> greatest(acc, x))"
        s"""SELECT vec_id,
          | floor(embedding[1]::DOUBLE * (127.0 / $maxabsSql))::BIGINT AS q0,
          | floor(embedding[2]::DOUBLE * (127.0 / $maxabsSql))::BIGINT AS q1,
          | list_reduce(list_prepend(0::BIGINT,
          |   list_transform(embedding,
          |     x -> floor(x::DOUBLE * (127.0 / $maxabsSql))::BIGINT)),
          |   (a, b) -> a + b) AS qsum
          |FROM embeddings""".stripMargin
      }),
      "Symmetric int8 quantization per embedding (scale = 127/max|x|): " +
        "the storage/bandwidth path for 100 TB vector corpora — floor " +
        "on exact f32->f64 products keeps both engines bit-identical; " +
        "4x smaller vectors before any shuffle."),

    // ------------------------------------- deterministic argmax join
    QueryDef(
      "argmax_event_per_user",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            floor(col("value") * 100).cast("long").as("v100"))
        val mx = ev.groupBy(col("user_id")).agg(max(col("v100")).as("v100"))
        ev.join(mx, Seq("user_id", "v100"))
          .groupBy(col("user_id"))
          .agg(min(col("event_id")).as("top_event"),
            max(col("v100")).as("v100"))
      },
      Some("""WITH ev AS (SELECT user_id, event_id,
        |         floor(value * 100)::BIGINT AS v100 FROM events),
        |mx AS (SELECT user_id, max(v100) AS v100 FROM ev GROUP BY user_id)
        |SELECT user_id, min(event_id) AS top_event, max(v100) AS v100
        |FROM ev JOIN mx USING (user_id, v100)
        |GROUP BY user_id""".stripMargin),
      "Deterministic argmax (max_by with explicit tie-break): two-phase " +
        "max + self-join on (key, max) instead of max_by's undefined " +
        "tie order — both phases partial-aggregate map-side; the " +
        "pattern for 'best checkpoint per run' selection."),
  )
}
