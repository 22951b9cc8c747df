package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.VectorOps._

/** Training-data curation operators (round 3): eval-set contamination
  * detection, deterministic dataset splits, run-state reconciliation,
  * text normalization, and kNN-graph construction — the curation layer a
  * 100 TB pretraining pipeline runs between raw dedup and sharding.
  *
  * Reference anchors: the eval/train separation the reference maintains
  * by directory convention (rag_evaluation/RAG-eval-test_model.py:237-243
  * evaluates against a corpus disjoint from the training text of
  * train_adapters/RAG-eval-create_model.py:58-66) is made explicit here
  * as n-gram contamination checks and hash-bucket splits.
  */
object CurationQueries {

  private val P = 2147483647L // 2^31 - 1, same shingle-hash space as dedup

  /** Word n-gram 31-bit hashes per doc (distinct), n fixed at call site.
    * Same slice/zip construction as DedupQueries.shingles — split() runs
    * once per row, never inside an interpreted HOF lambda — generalized
    * to n via a running concat over n shifted slices. */
  private def ngramHashes(docs: DataFrame, n: Int): DataFrame =
    // per-doc dedup happens SCAN-SIDE (the r14 form exploded first and
    // ran .distinct() on (doc_id, gh), a full shuffle of the train
    // gram stream that this one-row-owns-its-grams layout never
    // needed), and since r15 through the native NGramHashSet kernel:
    // one pass over the document bytes inside whole-stage codegen —
    // the zip_with/concat gram build and the md5/conv/substring chain
    // per gram ran in the interpreted HOF path and allocated a string
    // per gram.  Exactly the same (doc_id, gh) set (GramKernelSpec
    // pins parity, including the <n-token drop and empty-token
    // handling); the train side of the contamination query reaches its
    // per-doc aggregate with NO gram-keyed exchange at all.
    docs.select(col("doc_id"),
      explode(graft.functions.GramKernel.ngramHashSet(col("text"), n, P))
        .as("gh"))

  /** Oracle CTE for [[ngramHashes]] over `documents`: gram hashes named
    * (doc_id, gh); the range(0,4096) token cap is pinned by
    * FixtureBoundsSpec. */
  private def ngramHashesSql(n: Int, pred: String): String = {
    val parts = (0 until n).map(k => s"toks[i.i+${k + 1}]").mkString(", ")
    s"""grams AS (
      |  SELECT DISTINCT doc_id,
      |    ((('0x' || substr(md5(concat_ws(' ', $parts)), 1, 8))::BIGINT)
      |      % $P) AS gh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
      |        FROM documents WHERE $pred),
      |       (SELECT range AS i FROM range(0, 4096)) i
      |  WHERE len(toks) >= $n AND i.i <= len(toks) - $n)""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------- contamination
    QueryDef(
      "contamination_ngram_overlap",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val isEval = pmod(col("doc_id"), lit(20)) === 7
        // Eval-side gram SET is collapsed to distinct hashes and
        // broadcast: eval suites are tiny next to the training corpus,
        // so the train side never shuffles — a broadcast hash semi-pass
        // over the full scan, the only layout that works at 100 TB.
        val evalGrams = ngramHashes(docs.filter(isEval), 8)
          .select(col("gh")).distinct()
          .withColumn("hit", lit(1L))
        ngramHashes(docs.filter(!isEval), 8)
          .join(broadcast(evalGrams), Seq("gh"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            count(col("hit")).as("n_hits"))
          .filter(col("n_hits") > 0)
          .select(col("doc_id"),
            col("n_grams"), col("n_hits"),
            expr("(n_hits * 1000) div n_grams").as("contaminated_permille"))
      },
      Some(s"""WITH ${ngramHashesSql(8, "doc_id % 20 != 7")},
        |${ngramHashesSql(8, "doc_id % 20 = 7").replace("grams AS", "eval_grams AS")},
        |ev AS (SELECT DISTINCT gh FROM eval_grams)
        |SELECT g.doc_id, count(*)::BIGINT AS n_grams,
        |       count(ev.gh)::BIGINT AS n_hits,
        |       ((count(ev.gh) * 1000) // count(*))::BIGINT
        |         AS contaminated_permille
        |FROM grams g LEFT JOIN ev ON ev.gh = g.gh
        |GROUP BY g.doc_id HAVING count(ev.gh) > 0""".stripMargin),
      "Eval-set contamination: train documents sharing any word 8-gram " +
        "with the held-out eval slice (doc_id % 20 = 7), with overlap " +
        "permille. Eval grams collapse to a broadcast set; the train " +
        "scan aggregates locally per doc — no train-side shuffle by " +
        "gram, which is what keeps a 100 TB decontamination pass to one " +
        "pass over the corpus."),

    // ------------------------------------------------ train/val/test split
    QueryDef(
      "split_train_val_test",
      (s, d) => {
        val bucket = pmod(
          conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long"), lit(100L))
        Tables.documents(s, d)
          .select(col("doc_id"),
            when(bucket < 80, "train").when(bucket < 90, "val")
              .otherwise("test").as("split"),
            size(split(col("text"), " ")).cast("bigint").as("n_toks"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      },
      Some(s"""WITH b AS (SELECT doc_id,
        |    ((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT) % 100)
        |      AS bucket,
        |    len(string_split(text, ' '))::BIGINT AS n_toks
        |  FROM documents)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |       count(*)::BIGINT AS n_docs, sum(n_toks)::BIGINT AS n_tokens,
        |       min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM b GROUP BY 1""".stripMargin),
      "Deterministic 80/10/10 split by md5 bucket of the stable doc id — " +
        "content-independent, reproducible across runs and cluster " +
        "sizes, never a random() that reshuffles membership on re-run. " +
        "A narrow projection + one small agg; membership itself is a " +
        "stateless expression any downstream job recomputes for free."),

    // --------------------------------------------- full-outer reconcile
    QueryDef(
      "fullouter_reconcile",
      (s, d) => {
        val ev = Tables.events(s, d)
        val started = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_started"))
        val finished = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_finished"))
        started.join(finished, Seq("user_id"), "full_outer")
          .select(col("user_id"),
            coalesce(col("n_started"), lit(0L)).as("n_started"),
            coalesce(col("n_finished"), lit(0L)).as("n_finished"),
            when(col("n_started").isNull, "finish_only")
              .when(col("n_finished").isNull, "start_only")
              .otherwise("both").as("status"))
      },
      Some("""WITH st AS (SELECT user_id, count(*)::BIGINT AS n_started
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |fi AS (SELECT user_id, count(*)::BIGINT AS n_finished
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id)
        |SELECT coalesce(st.user_id, fi.user_id) AS user_id,
        |       coalesce(n_started, 0) AS n_started,
        |       coalesce(n_finished, 0) AS n_finished,
        |       CASE WHEN st.user_id IS NULL THEN 'finish_only'
        |            WHEN fi.user_id IS NULL THEN 'start_only'
        |            ELSE 'both' END AS status
        |FROM st FULL OUTER JOIN fi ON st.user_id = fi.user_id""".stripMargin),
      "Run-state reconciliation as a FULL OUTER join of submitted vs " +
        "completed per user — the two-sided version of the reference's " +
        "skip-if-done set difference (create_all_models.py:43-47): " +
        "orphans on either side surface instead of silently dropping. " +
        "Both sides pre-aggregate before the join, so the shuffle " +
        "carries one row per user, not one per event."),

    // ------------------------------------------------- text normalize
    QueryDef(
      "text_normalize",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          trim(regexp_replace(
            regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
            " +", " ")).as("norm_text"))
        .withColumn("norm_len", length(col("norm_text")).cast("bigint")),
      Some("""SELECT doc_id,
        |  trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |    ' +', ' ', 'g')) AS norm_text,
        |  len(trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |    ' +', ' ', 'g')))::BIGINT AS norm_len
        |FROM documents""".stripMargin),
      "Canonical text normalization (lowercase, strip non-alphanumeric, " +
        "collapse whitespace) — the cleanup pass upstream of every " +
        "dedup/fingerprint stage. Pure narrow projection: codegen'd " +
        "regexes, no shuffle, scales linearly with the scan."),

    // --------------------------------------------------- funnel analysis
    QueryDef(
      "funnel_conversion",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("t"))
        val stages = ev.groupBy(col("user_id")).agg(
          min(when(col("event_type") === "signup", col("t"))).as("t1"))
          .join(ev, Seq("user_id"))
          .groupBy(col("user_id"), col("t1")).agg(
            min(when(col("event_type") === "click" && col("t") >= col("t1"),
              col("t"))).as("t2"))
          .join(ev, Seq("user_id"))
          .groupBy(col("user_id"), col("t1"), col("t2")).agg(
            min(when(col("event_type") === "purchase" && col("t") >= col("t2"),
              col("t"))).as("t3"))
        stages.agg(
          count(col("t1")).as("reached_signup"),
          count(col("t2")).as("reached_click"),
          count(col("t3")).as("reached_purchase"))
      },
      Some("""WITH ev AS (SELECT user_id, event_type,
        |    epoch_us(ts::TIMESTAMP) AS t FROM events),
        |s1 AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN t END) AS t1
        |  FROM ev GROUP BY user_id),
        |s2 AS (SELECT ev.user_id, t1,
        |    min(CASE WHEN event_type = 'click' AND t >= t1 THEN t END) AS t2
        |  FROM ev JOIN s1 ON s1.user_id = ev.user_id
        |  GROUP BY ev.user_id, t1),
        |s3 AS (SELECT ev.user_id, t1, t2,
        |    min(CASE WHEN event_type = 'purchase' AND t >= t2 THEN t END)
        |      AS t3
        |  FROM ev JOIN s2 ON s2.user_id = ev.user_id
        |  GROUP BY ev.user_id, t1, t2)
        |SELECT count(t1)::BIGINT AS reached_signup,
        |       count(t2)::BIGINT AS reached_click,
        |       count(t3)::BIGINT AS reached_purchase
        |FROM s3""".stripMargin),
      "Strict-order funnel (signup -> click-after -> purchase-after): " +
        "each stage is the earliest qualifying event at-or-after the " +
        "previous stage's time, folded as conditional min aggregates — " +
        "no per-user sequence scan, every stage is one agg over the " +
        "user_id shuffle that AQE can coalesce. NULL timestamps " +
        "propagate 'never reached' through count(col)."),

    // --------------------------------------------- null-safe equi-join
    QueryDef(
      "nullsafe_join_lang",
      (s, d) => {
        // nullif makes 'de' rows carry a NULL key: plain = would drop
        // them from the join entirely; <=> matches NULL to NULL, so the
        // null group participates like any other key.
        val probe = Tables.documents(s, d)
          .select(col("doc_id"), nullif(col("lang"), lit("de")).as("k"))
        val build = Tables.documents(s, d)
          .filter(pmod(col("doc_id"), lit(100)) === 7)
          .select(col("doc_id").as("ref_id"),
            nullif(col("lang"), lit("de")).as("k"))
        probe.join(build, probe("k") <=> build("k"))
          .groupBy(coalesce(probe("k"), lit("<null>")).as("key"))
          .agg(countDistinct(col("doc_id")).as("n_probe"),
            countDistinct(col("ref_id")).as("n_build"),
            count(lit(1)).as("n_pairs"))
      },
      Some("""WITH probe AS (SELECT doc_id, nullif(lang, 'de') AS k
        |  FROM documents),
        |build AS (SELECT doc_id AS ref_id, nullif(lang, 'de') AS k
        |  FROM documents WHERE doc_id % 100 = 7)
        |SELECT coalesce(probe.k, '<null>') AS key,
        |       count(DISTINCT doc_id)::BIGINT AS n_probe,
        |       count(DISTINCT ref_id)::BIGINT AS n_build,
        |       count(*)::BIGINT AS n_pairs
        |FROM probe JOIN build ON probe.k IS NOT DISTINCT FROM build.k
        |GROUP BY 1""".stripMargin),
      "Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys " +
        "form a real join group instead of silently vanishing — the " +
        "semantics reconciliation and SCD merges need when the business " +
        "key is nullable. Plans as a normal hash equi-join (null-safe " +
        "keys hash like values), so the scale shape is unchanged; a hot " +
        "NULL group skews like any hot key and salts the same way."),

    // ------------------------------------- gaps-and-islands run encoding
    QueryDef(
      "event_runs_rle",
      (s, d) => {
        val byTime = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val byTimeAndType = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            (row_number().over(byTime) - row_number().over(byTimeAndType))
              .as("island"))
          .groupBy(col("user_id"), col("event_type"), col("island"))
          .agg(count(lit(1)).as("run_len"), min(col("event_id")).as("start_id"))
          .select(col("user_id"), col("event_type"), col("run_len"),
            col("start_id"))
      },
      Some("""WITH o AS (SELECT user_id, event_id, event_type,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |  - row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS island
        |  FROM events)
        |SELECT user_id, event_type, count(*)::BIGINT AS run_len,
        |       min(event_id) AS start_id
        |FROM o GROUP BY user_id, event_type, island""".stripMargin),
      "Run-length encoding of per-user event streams via the " +
        "gaps-and-islands trick: the difference of two row_numbers is " +
        "constant exactly within a maximal same-type run. Both windows " +
        "share the user_id shuffle; the alternative sequential fold is " +
        "the typed flatMapGroups twin (TypedApiSpec), which buffers one " +
        "group at a time — islands stays fully vectorized."),

    // ------------------------------------------- array set algebra
    QueryDef(
      "array_set_overlap",
      (s, d) => {
        val toks = array_distinct(split(col("text"), " "))
        val docs = Tables.documents(s, d).select(col("doc_id"), toks.as("t"))
        val a = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
          .select(col("doc_id").as("a"), col("t").as("ta"))
        val b = docs.filter(pmod(col("doc_id"), lit(20)) === 10)
          .select((col("doc_id") - 10L).as("a"), col("t").as("tb"))
        a.join(b, "a")
          .select(col("a").as("doc_a"), (col("a") + 10L).as("doc_b"),
            size(array_intersect(col("ta"), col("tb"))).cast("bigint")
              .as("n_common"),
            size(array_union(col("ta"), col("tb"))).cast("bigint")
              .as("n_union"),
            size(array_except(col("ta"), col("tb"))).cast("bigint")
              .as("n_only_a"))
      },
      Some("""WITH d AS (SELECT doc_id, list_distinct(string_split(text, ' '))
        |             AS t FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  len(list_intersect(a.t, b.t))::BIGINT AS n_common,
        |  len(list_distinct(list_concat(a.t, b.t)))::BIGINT AS n_union,
        |  len(list_filter(a.t, x -> NOT list_contains(b.t, x)))::BIGINT
        |    AS n_only_a
        |FROM d a JOIN d b ON b.doc_id = a.doc_id + 10
        |WHERE a.doc_id % 20 = 0""".stripMargin),
      "Row-local array set algebra: token-set intersection/union/" +
        "difference cardinalities per pair via array_intersect/union/" +
        "except — the explode-join-free form of small-set overlap. One " +
        "equi-join moves the arrays; all set logic runs inside the row, " +
        "so no shuffle carries exploded tokens (contrast " +
        "dedup_ngram_jaccard, the join formulation for when sets are " +
        "too large to carry as values)."),

    // --------------------------------------------- schema-evolution union
    QueryDef(
      "union_schema_evolution",
      (s, d) => {
        // v1 records lack quality_score; v2 records lack lang — the
        // columns either schema version is missing fill with nulls, the
        // standard shape when a corpus spans writer versions.
        val v1 = Tables.documents(s, d).filter(pmod(col("doc_id"), lit(2)) === 0)
          .select(col("doc_id"), col("lang"))
        val v2 = Tables.documents(s, d).filter(pmod(col("doc_id"), lit(2)) === 1)
          .select(col("doc_id"), col("n_chars").as("quality_score"))
        v1.unionByName(v2, allowMissingColumns = true)
          .select(col("doc_id"),
            coalesce(col("lang"), lit("unknown")).as("lang"),
            coalesce(col("quality_score"), lit(-1)).cast("bigint")
              .as("quality_score"))
      },
      Some("""SELECT doc_id,
        |  coalesce(lang, 'unknown') AS lang,
        |  coalesce(quality_score, -1)::BIGINT AS quality_score
        |FROM (
        |  SELECT doc_id, lang, NULL AS quality_score
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL BY NAME
        |  SELECT doc_id, n_chars AS quality_score, NULL AS lang
        |  FROM documents WHERE doc_id % 2 = 1)""".stripMargin),
      "Schema-evolution union: unionByName(allowMissingColumns) aligns " +
        "records from different writer versions by column NAME, " +
        "null-filling what each side lacks — positional UNION would " +
        "silently cross-wire columns. How a years-spanning 100 TB " +
        "corpus reads as one table without a rewrite."),

    // ------------------------------------- sorted-neighborhood blocking
    QueryDef(
      "blocking_sorted_neighborhood",
      (s, d) => {
        // adjacency from a ScalableIndex dense index over the total
        // order (lang, bkey, doc_id) joined on idx+1 — not a
        // lang-partitioned lead() window (corpus/|lang| rows per task);
        // the lang equality keeps pairs inside the block
        val keyed = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            substring(lower(col("text")), 1, 12).as("bkey"))
        val idxd = graft.operators.ScalableIndex.withDenseIndex(
          keyed, Seq(col("lang"), col("bkey"), col("doc_id")), 8, "idx")
        val nxt = idxd.select(col("doc_id").as("next_id"),
          col("lang").as("nlang"), col("bkey").as("next_bkey"),
          (col("idx") - 1).as("idx"))
        idxd.join(nxt, Seq("idx"))
          .filter(col("lang") === col("nlang"))
          .select(col("doc_id"), col("next_id"), col("lang"),
            (substring(col("bkey"), 1, 4) ===
              substring(col("next_bkey"), 1, 4)).as("prefix_match"))
      },
      Some("""WITH keyed AS (SELECT doc_id, lang,
        |    substr(lower(text), 1, 12) AS bkey FROM documents),
        |nbr AS (SELECT doc_id, lang, bkey,
        |    lead(doc_id) OVER (PARTITION BY lang
        |                       ORDER BY bkey, doc_id) AS next_id,
        |    lead(bkey) OVER (PARTITION BY lang
        |                     ORDER BY bkey, doc_id) AS next_bkey
        |  FROM keyed)
        |SELECT doc_id, next_id, lang,
        |       (substr(bkey, 1, 4) = substr(next_bkey, 1, 4)) AS prefix_match
        |FROM nbr WHERE next_id IS NOT NULL""".stripMargin),
      "Sorted-neighborhood blocking, the non-LSH dedup candidate " +
        "strategy: sort by (lang, blocking key) and pair adjacent docs " +
        "— adjacency via ScalableIndex idx+1 equi-join (range exchange " +
        "+ fine-grained keys), so every lang splits across tasks; " +
        "window size 1 here, widen with more offsets. At 100 TB each " +
        "task emits only its neighborhood pairs, never a cross join."),

    // ---------------------------------------------------- fuzzy matching
    QueryDef(
      "fuzzy_match_pairs",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        // candidate pairs: each sampled doc vs its successor sampled doc
        // — a bounded, deterministic pair list standing in for a
        // blocking stage's output (at scale the pair list comes from an
        // LSH/sorted-neighborhood block, never all-pairs).
        val sampled = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        val pairs = sampled.select(col("doc_id").as("a"),
            (col("doc_id") + 10L).as("b"), col("text").as("ta"))
          .join(sampled.select(col("doc_id").as("b"),
            col("text").as("tb")), "b")
        pairs.select(col("a"), col("b"),
          levenshtein(substring(col("ta"), 1, 64),
            substring(col("tb"), 1, 64)).cast("bigint").as("edit_dist"))
          .withColumn("near_match", col("edit_dist") <= 16)
      },
      Some("""WITH sampled AS (SELECT doc_id, substr(text, 1, 64) AS t
        |  FROM documents WHERE doc_id % 10 = 0)
        |SELECT x.doc_id AS a, y.doc_id AS b,
        |       levenshtein(x.t, y.t)::BIGINT AS edit_dist,
        |       levenshtein(x.t, y.t) <= 16 AS near_match
        |FROM sampled x JOIN sampled y ON y.doc_id = x.doc_id + 10""".stripMargin),
      "Edit-distance fuzzy matching over a blocked candidate list: " +
        "levenshtein on fixed 64-char prefixes (the O(k^2) DP cost per " +
        "pair is capped by the prefix, the way production fuzzy joins " +
        "bound worst-case work). Pair generation is an equi-join from " +
        "the blocking key; the verify metric is exact integer DP -- " +
        "same number in both engines."),

    // ------------------------------------------------ safe ingestion cast
    QueryDef(
      "ingest_try_cast",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            col("n_chars").cast("string"))
            .otherwise(split(col("text"), " ").getItem(0)).as("raw"))
        .select(col("doc_id"), expr("try_cast(raw AS BIGINT)").as("parsed"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("parsed")).as("n_parsed"),
          sum(col("parsed")).as("sum_parsed")),
      Some("""WITH raw AS (SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN n_chars::VARCHAR
        |       ELSE string_split(text, ' ')[1] END AS raw
        |  FROM documents)
        |SELECT count(*)::BIGINT AS n_rows,
        |       count(try_cast(raw AS BIGINT))::BIGINT AS n_parsed,
        |       sum(try_cast(raw AS BIGINT))::BIGINT AS sum_parsed
        |FROM raw""".stripMargin),
      "Dirty-data ingestion under ANSI mode: Spark 4 CAST throws on " +
        "malformed input, so bulk parses use try_cast -- NULL on " +
        "failure, then count/quarantine instead of killing a 100 TB " +
        "job on row one. The mixed numeric/word column is synthesized " +
        "deterministically so both engines see identical dirt."),

    // ------------------------------------------------ z-order clustering
    QueryDef(
      "zorder_cluster",
      (s, d) => {
        // Morton code: interleave the low 8 bits of the two dimensions.
        // Pure integer bit math, generated from one constant on both
        // engines — parity by construction.
        val u = col("user_id").bitwiseAND(lit(255L))
        val t = pmod(col("event_id"), lit(256L))
        val z = (0 until 8).map { i =>
          (shiftright(u, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
            (shiftright(t, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
        }.reduce(_ + _)
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"), z.as("zcode"))
          .withColumn("zbucket", expr("zcode div 4096"))
      },
      Some(s"""SELECT event_id, user_id,
        |  (${(0 until 8).map(i =>
          s"(((user_id & 255) >> $i) & 1) * ${1L << (2 * i)} + " +
            s"(((event_id % 256) >> $i) & 1) * ${1L << (2 * i + 1)}")
          .mkString(" + ")}) AS zcode,
        |  ((${(0 until 8).map(i =>
          s"(((user_id & 255) >> $i) & 1) * ${1L << (2 * i)} + " +
            s"(((event_id % 256) >> $i) & 1) * ${1L << (2 * i + 1)}")
          .mkString(" + ")}) // 4096)::BIGINT AS zbucket
        |FROM events""".stripMargin),
      "Z-order (Morton) clustering key over two dimensions: writing a " +
        "100 TB table sorted by zcode co-locates rows close in BOTH " +
        "dimensions, so min/max file statistics prune scans for " +
        "predicates on either — the layout trick behind multi-dim " +
        "pruning in modern lakehouse formats, as a plain integer " +
        "expression. zbucket (zcode div 4096) is the file/partition " +
        "assignment a writer would repartitionByRange on."),

    // ---------------------------------------------------- kNN graph
    QueryDef(
      "knn_graph",
      (s, d) => {
        val base = Tables.embeddings(s, d).filter(col("vec_id") < 300)
          .select(col("vec_id"), col("embedding"))
        base.as("x").join(broadcast(base.as("y")),
            col("x.vec_id") =!= col("y.vec_id"))
          .select(col("x.vec_id").as("src"), col("y.vec_id").as("dst"),
            cosine(col("x.embedding"), col("y.embedding")).as("cos"))
          .withColumn("nn_rank", row_number().over(
            Window.partitionBy(col("src"))
              .orderBy(col("cos").desc, col("dst"))).cast("bigint"))
          .filter(col("nn_rank") <= 3)
          .select(col("src"), col("dst"), col("nn_rank"),
            floor(col("cos") * 1000000).cast("bigint").as("cos_e6"))
      },
      Some(s"""WITH base AS (SELECT vec_id, embedding FROM embeddings
        |             WHERE vec_id < 300),
        |scored AS (SELECT x.vec_id AS src, y.vec_id AS dst,
        |    ${cosineSql("x.embedding", "y.embedding")} AS cos
        |  FROM base x JOIN base y ON x.vec_id != y.vec_id),
        |ranked AS (SELECT src, dst, cos, row_number() OVER (
        |    PARTITION BY src ORDER BY cos DESC, dst) AS nn_rank
        |  FROM scored)
        |SELECT src, dst, nn_rank, floor(cos * 1000000)::BIGINT AS cos_e6
        |FROM ranked WHERE nn_rank <= 3""".stripMargin),
      "k-nearest-neighbor graph (k=3) over embeddings — the similarity " +
        "structure behind diversity sampling and semantic cluster " +
        "curation. Fixture-scale is brute force with the smaller side " +
        "broadcast (one pass, no shuffle until the per-src top-k " +
        "window); at 100 TB the pair generation swaps to the LSH/IVF " +
        "bucket join of ann_lsh_topk/ann_ivf_topk unchanged downstream " +
        "of the score column."),
  )
}
