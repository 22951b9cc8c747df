package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Training-set preparation operators: stratified k-fold assignment,
  * class-balanced downsampling, feature hashing, leave-one-out target
  * encoding, trailing EWMA, and readability grading.  The reference
  * prepares its fine-tune corpora with ad-hoc Python list slicing
  * (train_adapters/RAG-eval-create_model.py:60-74 builds the train list
  * in driver memory); these are the same preparation steps as
  * shuffle-bounded engine operators.
  */
object MlPrepQueries {

  /** Deterministic md5 bucket of an integer id, in [0, n). Same idiom as
    * split_train_val_test — portable across engines and partitionings. */
  private def md5Bucket(c: org.apache.spark.sql.Column, n: Int) =
    pmod(conv(substring(md5(c.cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(n.toLong))

  private def md5BucketSql(c: String, n: Int) =
    s"(('0x' || substr(md5($c::VARCHAR), 1, 8))::BIGINT % $n)"

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------ stratified k-fold
    QueryDef(
      "kfold_assign",
      (s, d) => Tables.documents(s, d)
        .withColumn("fold", md5Bucket(col("doc_id"), 5))
        .groupBy(col("lang"), col("fold"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc")),
      Some(s"""SELECT lang, ${md5BucketSql("doc_id", 5)} AS fold,
        |  count(*)::BIGINT AS n_docs,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY 1, 2""".stripMargin),
      "Stratified 5-fold cross-validation assignment: fold = md5 bucket " +
        "of the stable id — deterministic under any partitioning, " +
        "reproducible across runs/engines, no global shuffle or RNG " +
        "state (the property rand(seed) lacks: its draw depends on row " +
        "order within partitions). Per-(stratum, fold) counts verify " +
        "balance; the doc-level assignment is the same projection " +
        "without the final agg."),

    // ------------------------------- class-balanced downsampling
    QueryDef(
      "class_balance_downsample",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        // minority-class size, computed on the 10-row per-label counts
        // then windowed across them (never a full-table single partition)
        val counts = e.groupBy(col("label")).agg(count(lit(1)).as("n"))
          .withColumn("n_min", min(col("n")).over(Window.partitionBy()))
        // per-label shuffle rank via ScalableGroups, NOT a per-label
        // window: label is a ~10-value enum, so a window would funnel
        // corpus/10 rows per task; the group-rank form range-exchanges
        // the (label, hash) total order and rebases by broadcast
        // offsets (exact row_number parity, ScalableGroupsSpec)
        val hashed = e.select(col("vec_id"), col("label"))
          .withColumn("__h", md5(col("vec_id").cast("string")))
        val ranked = graft.operators.ScalableGroups.withGroupRank(
          hashed, Seq("label"), Seq(col("__h"), col("vec_id")), 8,
          rankCol = "rk")
        ranked.join(counts.select(col("label"), col("n_min")), "label")
          .filter(col("rk") <= col("n_min"))
          .select(col("vec_id"), col("label"))
      },
      Some("""WITH counts AS (SELECT label, count(*)::BIGINT AS n
        |                FROM embeddings GROUP BY label),
        |m AS (SELECT label, min(n) OVER () AS n_min FROM counts),
        |ranked AS (SELECT vec_id, label, row_number() OVER (
        |    PARTITION BY label ORDER BY md5(vec_id::VARCHAR), vec_id) AS rk
        |  FROM embeddings)
        |SELECT r.vec_id, r.label FROM ranked r JOIN m USING (label)
        |WHERE r.rk <= m.n_min""".stripMargin),
      "Class-balanced downsampling to the minority-class size: " +
        "deterministic md5-order rank within each label, cut at " +
        "min(count). The cut size is data-derived (one 10-row agg + " +
        "window, broadcast back) — no hand-tuned constant; the rank " +
        "pass is the per-group sort that sample_fixed_per_group " +
        "already bounds, and md5 order makes the kept subset a " +
        "uniform, reproducible draw."),

    // ------------------------------------------- feature hashing
    QueryDef(
      "feature_hash_vec",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .withColumn("bin", md5Bucket(col("tok"), 64))
        .groupBy(col("doc_id"), col("bin"))
        .agg(count(lit(1)).as("cnt")),
      Some(s"""SELECT doc_id, ${md5BucketSql("tok", 64)} AS bin,
        |  count(*)::BIGINT AS cnt
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |      FROM documents)
        |GROUP BY 1, 2""".stripMargin),
      "Hashing-trick featurization: token -> md5 bin in a fixed " +
        "64-dim space, per-document sparse counts as (doc, bin, cnt) " +
        "triples. No vocabulary build, no dictionary broadcast, fixed " +
        "output dimensionality — the property that lets featurization " +
        "run in one pass at 100 TB where a vocab join would need its " +
        "own shuffle. The dense vector is a downstream pivot/" +
        "map_from_entries over the triples."),

    // ------------------------------ leave-one-out target encoding
    QueryDef(
      "target_encode_loo",
      (s, d) => {
        // per-lang (sum, count) as a 5-row hash aggregate broadcast
        // back — algebraically identical to the windowed sum/count over
        // the enum partition, without funneling corpus-size rows
        // through |lang| window tasks
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("n_chars"))
        val stats = docs.groupBy(col("lang"))
          .agg(sum(col("n_chars")).as("slang"),
            count(lit(1)).as("nlang"))
          .filter(col("nlang") > 1)
        docs.join(broadcast(stats), "lang")
          .select(col("doc_id"), col("lang"),
            expr("(1000 * (slang - n_chars)) div (nlang - 1)").as("enc_e3"))
      },
      Some("""WITH w AS (SELECT doc_id, lang, n_chars,
        |    sum(n_chars) OVER (PARTITION BY lang) AS slang,
        |    count(*) OVER (PARTITION BY lang) AS nlang
        |  FROM documents)
        |SELECT doc_id, lang,
        |  ((1000 * (slang - n_chars)) // (nlang - 1))::BIGINT AS enc_e3
        |FROM w WHERE nlang > 1""".stripMargin),
      "Leave-one-out target encoding of a categorical column (lang -> " +
        "mean length of the OTHER members, the encoding that avoids " +
        "self-leakage): enc = (sum - x) / (n - 1), computed as the " +
        "5-row per-lang aggregate broadcast back onto the rows — " +
        "integer-exact at e3, one map-side join, no enum-partitioned " +
        "window anywhere (the windowed form concentrates corpus/|lang| " +
        "rows per task; this shape is flat at any corpus size)."),

    // ------------------------------------------------ trailing EWMA
    QueryDef(
      "ewma_halflife",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          floor(col("value") * 100).cast("long").as("v100"))
        .withColumn("xs", collect_list(col("v100")).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ts"), col("event_id"))
            .rowsBetween(-15, Window.currentRow)))
        .select(col("event_id"), col("user_id"),
          expr("""aggregate(
            zip_with(xs, sequence(1, size(xs)),
                     (x, i) -> x * shiftleft(CAST(1 AS BIGINT), i - 1)),
            CAST(0 AS BIGINT), (a, b) -> a + b)
            div (shiftleft(CAST(1 AS BIGINT), size(xs)) - 1)""")
            .as("ewma_e2")),
      Some("""WITH seq AS (SELECT event_id, user_id,
        |    list(floor(value * 100)::BIGINT) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS xs
        |  FROM events),
        |expanded AS (SELECT event_id, user_id,
        |    sum(xs[i.i] * (1::BIGINT << (i.i - 1)))::BIGINT AS num,
        |    ((1::BIGINT << len(xs)) - 1)::BIGINT AS den
        |  FROM seq, (SELECT range AS i FROM range(1, 17)) i
        |  WHERE i.i <= len(xs)
        |  GROUP BY event_id, user_id, len(xs))
        |SELECT event_id, user_id, (num // den)::BIGINT AS ewma_e2
        |FROM expanded""".stripMargin),
      "Trailing exponentially-weighted moving average (half-life decay, " +
        "16-event frame): weight of the j-th most recent event is " +
        "2^-j, realized as exact power-of-two integer weights over a " +
        "bounded ROWS frame — no float accumulation, no recursion " +
        "(the truncated-window form of the recurrence the streaming " +
        "twin Streams.decayedActivity keeps in state). One window " +
        "pass partitioned by user; frame bound 16 caps per-row state " +
        "at any scale."),

    // ----------------------------------------- readability grade
    QueryDef(
      "flesch_reading_grade",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("words"),
          regexp_count(col("text"), lit("[aeiouy]+")).cast("long")
            .as("syllables"))
        .select(col("doc_id"), col("words"), col("syllables"),
          expr("390 * words + (11800 * syllables) div words - 15590")
            .as("fk_grade_e3")),
      Some("""SELECT doc_id,
        |  len(string_split(text, ' '))::BIGINT AS words,
        |  len(regexp_extract_all(text, '[aeiouy]+'))::BIGINT AS syllables,
        |  (390 * len(string_split(text, ' '))
        |   + (11800 * len(regexp_extract_all(text, '[aeiouy]+')))
        |     // len(string_split(text, ' '))
        |   - 15590)::BIGINT AS fk_grade_e3
        |FROM documents""".stripMargin),
      "Flesch-Kincaid grade level (0.39 w/s + 11.8 syl/w - 15.59, at " +
        "e3 fixed point) with vowel-group syllable counting — the " +
        "classic readability gate for training-text curation. The " +
        "fixture corpus has no sentence punctuation, so sentences = 1 " +
        "and w/s = words; on punctuated text the sentence count is " +
        "one more regexp_count('[.!?]+'). Pure per-row projection — " +
        "embarrassingly parallel, codegen'd, no shuffle."),

    // ------------------------------------------ tokenizer fertility
    QueryDef(
      "tokenizer_fertility",
      (s, d) => Tables.documents(s, d)
        .select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("words"),
          regexp_count(col("text"), lit("[a-z0-9]{1,4}")).cast("long")
            .as("subwords"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("words")).as("total_words"),
          sum(col("subwords")).as("total_subwords"))
        .select(col("lang"), col("n_docs"), col("total_words"),
          col("total_subwords"),
          expr("(1000 * total_subwords) div total_words")
            .as("fertility_e3")),
      Some("""SELECT lang, count(*)::BIGINT AS n_docs,
        |  sum(len(string_split(text, ' ')))::BIGINT AS total_words,
        |  sum(len(regexp_extract_all(text, '[a-z0-9]{1,4}')))::BIGINT
        |    AS total_subwords,
        |  ((1000 * sum(len(regexp_extract_all(text, '[a-z0-9]{1,4}'))))
        |   // sum(len(string_split(text, ' '))))::BIGINT AS fertility_e3
        |FROM documents GROUP BY lang""".stripMargin),
      "Tokenizer fertility per language: subword tokens per whitespace " +
        "word under the greedy <=4-char chunker (the BPE-ish stand-in " +
        "text_token_count already uses) — the metric that decides " +
        "whether a tokenizer taxes one language more than another " +
        "(fertility gaps translate directly into compute-per-content " +
        "imbalance in a multilingual mix). Pure projection + one " +
        "5-key agg; both regex engines count non-overlapping greedy " +
        "matches identically on this alphabet."),

    // --------------------------------------- token budget report
    QueryDef(
      "token_budget_by_split",
      (s, d) => {
        val bucket = pmod(
          conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long"), lit(100L))
        Tables.documents(s, d)
          .select(
            when(bucket < 80, "train").when(bucket < 90, "val")
              .otherwise("test").as("split"),
            size(split(col("text"), " ")).cast("long").as("toks"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
          .withColumn("share_permille",
            expr("(1000 * n_tokens) div sum(n_tokens) over ()"))
      },
      Some("""WITH b AS (SELECT
        |    CASE WHEN (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |               % 100) < 80 THEN 'train'
        |         WHEN (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |               % 100) < 90 THEN 'val' ELSE 'test' END AS split,
        |    len(string_split(text, ' '))::BIGINT AS toks
        |  FROM documents),
        |g AS (SELECT split, count(*)::BIGINT AS n_docs,
        |        sum(toks)::BIGINT AS n_tokens FROM b GROUP BY split)
        |SELECT split, n_docs, n_tokens,
        |  ((1000 * n_tokens) // sum(n_tokens) OVER ())::BIGINT
        |    AS share_permille
        |FROM g""".stripMargin),
      "Token budget by split — the first report a pretraining run " +
        "prints: documents and token mass per train/val/test bucket " +
        "with exact permille shares, over the same md5 membership as " +
        "split_train_val_test (recomputed, not stored, so the report " +
        "can never disagree with the split). One agg over 3 keys; the " +
        "share window runs on 3 rows."),

    // -------------------------------------- robust feature scaling
    QueryDef(
      "robust_scale_embedding",
      (s, d) => {
        val q = Tables.embeddings(s, d)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
          .select(col("vec_id"), col("dim").cast("bigint").as("dim"),
            floor(col("x").cast("double") * 1000).cast("long").as("q"))
        val stats = q.groupBy(col("dim")).agg(
          expr("percentile(q, 0.25)").as("p25"),
          expr("percentile(q, 0.5)").as("p50"),
          expr("percentile(q, 0.75)").as("p75"))
        q.filter(col("vec_id") < 20 && col("dim") < 8)
          .join(stats, "dim")
          .select(col("vec_id"), col("dim"),
            expr("""CAST(floor(1000 * (q - p50) / (p75 - p25)) AS BIGINT)""")
              .as("scaled_e3"))
      },
      Some("""WITH q AS (SELECT vec_id, i.i AS dim,
        |    floor(embedding[i.i + 1]::DOUBLE * 1000)::BIGINT AS q
        |  FROM embeddings, (SELECT range AS i FROM range(0, 64)) i),
        |stats AS (SELECT dim, quantile_cont(q, 0.25) AS p25,
        |    quantile_cont(q, 0.5) AS p50, quantile_cont(q, 0.75) AS p75
        |  FROM q GROUP BY dim)
        |SELECT v.vec_id, v.dim,
        |  floor(1000 * (v.q - s.p50) / (s.p75 - s.p25))::BIGINT AS scaled_e3
        |FROM q v JOIN stats s USING (dim)
        |WHERE v.vec_id < 20 AND v.dim < 8""".stripMargin),
      "Robust feature scaling (x - median) / IQR per embedding " +
        "dimension — the outlier-insensitive normalization for " +
        "whitening before clustering/ANN. Quartiles are exact " +
        "interpolated order statistics over e3 fixed-point values " +
        "(bit-identical cross-engine, as quantile_values proved); the " +
        "scale step is a fixed IEEE sequence + floor. One posexplode " +
        "+ one 64-key agg broadcast back onto the (bounded demo) " +
        "projection; at 100 TB the exact quartiles swap to " +
        "approx_percentile per dim, everything else unchanged."),
  )
}
