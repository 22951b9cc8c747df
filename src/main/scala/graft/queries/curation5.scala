package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Sequence- and vocabulary-mining batch: trailing-window anomaly
  * detection, session path mining, deterministic contrastive negative
  * sampling, and one BPE vocabulary-merge step.
  *
  * The reference's run-state polling (train_adapters/create_all_models
  * .py:48-76) motivates the event-sequence operators; the tokenizer-
  * facing ones (BPE pair statistics, negative sampling) are the
  * training-data counterparts a 100 TB pipeline runs next to them.
  *
  * All-integer scoring throughout (see [[graft.Det]]): the z-score
  * test is cross-multiplied so no division or sqrt ever happens, and
  * sampling uses md5-derived hashes — deterministic on both engines.
  */
object Curation5Queries {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------ trailing-window z-score
    QueryDef(
      "anomaly_zscore_trailing",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id")).rowsBetween(-10, -1)
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            floor(col("value") * 1000).cast("bigint").as("x_e3"),
            col("ts"))
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("s1", sum(col("x_e3")).over(w))
          .withColumn("s2", sum(col("x_e3") * col("x_e3")).over(w))
          .filter(col("n") === 10)
          // z^2 > 4 cross-multiplied: (n*x - s1)^2 > 4*(n*s2 - s1^2)
          .select(col("event_id"), col("user_id"), col("x_e3"),
            ((col("x_e3") * 10 - col("s1")) * (col("x_e3") * 10 - col("s1")) >
              (col("s2") * 10 - col("s1") * col("s1")) * 4).as("is_anomaly"))
      },
      Some("""WITH scored AS (SELECT event_id, user_id,
        |    floor(value * 1000)::BIGINT AS x_e3,
        |    count(*) OVER w AS n,
        |    sum(floor(value * 1000)::BIGINT) OVER w AS s1,
        |    sum(floor(value * 1000)::BIGINT * floor(value * 1000)::BIGINT) OVER w AS s2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, x_e3,
        |       ((x_e3 * 10 - s1) * (x_e3 * 10 - s1) > (s2 * 10 - s1 * s1) * 4)
        |         AS is_anomaly
        |FROM scored WHERE n = 10""".stripMargin),
      "Trailing-window anomaly flag: |x - mean| > 2 sigma over the " +
        "previous 10 events per user, evaluated entirely in integers by " +
        "cross-multiplying the z-score inequality — no division, no " +
        "sqrt, bit-reproducible under any partitioning. One shuffle on " +
        "user_id; the frame is O(1) state per row. The outlier gate for " +
        "metric streams feeding training-data freshness dashboards."),

    // ------------------------------------------ session path mining
    QueryDef(
      "top_session_paths",
      (s, d) => {
        val paths = Tables.events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day"),
            struct(col("ts"), col("event_id"), col("event_type")).as("e"))
          .groupBy(col("user_id"), col("day"))
          .agg(array_join(
            transform(array_sort(collect_list(col("e"))),
              x => x.getField("event_type")), ">").as("path"))
        paths.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("n_sessions").desc, col("path"))).cast("bigint"))
          .filter(col("rk") <= 10)
          .select(col("rk"), col("path"), col("n_sessions"))
      },
      Some("""WITH sessions AS (SELECT user_id, ts::DATE AS day,
        |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM events GROUP BY user_id, ts::DATE),
        |counted AS (SELECT path, count(*)::BIGINT AS n_sessions
        |            FROM sessions GROUP BY path)
        |SELECT row_number() OVER (ORDER BY n_sessions DESC, path)::BIGINT AS rk,
        |       path, n_sessions
        |FROM counted ORDER BY n_sessions DESC, path LIMIT 10""".stripMargin),
      "Top event-type paths per (user, day) session: ordered in-group " +
        "collect (array_sort on the (ts, event_id) struct prefix makes " +
        "the concatenation order total), then a count-and-rank over the " +
        "path dictionary. Path cardinality, not event volume, hits the " +
        "final window — the frequent-journey mining pass of clickstream " +
        "analytics. Per-session state is bounded by session length; " +
        "at 100 TB the day split caps it by construction."),

    // ----------------------------- contrastive negative sampling
    QueryDef(
      "contrastive_negative_pairs",
      (s, d) => {
        val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
        val negs = Tables.documents(s, d).filter(col("doc_id") < 50)
          .select(col("doc_id"), explode(sequence(lit(0), lit(3))).as("slot"))
          .crossJoin(broadcast(n))
          .withColumn("neg_id", pmod(
            conv(substring(md5(concat(col("doc_id").cast("string"),
              lit("_"), col("slot").cast("string"))), 1, 8), 16, 10)
              .cast("long"), col("n_docs")))
          .filter(col("neg_id") =!= col("doc_id"))
          .select(col("doc_id"), col("slot").cast("bigint").as("slot"),
            col("neg_id"))
        negs.join(Tables.documents(s, d)
            .select(col("doc_id").as("neg_id"), col("source").as("neg_source")),
          "neg_id")
          .select(col("doc_id"), col("slot"), col("neg_id"), col("neg_source"))
      },
      Some("""WITH n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
        |negs AS (SELECT d.doc_id, i.i::BIGINT AS slot,
        |    ((('0x' || substr(md5(d.doc_id::VARCHAR || '_' || i.i::VARCHAR), 1, 8))::BIGINT)
        |      % n.n_docs) AS neg_id
        |  FROM documents d, (SELECT range AS i FROM range(0, 4)) i, n
        |  WHERE d.doc_id < 50)
        |SELECT negs.doc_id, negs.slot, negs.neg_id, nd.source AS neg_source
        |FROM negs JOIN documents nd ON nd.doc_id = negs.neg_id
        |WHERE negs.neg_id != negs.doc_id""".stripMargin),
      "Deterministic in-corpus negative sampling for contrastive " +
        "training pairs: 4 pseudo-random negatives per anchor via " +
        "md5(anchor, slot) mod corpus size, self-pairs dropped. Hash " +
        "sampling needs no shared RNG state across executors — the " +
        "property that makes the pair set reproducible at any " +
        "parallelism; the metadata join shuffles only the sampled " +
        "pairs, never the corpus."),

    // ------------------------------------------- one BPE merge step
    QueryDef(
      "bpe_merge_step",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("tok"))
          .filter(length(col("tok")) >= 2)
        toks
          .select(explode(expr(
            "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
            .as("pair"))
          .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("cnt").desc, col("pair"))).cast("bigint"))
          .filter(col("rk") <= 20)
          .select(col("rk"), col("pair"), col("cnt"))
      },
      Some("""WITH toks AS (SELECT t.tok FROM (
        |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
        |  WHERE length(t.tok) >= 2),
        |pairs AS (SELECT substr(tok, i.i + 1, 2) AS pair
        |  FROM toks, (SELECT range AS i FROM range(0, 16)) i
        |  WHERE i.i + 2 <= length(tok)),
        |counted AS (SELECT pair, count(*)::BIGINT AS cnt FROM pairs GROUP BY pair)
        |SELECT row_number() OVER (ORDER BY cnt DESC, pair)::BIGINT AS rk,
        |       pair, cnt
        |FROM counted ORDER BY cnt DESC, pair LIMIT 20""".stripMargin),
      "One BPE vocabulary-learning step: corpus-frequency of adjacent " +
        "symbol pairs within words, top-20 merge candidates. The " +
        "pair-count aggregation is map-side combinable on a tiny key " +
        "space (symbol pairs), so the shuffle carries the dictionary, " +
        "not the corpus — each merge iteration of full BPE training is " +
        "this exact pass over re-segmented tokens. Oracle positions " +
        "capped at range(0,16); FixtureBoundsSpec pins max token " +
        "length 8."))
}
