package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Corpus-health metrics: diversity/concentration indices, shuffle-skew
  * profiling, and posting-list delta compression — the operational layer
  * that tells a pipeline whether its data mix and its partitioning are
  * healthy before committing a 100 TB pass.  The reference balances its
  * training mixes by hand-picked per-domain file lists
  * (train_adapters/create_all_models_json_data.py:29 enumerates domain
  * families); a diversity index is that judgement as a metric.
  */
object QualityQueries {

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------------- Simpson diversity
    QueryDef(
      "source_diversity_simpson",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n"))
        counts.groupBy(col("lang")).agg(
            count(lit(1)).as("n_sources"),
            sum(col("n")).as("total"),
            sum(col("n") * (col("n") - 1)).as("pairs"))
          .select(col("lang"), col("n_sources"),
            // Simpson's D = 1 - sum(n_i (n_i - 1)) / (N (N - 1)),
            // cross-multiplied to e6 fixed point — all integer
            expr("1000000 - (1000000 * pairs) div (total * (total - 1))")
              .as("simpson_e6"))
      },
      Some("""WITH counts AS (SELECT lang, source, count(*)::BIGINT AS n
        |        FROM documents GROUP BY lang, source),
        |m AS (SELECT lang, count(*)::BIGINT AS n_sources,
        |        sum(n)::BIGINT AS total,
        |        sum(n * (n - 1))::BIGINT AS pairs
        |      FROM counts GROUP BY lang)
        |SELECT lang, n_sources,
        |  (1000000 - (1000000 * pairs) // (total * (total - 1)))::BIGINT
        |    AS simpson_e6
        |FROM m""".stripMargin),
      "Simpson diversity of the source mix per language (probability " +
        "two random docs come from different sources) — the " +
        "concentration alarm for a training mixture drifting toward " +
        "one domain. Unbiased finite-sample form, cross-multiplied to " +
        "exact integers (the entropy variant needs ln; Simpson is the " +
        "log-free diversity index). Two partial-aggregatable counts; " +
        "group cardinality is (langs x sources), never row-scale."),

    // --------------------------------------- shuffle-skew probe
    QueryDef(
      "shuffle_skew_profile",
      (s, d) => {
        val bucketed = Tables.events(s, d)
          .select(pmod(conv(substring(md5(col("user_id").cast("string")), 1, 8),
            16, 10).cast("long"), lit(32L)).as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        bucketed
          .withColumn("total", sum(col("n")).over(
            org.apache.spark.sql.expressions.Window.partitionBy()))
          .select(col("bucket"), col("n"),
            expr("(1000 * n) div total").as("permille"),
            expr("(32 * n) div total").as("x_of_even"))
      },
      Some("""WITH b AS (SELECT
        |    (('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 32)
        |      AS bucket
        |  FROM events),
        |g AS (SELECT bucket, count(*)::BIGINT AS n FROM b GROUP BY bucket)
        |SELECT bucket, n,
        |  ((1000 * n) // sum(n) OVER ())::BIGINT AS permille,
        |  ((32 * n) // sum(n) OVER ())::BIGINT AS x_of_even
        |FROM g""".stripMargin),
      "Partition-skew profile: hash events into 32 buckets by join key " +
        "and report each bucket's share and its multiple of the even " +
        "share — the pre-flight check before a 100 TB shuffle on that " +
        "key (x_of_even >= 2 on any bucket predicts a straggler task; " +
        "the remedy is salting or AQE skew-join, see skewjoin_salted). " +
        "md5 buckets, not Spark's murmur hash, so the profile is " +
        "engine-portable; the real shuffle uses the engine hash but " +
        "skew is a property of the key distribution, not the hash."),

    // --------------------------------- delta-encoded postings
    QueryDef(
      "postings_delta_encode",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .filter(length(col("tok")) >= 4).distinct()
        toks.groupBy(col("tok"))
          .agg(sort_array(collect_list(col("doc_id"))).as("postings"))
          .filter(size(col("postings")) >= 2)
          .select(col("tok"),
            size(col("postings")).cast("long").as("df"),
            element_at(col("postings"), 1).as("first_doc"),
            // CSV-stringified gaps: scalar-sortable rows for the oracle
            // hash-compare (pandas can't sort ndarray cells).
            expr("""array_join(transform(
                sequence(2, size(postings)),
                i -> cast(element_at(postings, i) - element_at(postings, i - 1)
                          AS string)), ',')""")
              .as("gaps"),
            expr("""aggregate(
                transform(sequence(2, size(postings)),
                  i -> element_at(postings, i) - element_at(postings, i - 1)),
                CAST(0 AS BIGINT), (a, g) -> greatest(a, g))""")
              .as("max_gap"))
      },
      Some("""WITH toksd AS (SELECT DISTINCT doc_id, t.tok FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents) t
        |  WHERE length(t.tok) >= 4),
        |p AS (SELECT tok, list(doc_id ORDER BY doc_id) AS postings
        |      FROM toksd GROUP BY tok),
        |g AS (SELECT tok, i.i AS idx, postings[i.i] - postings[i.i - 1] AS gap
        |      FROM p, (SELECT range AS i FROM range(2, 8192)) i
        |      WHERE i.i <= len(postings)),
        |a AS (SELECT tok, array_to_string(list(gap ORDER BY idx), ',') AS gaps,
        |        max(gap)::BIGINT AS max_gap
        |      FROM g GROUP BY tok)
        |SELECT p.tok, len(p.postings)::BIGINT AS df,
        |  p.postings[1] AS first_doc, a.gaps, a.max_gap
        |FROM p JOIN a USING (tok) WHERE len(p.postings) >= 2""".stripMargin),
      "Delta (d-gap) encoding of inverted-index posting lists: sorted " +
        "doc ids stored as first + successive gaps, the standard index " +
        "compression that turns 8-byte ids into small varint-able " +
        "deltas (max_gap bounds the bit width per list). Builds on " +
        "the same (term -> sorted postings) agg as " +
        "inverted_index_postings; the gap transform is a per-row array " +
        "HOF — no extra shuffle, and at 100 TB the lists are written " +
        "bucketed-by-term so encode/decode stays partition-local."),
  )
}
