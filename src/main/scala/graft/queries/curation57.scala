package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TopKLongsAgg.minkLongs

/** Batch 57: KMV (k-minimum-values / theta-style) sketches — the one
  * mergeable-sketch family the engine did not yet demonstrate.  HLL
  * (curation54) answers UNION cardinality but cannot estimate
  * INTERSECTIONS; a KMV sketch — the k smallest values of a uniform
  * hash over the set — supports both: the k-th minimum estimates the
  * distinct count ((k-1) * M / h_k for a hash space of size M), and
  * because the sketch is a uniform SAMPLE of the distinct values, the
  * union sketch of two sets (k smallest of the pooled sketches) can be
  * probed for membership in both sides, giving a Jaccard / overlap
  * estimate — the theta-sketch intersection trick (Dasgupta et al.,
  * "Theta-Sketch Framework", and Beyer et al. 2007 on KMV).
  *
  * Scale shape: the sketch is built by [[graft.functions.TopKLongsAgg]]
  * (largest = false), a TypedImperativeAggregate with map-side
  * partials — every partition reduces to <= k longs before the
  * shuffle, so a per-group sketch over a 100 TB corpus exchanges
  * n_groups * k longs.  All estimate arithmetic is IEEE-identical on
  * both engines: (k-1) and M = 2^60 are exactly representable doubles,
  * the long -> double cast of h_k rounds identically, and the final
  * floor is explicit, so the oracle hash-matches bit for bit.
  *
  * Hashing follows the repo-wide md5 convention (dedup.scala:80): the
  * first 15 hex chars of md5 as a 60-bit integer — computable
  * identically in Spark (conv(substr(md5 ..))) and DuckDB
  * (('0x' || substr(md5 ..))::BIGINT).
  */
object Curation57Queries {

  /** sketch size: 32 mins per group for cardinality, 64 for Jaccard */
  private val KCard = 32
  private val KJac = 64

  /** hash space size 2^60 (15 hex chars), exactly representable as a
    * double (single mantissa bit) */
  private val M: Double = 1152921504606846976.0d

  /** 60-bit md5-derived hash of a string column — the oracle computes
    * the identical value via ('0x' || substr(md5(x),1,15))::BIGINT. */
  private def h60(c: String): org.apache.spark.sql.Column =
    expr(s"cast(conv(substring(md5($c), 1, 15), 16, 10) as bigint)")

  val defs: Seq[QueryDef] = Seq(

    // ---------------------------------- KMV distinct-count estimation
    QueryDef(
      "kmv_distinct_by_type",
      (s, d) => {
        val k = KCard
        // distinct (event_type, hash) first: KMV is defined over the
        // DISTINCT value set.  Map-side combine keeps the exchange at
        // the distinct-key volume; the sketch agg after it exchanges
        // n_types * k longs.
        val hashes = Tables.events(s, d)
          .select(col("event_type"),
            h60("cast(user_id as string)").as("h"))
          .distinct()
        val sk = hashes.groupBy(col("event_type"))
          .agg(minkLongs(col("h"), k).as("sk"))
        // per-type estimate: exact when the sketch is unsaturated
        // (n_kept < k means we hold EVERY distinct hash), else the
        // classic (k-1) * M / h_k with h_k = the k-th smallest.
        def estimate(skc: org.apache.spark.sql.Column) = {
          val nKept = size(skc)
          val kth = element_at(skc, -1)
          when(nKept < k, nKept.cast("long"))
            .otherwise(floor(lit((k - 1).toDouble) * lit(M) / kth.cast("double"))
              .cast("long"))
        }
        val perType = sk.select(
          col("event_type"),
          size(col("sk")).cast("long").as("n_kept"),
          element_at(col("sk"), -1).as("kth_min_hash"),
          estimate(col("sk")).as("users_est"))
        // the mergeability payoff: the _all sketch comes from the five
        // per-type sketches alone — k smallest of their pooled distinct
        // values — WITHOUT rescanning events (sketch rows: 5 * k longs).
        val merged = sk
          .select(explode(col("sk")).as("h")).distinct()
          .agg(minkLongs(col("h"), k).as("sk"))
        val allRow = merged.select(
          lit("_all").as("event_type"),
          size(col("sk")).cast("long").as("n_kept"),
          element_at(col("sk"), -1).as("kth_min_hash"),
          estimate(col("sk")).as("users_est"))
        perType.unionByName(allRow).orderBy(col("event_type"))
      },
      Some(s"""WITH h AS (
        |  SELECT DISTINCT event_type,
        |    ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM events),
        |ranked AS (
        |  SELECT event_type, h,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        |  FROM h),
        |sk AS (SELECT event_type, h FROM ranked WHERE rn <= $KCard),
        |per AS (
        |  SELECT event_type, count(*)::BIGINT AS n_kept,
        |    max(h)::BIGINT AS kth_min_hash
        |  FROM sk GROUP BY event_type),
        |uni AS (SELECT DISTINCT h FROM sk),
        |uranked AS (
        |  SELECT h, row_number() OVER (ORDER BY h) AS rn FROM uni),
        |usk AS (SELECT h FROM uranked WHERE rn <= $KCard),
        |allrow AS (
        |  SELECT '_all' AS event_type, count(*)::BIGINT AS n_kept,
        |    max(h)::BIGINT AS kth_min_hash
        |  FROM usk),
        |unioned AS (
        |  SELECT * FROM per UNION ALL SELECT * FROM allrow)
        |SELECT event_type, n_kept, kth_min_hash,
        |  CASE WHEN n_kept < $KCard THEN n_kept
        |       ELSE CAST(floor(${KCard - 1}.0 * 1152921504606846976.0
        |                       / kth_min_hash) AS BIGINT) END AS users_est
        |FROM unioned ORDER BY event_type""".stripMargin),
      "KMV distinct-user estimation per event type plus a merged _all " +
        "row computed from the five per-type sketches WITHOUT " +
        "rescanning events — the mergeability HLL shares, plus the " +
        "uniform-sample property HLL lacks (exercised by " +
        "kmv_jaccard_sources).  Sketches are built by the native " +
        "min-k TypedImperativeAggregate, so each partition ships at " +
        "most k longs per group into the shuffle; the estimator " +
        "((k-1) * 2^60 / h_k, exact below saturation) uses only " +
        "IEEE-identical double ops, so the DuckDB oracle matches bit " +
        "for bit."),

    // ------------------------------ KMV Jaccard / overlap estimation
    QueryDef(
      "kmv_jaccard_sources",
      (s, d) => {
        val k = KJac
        // per-source sketch over the distinct WORD sets of src0..src3
        val toks = Tables.documents(s, d)
          .where(col("source").isin("src0", "src1", "src2", "src3"))
          .select(col("source"),
            explode(split(col("text"), " ")).as("w"))
          .where(length(col("w")) > 0)
        val hashes = toks.select(col("source"), h60("w").as("h")).distinct()
        val sk = hashes.groupBy(col("source"))
          .agg(minkLongs(col("h"), k).as("sk"))
        // 4 sketch rows -> 6 pairs: the pair join touches sketches
        // only (k longs each), never the corpus — the whole point of
        // estimating pairwise overlap at scale.  The union sketch of a
        // pair is the k smallest of the pooled per-side sketches
        // (array ops on k-bounded arrays, all codegen'd), and every
        // union-sketch member found in BOTH sides is an intersection
        // witness: J ~ n_both / n_union.
        val pairs = sk.as("a").join(sk.as("b"),
          col("a.source") < col("b.source"))
        pairs.select(
          col("a.source").as("src_a"),
          col("b.source").as("src_b"),
          slice(array_sort(array_distinct(
            concat(col("a.sk"), col("b.sk")))), 1, k).as("usk"),
          col("a.sk").as("ask"), col("b.sk").as("bsk"))
          .select(
            col("src_a"), col("src_b"),
            size(col("usk")).cast("long").as("n_union"),
            size(expr("filter(usk, x -> array_contains(ask, x) " +
              "AND array_contains(bsk, x))")).cast("long").as("n_both"))
          .withColumn("jaccard_permille",
            expr("(1000 * n_both) div n_union"))
          .orderBy(col("src_a"), col("src_b"))
      },
      Some(s"""WITH tok AS (
        |  SELECT DISTINCT source, w FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS w
        |    FROM documents
        |    WHERE source IN ('src0', 'src1', 'src2', 'src3'))
        |  WHERE length(w) > 0),
        |h AS (
        |  SELECT DISTINCT source,
        |    ('0x' || substr(md5(w), 1, 15))::BIGINT AS h
        |  FROM tok),
        |ranked AS (
        |  SELECT source, h,
        |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        |  FROM h),
        |sk AS (SELECT source, h FROM ranked WHERE rn <= $KJac),
        |srcs AS (SELECT DISTINCT source FROM sk),
        |pairs AS (
        |  SELECT a.source AS src_a, b.source AS src_b
        |  FROM srcs a, srcs b WHERE a.source < b.source),
        |uni AS (
        |  SELECT p.src_a, p.src_b, s.h
        |  FROM pairs p JOIN sk s
        |    ON s.source = p.src_a OR s.source = p.src_b
        |  GROUP BY 1, 2, 3),
        |uranked AS (
        |  SELECT src_a, src_b, h,
        |    row_number() OVER (PARTITION BY src_a, src_b ORDER BY h)
        |      AS rn
        |  FROM uni),
        |usk AS (SELECT src_a, src_b, h FROM uranked WHERE rn <= $KJac),
        |wit AS (
        |  SELECT u.src_a, u.src_b, count(*)::BIGINT AS n_both
        |  FROM usk u
        |  JOIN sk sa ON sa.source = u.src_a AND sa.h = u.h
        |  JOIN sk sb ON sb.source = u.src_b AND sb.h = u.h
        |  GROUP BY 1, 2),
        |usz AS (
        |  SELECT src_a, src_b, count(*)::BIGINT AS n_union
        |  FROM usk GROUP BY 1, 2)
        |SELECT z.src_a, z.src_b, z.n_union,
        |  coalesce(b.n_both, 0)::BIGINT AS n_both,
        |  ((1000 * coalesce(b.n_both, 0)) // z.n_union)::BIGINT
        |    AS jaccard_permille
        |FROM usz z LEFT JOIN wit b
        |  ON b.src_a = z.src_a AND b.src_b = z.src_b
        |ORDER BY 1, 2""".stripMargin),
      "Pairwise vocabulary Jaccard between sources estimated from KMV " +
        "sketches ALONE: the union sketch of a pair is the k smallest " +
        "of the two pooled sketches (the KMV closure property), and " +
        "its members present in both sides are intersection " +
        "witnesses — the theta-sketch intersection estimator.  After " +
        "the one sketch-building pass, pair costs are O(pairs * k) " +
        "regardless of corpus size, which is what makes all-pairs " +
        "source-overlap matrices feasible at 100 TB where the exact " +
        "n-gram join (contamination_ngram_overlap) is quadratic.  " +
        "Integer outputs (permille, floor division) on both engines."),
  )
}
