package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 58: Count-Min Sketch over the raw TOKEN STREAM, and the
  * lossless two-pass heavy-hitter pipeline it enables — extending the
  * key-level CMS demo (curation19.scala `cms_heavy_hitters`, which
  * estimates pre-aggregated lineitem key counts) to the shape a
  * 100 TB corpus actually needs: the sketch is built from raw token
  * occurrences and then USED as a pruning filter, not just compared
  * against truth.  Completes the sketch taxonomy next to cardinality
  * (HLL curation54, KMV curation57).  A CMS is a d x w grid of
  * counters; row i increments counter hash_i(x) mod w, and the
  * estimate for x is the MIN over rows — never an underestimate
  * (Cormode & Muthukrishnan 2005), which is exactly the property the
  * heavy-hitter pipeline exploits: a CMS pre-filter has NO false
  * negatives, so "probe sketch -> exact-count survivors only" is a
  * lossless two-pass that replaces a corpus-wide exact groupBy with a
  * groupBy over the tiny survivor subset.
  *
  * Engine shape (deliberately declarative, no custom agg): the
  * counter grid is built as ROWS — posexplode the d buckets per
  * token, groupBy (r, b), count.  That plans as a HashAggregate with
  * map-side partials over at most d*w = 4096 groups, so the exchange
  * is bounded by the sketch size no matter the corpus size — the same
  * fixed-exchange guarantee a TypedImperativeAggregate buffer would
  * give, but staying inside whole-stage codegen.  Sketch merge is
  * groupBy-sum over counter rows (pinned in CmsSketchSpec).  Probes
  * broadcast the <=4096-row counter table against the candidate side.
  *
  * Hashing follows the repo-wide md5 convention (dedup.scala:80): the
  * 60-bit md5 prefix, with the d=4 row hashes taken as disjoint
  * 10-bit slices at offsets 0/15/30/45 — independent uniform bits,
  * reproducible in DuckDB as (h >> s) & 1023.  All outputs integer.
  */
object Curation58Queries {

  private val D = 4     // rows
  private val W = 1024  // counters per row (10-bit slices)

  /** 60-bit md5-derived hash of a string column (repo convention). */
  private def h60(c: String): org.apache.spark.sql.Column =
    expr(s"cast(conv(substring(md5($c), 1, 15), 16, 10) as bigint)")

  /** the d (row, bucket) pairs of a hash column as posexplode input */
  private def bucketArr(h: String): org.apache.spark.sql.Column =
    array((0 until D).map(i => expr(s"shiftright($h, ${15 * i}) & ${W - 1}")): _*)

  val defs: Seq[QueryDef] = Seq(

    // ----------------------------------- CMS point-frequency estimates
    QueryDef(
      "cms_token_freq",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("w"))
          .where(length(col("w")) > 0)
        // counter grid: corpus -> at most D*W groups; the map-side
        // partial bounds the exchange at sketch size, not corpus size
        val counters = toks
          .select(h60("w").as("h"))
          .select(posexplode(bucketArr("h")).as(Seq("r", "b")))
          .groupBy(col("r"), col("b")).agg(count(lit(1)).as("cnt"))
        // candidates: the 15 most frequent exact tokens (deterministic
        // tie-break on the token itself)
        val exact = toks.groupBy(col("w")).agg(count(lit(1)).as("exact_cnt"))
          .orderBy(col("exact_cnt").desc, col("w")).limit(15)
        // probe: each candidate opens its D buckets, joins the
        // broadcast counter table, takes the min across rows
        val probed = exact
          .withColumn("h", h60("w"))
          .select(col("w"), col("exact_cnt"),
            posexplode(bucketArr("h")).as(Seq("r", "b")))
          .join(broadcast(counters), Seq("r", "b"))
          .groupBy(col("w"), col("exact_cnt"))
          .agg(min(col("cnt")).as("cms_est"))
        probed
          .withColumn("overest", col("cms_est") - col("exact_cnt"))
          .select(col("w").as("token"), col("exact_cnt"),
            col("cms_est"), col("overest"))
          .orderBy(col("exact_cnt").desc, col("token"))
      },
      Some(s"""WITH tok AS (
        |  SELECT w FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) > 0),
        |h AS (
        |  SELECT w, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h
        |  FROM tok),
        |pairs AS (
        |  SELECT r.r, (h.h >> (15 * r.r)) & ${W - 1} AS b
        |  FROM h CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r) r),
        |counters AS (
        |  SELECT r, b, count(*)::BIGINT AS cnt FROM pairs GROUP BY 1, 2),
        |exact AS (
        |  SELECT w, count(*)::BIGINT AS exact_cnt FROM tok
        |  GROUP BY w ORDER BY exact_cnt DESC, w LIMIT 15),
        |probe AS (
        |  SELECT e.w, e.exact_cnt, r.r,
        |    (('0x' || substr(md5(e.w), 1, 15))::BIGINT >> (15 * r.r))
        |      & ${W - 1} AS b
        |  FROM exact e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r) r),
        |est AS (
        |  SELECT p.w, p.exact_cnt, min(c.cnt)::BIGINT AS cms_est
        |  FROM probe p JOIN counters c ON c.r = p.r AND c.b = p.b
        |  GROUP BY 1, 2)
        |SELECT w AS token, exact_cnt, cms_est,
        |  (cms_est - exact_cnt)::BIGINT AS overest
        |FROM est ORDER BY exact_cnt DESC, token""".stripMargin),
      "Count-Min Sketch point-frequency estimates for the 15 most " +
        "frequent tokens, with the exact count and the (always " +
        ">= 0) overestimate alongside.  The counter grid is built as " +
        "rows via posexplode + groupBy — a HashAggregate whose " +
        "map-side partial bounds the exchange at d*w = 4096 groups " +
        "regardless of corpus size — and the probe broadcasts the " +
        "counter table.  Row hashes are disjoint 10-bit slices of the " +
        "repo-convention 60-bit md5 hash, so DuckDB reproduces the " +
        "grid bit for bit; every output is an integer."),

    // ------------------------------------ lossless heavy-hitter filter
    QueryDef(
      "cms_heavy_hitters_twopass",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("w"))
          .where(length(col("w")) > 0)
        val counters = toks
          .select(h60("w").as("h"))
          .select(posexplode(bucketArr("h")).as(Seq("r", "b")))
          .groupBy(col("r"), col("b")).agg(count(lit(1)).as("cnt"))
        // threshold: 0.5% of the token stream (integer, scale-robust)
        val thr = toks.agg((count(lit(1)) / 200).cast("long").as("thr"))
        // pass 2a: probe each DISTINCT token against the broadcast
        // sketch; est >= true count, so est < thr proves non-heavy —
        // the filter has no false negatives by construction
        val survivors = toks.distinct()
          .withColumn("h", h60("w"))
          .select(col("w"),
            posexplode(bucketArr("h")).as(Seq("r", "b")))
          .join(broadcast(counters), Seq("r", "b"))
          .groupBy(col("w")).agg(min(col("cnt")).as("cms_est"))
          .crossJoin(broadcast(thr))
          .where(col("cms_est") >= col("thr"))
        // pass 2b: exact-count ONLY the survivors (semijoin keeps the
        // corpus pass a broadcast filter + groupBy over few keys)
        toks.join(broadcast(survivors.select("w", "cms_est", "thr")), Seq("w"))
          .groupBy(col("w"), col("cms_est"), col("thr"))
          .agg(count(lit(1)).as("exact_cnt"))
          .where(col("exact_cnt") >= col("thr"))
          .select(col("w").as("token"), col("exact_cnt"), col("cms_est"))
          .orderBy(col("exact_cnt").desc, col("token"))
      },
      Some(s"""WITH tok AS (
        |  SELECT w FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) > 0),
        |thr AS (SELECT (count(*) // 200)::BIGINT AS thr FROM tok),
        |h AS (
        |  SELECT w, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h
        |  FROM tok),
        |pairs AS (
        |  SELECT r.r, (h.h >> (15 * r.r)) & ${W - 1} AS b
        |  FROM h CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r) r),
        |counters AS (
        |  SELECT r, b, count(*)::BIGINT AS cnt FROM pairs GROUP BY 1, 2),
        |probe AS (
        |  SELECT d.w, r.r,
        |    (('0x' || substr(md5(d.w), 1, 15))::BIGINT >> (15 * r.r))
        |      & ${W - 1} AS b
        |  FROM (SELECT DISTINCT w FROM tok) d
        |  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r) r),
        |est AS (
        |  SELECT p.w, min(c.cnt)::BIGINT AS cms_est
        |  FROM probe p JOIN counters c ON c.r = p.r AND c.b = p.b
        |  GROUP BY 1),
        |surv AS (
        |  SELECT e.w, e.cms_est, t.thr FROM est e CROSS JOIN thr t
        |  WHERE e.cms_est >= t.thr)
        |SELECT s.w AS token, count(*)::BIGINT AS exact_cnt, s.cms_est
        |FROM tok k JOIN surv s ON s.w = k.w
        |GROUP BY 1, s.cms_est, s.thr
        |HAVING count(*) >= s.thr
        |ORDER BY exact_cnt DESC, token""".stripMargin),
      "Lossless two-pass heavy hitters: probe every distinct token " +
        "against the broadcast CMS (min over rows never " +
        "underestimates, so the filter provably keeps every true " +
        "heavy hitter), then exact-count only the survivors and " +
        "apply the threshold exactly.  At 100 TB this replaces the " +
        "corpus-wide exact token groupBy (billions of groups) with a " +
        "4096-group sketch pass plus a broadcast-semijoin count over " +
        "the handful of candidates; the 0.5%-of-stream threshold is " +
        "integer and scale-robust.  CmsSketchSpec pins the " +
        "no-false-negative property and that survivors match the " +
        "direct exact computation."),
  )
}
