package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Corpus, QueryDef, Tables}

/** Round-4 continuation batch 6: the winnowing pair-detection stage
  * (fingerprints -> inverted index -> overlap pairs, the full MOSS
  * layout) and Neyman-optimal stratified sample allocation.
  */
object Curation12Queries {

  private val P = 2147483647L
  private val MaxBucket = 64 // same boilerplate guard as dedup_minhash_lsh

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------ winnow pairs
    QueryDef(
      "winnow_overlap_pairs",
      (s, d) => {
        val c = Corpus.withDups(s, d)
          .filter(length(col("text")) >= 11)
        // the fingerprint stream is the dominant scan-side cost (text
        // scan + winnow kernel + explode) and feeds three consumers
        // (bucket census, the capped index, per-doc sizes) — the
        // unoptimized plan re-derived it into 24 parquet scans.
        // Materialize it once — through a per-invocation SCRATCH
        // PARQUET (Scratch.materialize), not localCheckpoint: the
        // stream is corpus x fingerprints sized, and pinning it in
        // executor storage is the 100 TB anti-pattern (memory
        // starvation + unreplicated truncated lineage); `capped`
        // likewise feeds the pair self-join twice plus the size
        // table.  Same rows, one pass each, reclaimed on shutdown.
        // Scratch.spread inside the write job only: the materialize
        // input is a pure scan -> kernel -> write path (no downstream
        // exchange in that job), exactly the shape where spreading the
        // single fixture split across cores wins (winnow_fingerprints);
        // the reads below keep the parquet's own layout.
        val fps = graft.Scratch.materialize(s,
          graft.Scratch.spread(c.select(col("doc_id"), col("text")))
            .select(col("doc_id"),
              explode(graft.functions.WinnowKernel.winnowFps(col("text")))
                .as("fp")), "winfps")
        val ok = fps.groupBy(col("fp"))
          .agg(count(lit(1)).as("bn"))
          .filter(col("bn") <= MaxBucket)
          .select(col("fp"))
        // `capped` is NOT separately materialized: its three consumers
        // re-derive it from the materialized fps parquet (cheap
        // re-scans; the x/y self-join sides are identical subtrees and
        // share one exchange at runtime) — a second write job measured
        // slower than the re-scans at every scale tried.
        val capped = fps.join(ok, Seq("fp"))
        val sizes = capped.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("nf"))
        capped.as("x").join(capped.as("y"),
            col("x.fp") === col("y.fp") &&
              col("x.doc_id") < col("y.doc_id"))
          .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
          .agg(count(lit(1)).as("n_shared"))
          .join(sizes.select(col("doc_id").as("a"), col("nf").as("na")),
            Seq("a"))
          .join(sizes.select(col("doc_id").as("b"), col("nf").as("nb")),
            Seq("b"))
          // containment >= 1/2 of the smaller fingerprint set: common
          // 8-gram noise on unrelated docs stays far below this line
          .filter(col("n_shared") * 2 >= least(col("na"), col("nb")))
          .select(col("a"), col("b"), col("n_shared"),
            expr("(n_shared * 1000) div least(na, nb)")
              .as("containment_permille"))
      },
      Some(s"""WITH corpus AS (${Corpus.cte}),
        |pos AS (
        |  SELECT doc_id, text, (i.i + 1)::INT AS pos,
        |         length(text) - 7 AS npos
        |  FROM corpus, (SELECT range AS i FROM range(0, 4096)) i
        |  WHERE length(text) >= 11 AND i.i < length(text) - 7),
        |h AS (SELECT doc_id, pos, npos,
        |        (('0x' || substr(md5(substr(text, pos, 8)), 1, 8))::BIGINT
        |          % $P) AS h
        |      FROM pos),
        |fps AS (SELECT DISTINCT doc_id,
        |         min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        |        FROM h
        |        QUALIFY pos <= npos - 3),
        |ok AS (SELECT fp FROM fps GROUP BY fp
        |       HAVING count(*) <= $MaxBucket),
        |capped AS (SELECT doc_id, fp FROM fps JOIN ok USING (fp)),
        |sizes AS (SELECT doc_id, count(*)::BIGINT AS nf
        |          FROM capped GROUP BY doc_id),
        |pairs AS (SELECT x.doc_id AS a, y.doc_id AS b,
        |            count(*)::BIGINT AS n_shared
        |          FROM capped x JOIN capped y
        |            ON x.fp = y.fp AND x.doc_id < y.doc_id
        |          GROUP BY 1, 2)
        |SELECT a, b, n_shared,
        |       (n_shared * 1000) // least(sa.nf, sb.nf)
        |         AS containment_permille
        |FROM pairs JOIN sizes sa ON pairs.a = sa.doc_id
        |           JOIN sizes sb ON pairs.b = sb.doc_id
        |WHERE n_shared * 2 >= least(sa.nf, sb.nf)""".stripMargin),
      "Winnowing pair detection — the MOSS second stage: per-doc " +
        "fingerprint sets (native winnow_fps kernel) exploded into an " +
        "inverted index on fingerprint value, hot fingerprints capped " +
        "at 64 docs (boilerplate guard, mirrored in the " +
        "oracle), same-fp docs paired and kept where the shared count " +
        "reaches half the smaller fingerprint set (containment >= " +
        "500 permille) — common-phrase noise sits far below that " +
        "line. Surfaces the injected exact and 90%-prefix " +
        "near-duplicates through LOCAL overlap, no shingle-set " +
        "similarity needed. Shuffles: one on fp (index + cap), one on " +
        "the pair key — the dedup_minhash_lsh layout with winnowing's " +
        "shared-span guarantee."),

    // ------------------------------------------------ Neyman allocation
    QueryDef(
      "neyman_allocation",
      (s, d) => {
        val budget = 1000L
        val m = Tables.documents(s, d)
          .select(col("lang"),
            size(split(col("text"), " ")).cast("long").as("x"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sxx"))
          // N_h * S_h = sqrt(n*sxx - sx^2) for population sd — one
          // correctly-rounded IEEE sqrt, then fixed-pointed at e3 so
          // the normalizing sum is an exact integer (5 doubles summed
          // in partial-agg order would be order-dependent)
          .withColumn("w_e3",
            floor(sqrt((col("n_docs") * col("sxx") -
              col("sx") * col("sx")).cast("double")) * 1000)
              .cast("bigint"))
        val tot = m.agg(sum(col("w_e3")).as("tw"))
        val based = m.crossJoin(broadcast(tot))
          .withColumn("base", expr(s"($budget * w_e3) div tw"))
          .withColumn("rem", expr(s"($budget * w_e3) % tw"))
        val leftover = based.agg((lit(budget) - sum(col("base")))
          .as("left"))
        based.crossJoin(broadcast(leftover))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("rem").desc, col("lang"))))
          .select(col("lang"), col("n_docs"), col("w_e3"),
            (col("base") + when(col("rk") <= col("left"), 1L)
              .otherwise(0L)).as("alloc"))
      },
      Some("""WITH m AS (
        |  SELECT lang, count(*)::BIGINT AS n_docs,
        |         sum(len(string_split(text, ' ')))::BIGINT AS sx,
        |         sum(len(string_split(text, ' '))
        |             * len(string_split(text, ' ')))::BIGINT AS sxx
        |  FROM documents GROUP BY lang),
        |w AS (SELECT lang, n_docs,
        |        floor(sqrt((n_docs*sxx - sx*sx)::DOUBLE) * 1000)::BIGINT
        |          AS w_e3
        |      FROM m),
        |tot AS (SELECT sum(w_e3)::BIGINT AS tw FROM w),
        |based AS (SELECT lang, n_docs, w_e3,
        |    (1000 * w_e3) // tw AS base, (1000 * w_e3) % tw AS rem
        |  FROM w, tot),
        |lft AS (SELECT 1000 - sum(base)::BIGINT AS lft FROM based),
        |ranked AS (SELECT lang, n_docs, w_e3, base, rem,
        |    row_number() OVER (ORDER BY rem DESC, lang) AS rk
        |  FROM based)
        |SELECT lang, n_docs, w_e3,
        |  (base + CASE WHEN rk <= lft THEN 1 ELSE 0 END)::BIGINT AS alloc
        |FROM ranked, lft""".stripMargin),
      "Neyman-optimal stratified allocation of a 1000-doc sample " +
        "budget: n_h proportional to N_h*S_h (population sd of token " +
        "count), with largest-remainder rounding so allocations are " +
        "integers summing EXACTLY to the budget. N_h*S_h collapses to " +
        "sqrt(n*sxx - sx^2) on integer moments; weights fixed-pointed " +
        "before the normalizing sum, remainder ranking tie-broken by " +
        "lang — every step deterministic under any partitioning. The " +
        "sampling-design half of sample_stratified's execution half."),
  )
}
