package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Round-4 continuation batch 13: probabilistic sketches — count-min,
  * Bloom, HyperLogLog — built as plain relational plans with literal
  * hash constants, so the sketch contents are bit-identical in Spark
  * and the DuckDB oracle.  These are the bounded-memory summaries a
  * 100 TB pipeline substitutes for exact state: the sketch build is a
  * partial-aggregatable groupBy (mergeable across executors exactly
  * like the production array-of-counters implementation), and the
  * fixture-scale queries keep the full truth side so the estimate
  * error is itself part of the checked result.
  *
  * Hash family: h_j(k) = ((a_j*k + b_j) mod p) mod w with p = 2^31-1
  * and literal (a_j, b_j) — universal enough for the fixtures and
  * exactly reproducible cross-engine (no engine-native hash functions,
  * which differ between Spark and DuckDB).
  */
object Curation19Queries {

  private val p = 2147483647L // 2^31 - 1
  private val as = Seq(1103515245L, 40503L, 265443577L)
  private val bs = Seq(12345L, 104729L, 179424673L)

  /** floor(64 * ln(64/V)) for V = 1..64 — the HLL small-range linear
    * counting table as literals (no runtime ln). */
  private val lc64 = Seq(266L, 221L, 195L, 177L, 163L, 151L, 141L, 133L,
    125L, 118L, 112L, 107L, 102L, 97L, 92L, 88L, 84L, 81L, 77L, 74L, 71L,
    68L, 65L, 62L, 60L, 57L, 55L, 52L, 50L, 48L, 46L, 44L, 42L, 40L, 38L,
    36L, 35L, 33L, 31L, 30L, 28L, 26L, 25L, 23L, 22L, 21L, 19L, 18L, 17L,
    15L, 14L, 13L, 12L, 10L, 9L, 8L, 7L, 6L, 5L, 4L, 3L, 2L, 1L, 0L)

  private def sqlList(xs: Seq[Long]) = xs.mkString("[", ", ", "]")

  val defs: Seq[QueryDef] = Seq(

    // ---------------------------------------------- count-min sketch
    QueryDef(
      "cms_heavy_hitters",
      (s, d) => {
        val w = 1024L
        val truth = Tables.lineitem(s, d)
          .groupBy(col("l_partkey").as("key"))
          .agg(count(lit(1)).as("true_cnt"))
        val hashed = truth.select(col("key"), col("true_cnt"),
          explode(array((0 until 3).map(j => struct(
            lit(j.toLong).as("j"),
            pmod(pmod(lit(as(j)) * col("key") + lit(bs(j)), lit(p)),
              lit(w)).as("bucket"))): _*)).as("h"))
          .select(col("key"), col("true_cnt"),
            col("h.j").as("j"), col("h.bucket").as("bucket"))
        val cells = hashed.groupBy(col("j"), col("bucket"))
          .agg(sum(col("true_cnt")).as("cell"))
        hashed.join(cells, Seq("j", "bucket"))
          .groupBy(col("key"), col("true_cnt"))
          .agg(min(col("cell")).as("est_cnt"))
          .orderBy(col("true_cnt").desc, col("key"))
          .limit(20)
          .select(col("key").as("part_key"), col("true_cnt"),
            col("est_cnt"), (col("est_cnt") - col("true_cnt"))
              .as("overcount"))
      },
      Some(s"""WITH truth AS (
        |  SELECT l_partkey AS key, count(*)::BIGINT AS true_cnt
        |  FROM lineitem GROUP BY l_partkey),
        |hashed AS (SELECT key, true_cnt, j.j,
        |    ((((${sqlList(as)})[j.j + 1] * key + (${sqlList(bs)})[j.j + 1])
        |      % $p) % 1024) AS bucket
        |  FROM truth, (SELECT range AS j FROM range(0, 3)) j),
        |cells AS (SELECT j, bucket, sum(true_cnt)::BIGINT AS cell
        |          FROM hashed GROUP BY j, bucket),
        |est AS (SELECT h.key, h.true_cnt, min(c.cell)::BIGINT AS est_cnt
        |        FROM hashed h JOIN cells c USING (j, bucket)
        |        GROUP BY h.key, h.true_cnt)
        |SELECT key AS part_key, true_cnt, est_cnt,
        |       (est_cnt - true_cnt)::BIGINT AS overcount
        |FROM est ORDER BY true_cnt DESC, key LIMIT 20""".stripMargin),
      "Count-min sketch (d=3, w=1024) over lineitem part keys, read " +
        "back for the top-20 true heavy hitters: est = min_j " +
        "cell[j][h_j(k)], always >= true (one-sided error). The sketch " +
        "build is one groupBy over (row, 3 hashes) — partial-" +
        "aggregatable, so executors merge local d*w counter arrays " +
        "exactly as a production CMS merges; memory is O(d*w) " +
        "regardless of key cardinality, the property that matters at " +
        "100 TB where the exact groupBy behind `truth` would be the " +
        "thing the sketch replaces. Literal hash constants keep the " +
        "cells bit-identical to the DuckDB oracle."),

    // ------------------------------------------------- Bloom filter
    QueryDef(
      "bloom_semijoin_prune",
      (s, d) => {
        val m = 4096L
        val members = Tables.lineitem(s, d)
          .filter(col("l_quantity") === 50.0)
          .select(col("l_partkey").as("key")).distinct()
        val positions = members.select(
          explode(array((0 until 3).map(j =>
            pmod(pmod(lit(as(j)) * col("key") + lit(bs(j)), lit(p)),
              lit(m))): _*)).as("pos")).distinct()
        val probe = Tables.part(s, d).select(col("p_partkey").as("key"))
        val withH = (0 until 3).foldLeft(probe) { (df, j) =>
          df.withColumn(s"h$j",
            pmod(pmod(lit(as(j)) * col("key") + lit(bs(j)), lit(p)),
              lit(m)))
        }
        val tested = (0 until 3).foldLeft(withH) { (df, j) =>
          df.join(broadcast(positions.select(col("pos").as(s"h$j"),
            lit(1L).as(s"hit$j"))), Seq(s"h$j"), "left")
        }.withColumn("pass",
          coalesce(col("hit0"), lit(0L)) + coalesce(col("hit1"), lit(0L)) +
            coalesce(col("hit2"), lit(0L)) === 3L)
        val truth = tested.join(
          broadcast(members.withColumn("is_member", lit(1L))),
          Seq("key"), "left")
        truth.agg(
          count(lit(1)).as("n_probe"),
          sum(coalesce(col("is_member"), lit(0L))).as("n_members"),
          sum(when(col("pass"), lit(1L)).otherwise(lit(0L)))
            .as("bloom_pass"),
          sum(when(col("pass") && col("is_member").isNull, lit(1L))
            .otherwise(lit(0L))).as("false_pos"),
          sum(when(!col("pass") && col("is_member") === 1L, lit(1L))
            .otherwise(lit(0L))).as("missed"))
      },
      Some(s"""WITH members AS (
        |  SELECT DISTINCT l_partkey AS key FROM lineitem
        |  WHERE l_quantity = 50),
        |positions AS (SELECT DISTINCT
        |    ((((${sqlList(as)})[j.j + 1] * key + (${sqlList(bs)})[j.j + 1])
        |      % $p) % 4096) AS pos
        |  FROM members, (SELECT range AS j FROM range(0, 3)) j),
        |probe AS (SELECT p_partkey AS key,
        |    (((${as(0)} * p_partkey + ${bs(0)}) % $p) % 4096) AS h0,
        |    (((${as(1)} * p_partkey + ${bs(1)}) % $p) % 4096) AS h1,
        |    (((${as(2)} * p_partkey + ${bs(2)}) % $p) % 4096) AS h2
        |  FROM part),
        |tested AS (SELECT key,
        |    (h0 IN (SELECT pos FROM positions)
        |     AND h1 IN (SELECT pos FROM positions)
        |     AND h2 IN (SELECT pos FROM positions)) AS pass,
        |    key IN (SELECT key FROM members) AS is_member
        |  FROM probe)
        |SELECT count(*)::BIGINT AS n_probe,
        |  sum(CASE WHEN is_member THEN 1 ELSE 0 END)::BIGINT AS n_members,
        |  sum(CASE WHEN pass THEN 1 ELSE 0 END)::BIGINT AS bloom_pass,
        |  sum(CASE WHEN pass AND NOT is_member THEN 1 ELSE 0 END)::BIGINT
        |    AS false_pos,
        |  sum(CASE WHEN NOT pass AND is_member THEN 1 ELSE 0 END)::BIGINT
        |    AS missed
        |FROM tested""".stripMargin),
      "Bloom-filter semijoin pruning (m=4096 bits, k=3): the member set " +
        "(parts with a quantity-50 line) is hashed to bit positions, " +
        "broadcast, and every probe key passes iff all three of its " +
        "positions are set; the summary row audits pass/false-positive " +
        "counts and proves zero false negatives (`missed` = 0, the " +
        "Bloom guarantee). This is runtime-filter pushdown made " +
        "explicit — at 100 TB the broadcast bit set prunes the big " +
        "probe scan before the shuffle, which is exactly what Spark's " +
        "spark.sql.optimizer.runtime.bloomFilter does for join keys; " +
        "the relational formulation keeps it oracle-checkable."),

    // --------------------------------------------------- HyperLogLog
    QueryDef(
      "hll_register_estimate",
      (s, d) => {
        val m = 64L
        val keys = Tables.orders(s, d)
          .select(col("o_custkey").as("key")).distinct()
        val hashed = keys.select(
          pmod(lit(as(0)) * col("key") + lit(bs(0)), lit(p)).as("h"))
          .select((col("h") % m).as("bucket"),
            expr("h div 64").as("rest"))
          .select(col("bucket"),
            when(col("rest") === 0, lit(26L))
              .otherwise(least(bit_count(
                expr("(rest & -rest) - 1")).cast("long") + 1L, lit(26L)))
              .as("rho"))
        val regs = hashed.groupBy(col("bucket"))
          .agg(max(col("rho")).as("mreg"))
        val spine = s.range(0, m).select(col("id").as("bucket"))
        val full = spine.join(regs, Seq("bucket"), "left")
          .select(col("bucket"), coalesce(col("mreg"), lit(0L)).as("mreg"))
        val agg = full.agg(
          sum(expr("shiftleft(1L, 30 - cast(mreg AS INT))")).as("regsum"),
          sum(when(col("mreg") === 0, lit(1L)).otherwise(lit(0L)))
            .as("v_empty"))
        val trueN = Tables.orders(s, d)
          .agg(count_distinct(col("o_custkey")).as("true_distinct"))
        agg.crossJoin(trueN)
          .withColumn("raw_est", // 709 * 64^2 * 2^30 (alpha_e3 * m^2 * scale)
            expr("3118214976372736L div (1000 * regsum)"))
          .withColumn("est",
            when(col("v_empty") > 0 && col("raw_est") < lit(5L * m / 2),
              element_at(array(lc64.map(lit): _*),
                col("v_empty").cast("int")))
              .otherwise(col("raw_est")))
          .select(lit(m).as("m"), col("v_empty"), col("raw_est"),
            col("est"), col("true_distinct"),
            expr("abs(est - true_distinct) * 1000 div true_distinct")
              .as("err_permille"))
      },
      Some(s"""WITH keys AS (SELECT DISTINCT o_custkey AS key FROM orders),
        |hashed AS (SELECT
        |    ((${as(0)} * key + ${bs(0)}) % $p) % 64 AS bucket,
        |    ((${as(0)} * key + ${bs(0)}) % $p) // 64 AS rest
        |  FROM keys),
        |rho AS (SELECT bucket,
        |    CASE WHEN rest = 0 THEN 26
        |         ELSE least(bit_count((rest & -rest) - 1) + 1, 26)
        |    END AS rho
        |  FROM hashed),
        |regs AS (SELECT s.bucket,
        |    coalesce(max(r.rho), 0)::BIGINT AS mreg
        |  FROM (SELECT range AS bucket FROM range(0, 64)) s
        |  LEFT JOIN rho r ON s.bucket = r.bucket
        |  GROUP BY s.bucket),
        |agg AS (SELECT
        |    sum((1::BIGINT << (30 - mreg)))::BIGINT AS regsum,
        |    sum(CASE WHEN mreg = 0 THEN 1 ELSE 0 END)::BIGINT AS v_empty
        |  FROM regs),
        |t AS (SELECT count(DISTINCT o_custkey)::BIGINT AS true_distinct
        |      FROM orders),
        |est0 AS (SELECT v_empty,
        |    3118214976372736 // (1000 * regsum) AS raw_est,
        |    true_distinct
        |  FROM agg, t)
        |SELECT 64::BIGINT AS m, v_empty, raw_est::BIGINT AS raw_est,
        |  (CASE WHEN v_empty > 0 AND raw_est < 160
        |        THEN (${sqlList(lc64)})[v_empty]
        |        ELSE raw_est END)::BIGINT AS est,
        |  true_distinct,
        |  (abs((CASE WHEN v_empty > 0 AND raw_est < 160
        |             THEN (${sqlList(lc64)})[v_empty]
        |             ELSE raw_est END) - true_distinct) * 1000
        |    // true_distinct)::BIGINT AS err_permille
        |FROM est0""".stripMargin),
      "HyperLogLog distinct-count (m=64 registers) over order customer " +
        "keys: register = max trailing-zero rank of the hashed key per " +
        "bucket (bit_count((rest & -rest) - 1) — no float log), " +
        "harmonic mean via an exact dyadic integer sum of 2^(30-M), " +
        "small-range linear counting from a literal 64*ln(64/V) table. " +
        "The register array is a 64-cell max-aggregate — mergeable " +
        "partial state identical to approx_count_distinct's HLL++ " +
        "internals, but with every bit oracle-checkable; the result " +
        "row carries the true count and the per-mille error so the " +
        "accuracy claim is itself part of the correctness gate."),
  )
}
