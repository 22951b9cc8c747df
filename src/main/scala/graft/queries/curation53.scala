package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 53: the last five TPC-H shapes — Q2 (correlated min over a
  * supplier-part relation), Q11 (group value vs global-fraction scalar
  * gate), Q15 (max-over-view top supplier), Q16 (NOT-IN supplier
  * exclusion + count-distinct rollup), Q20 (nested semi-join part
  * promotion).  This completes the 22/22 TPC-H plan-shape inventory.
  *
  * The fixture has no partsupp table, so the supplier-part relation is
  * DERIVED from the fact: group lineitem by (l_partkey, l_suppkey) with
  * min observed extended price (e2) as the supply-cost proxy and total
  * shipped quantity as the availqty proxy.  That derivation is itself
  * the canonical first move at 100 TB — one partial-aggregated shuffle
  * on the composite key, after which every Q2/Q11/Q16/Q20 plan operates
  * on a relation ~1000x smaller than the fact, exactly as the real
  * partsupp would.  All money stays in the engine-wide e2/e4 fixed
  * point so comparisons are integer-exact against the oracle.
  */
object Curation53Queries {

  /** Supplier-part relation derived from lineitem: the partsupp proxy.
    * One shuffle, fully partial-aggregatable (min + sum), keyed on the
    * composite (partkey, suppkey) — cardinality ~ |part| x avg-suppliers
    * -per-part, i.e. dimension-sized relative to the fact.
    */
  private def psProxy(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(
        min(floor(col("l_extendedprice") * 100).cast("long")).as("cost_e2"),
        sum(floor(col("l_quantity")).cast("long")).as("avail_qty"))

  private val psProxySql =
    """SELECT l_partkey, l_suppkey,
      |    min(floor(l_extendedprice * 100)::BIGINT) AS cost_e2,
      |    sum(floor(l_quantity)::BIGINT)::BIGINT AS avail_qty
      |  FROM lineitem GROUP BY 1, 2""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------- Q2 shape
    QueryDef(
      "tpch_q2_min_cost_supplier",
      (s, d) => {
        // Cheapest EUROPE supplier per qualifying part: the correlated
        // MIN subquery decorrelated into a per-part min over the
        // region-filtered supplier-part relation plus an equality join
        // back.  Part filter and the EUROPE supplier decoration both
        // broadcast; the partkey min-agg and the join back share one
        // key, so AQE coalesces them onto one exchange.
        val eu = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)
            .join(broadcast(Tables.region(s, d)
              .filter(col("r_name") === "EUROPE")),
              col("n_regionkey") === col("r_regionkey"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"),
            floor(col("s_acctbal") * 100).cast("long").as("bal_e2"))
        val pp = Tables.part(s, d)
          .filter(col("p_type") === "LARGE" && col("p_size") < 15)
          .select(col("p_partkey"))
        val pse = psProxy(s, d)
          .join(broadcast(pp), col("l_partkey") === col("p_partkey"))
          .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
          .select(col("p_partkey"), col("s_name"), col("n_name"),
            col("bal_e2"), col("cost_e2"))
        val mn = pse.groupBy(col("p_partkey"))
          .agg(min(col("cost_e2")).as("min_cost_e2"))
        pse.join(mn, "p_partkey")
          .filter(col("cost_e2") === col("min_cost_e2"))
          .select(col("p_partkey"), col("s_name"), col("n_name"),
            col("bal_e2"), col("cost_e2"))
          // canonical Q2 tail: top-100 by balance; the full column
          // tiebreaker makes the cut deterministic under ties
          .orderBy(col("bal_e2").desc, col("n_name"), col("s_name"),
            col("p_partkey"))
          .limit(100)
      },
      Some(s"""WITH ps AS ($psProxySql),
        |eu AS (
        |  SELECT s_suppkey, s_name, n_name,
        |    floor(s_acctbal * 100)::BIGINT AS bal_e2
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
        |pse AS (
        |  SELECT p_partkey, s_name, n_name, bal_e2, cost_e2
        |  FROM ps
        |  JOIN part ON l_partkey = p_partkey
        |    AND p_type = 'LARGE' AND p_size < 15
        |  JOIN eu ON l_suppkey = s_suppkey),
        |mn AS (SELECT p_partkey, min(cost_e2) AS min_cost_e2
        |       FROM pse GROUP BY 1)
        |SELECT pse.p_partkey, s_name, n_name, bal_e2, cost_e2
        |FROM pse JOIN mn ON pse.p_partkey = mn.p_partkey
        |  AND cost_e2 = min_cost_e2
        |ORDER BY bal_e2 DESC, n_name, s_name, pse.p_partkey
        |LIMIT 100""".stripMargin),
      "TPC-H Q2 minimum-cost supplier: the correlated MIN(ps_supplycost) " +
        "subquery decorrelates into a per-part min over the EUROPE-" +
        "filtered supplier-part relation plus an equality join back on " +
        "the same key.  Supply cost is the min observed unit-sale price " +
        "from the fact-derived partsupp proxy (fixture has no partsupp; " +
        "plan shape unchanged).  Deterministic top-100 via the full-" +
        "column tiebreaker."),

    // ------------------------------------------------------ Q11 shape
    QueryDef(
      "tpch_q11_important_stock",
      (s, d) => {
        // Parts whose NATION_3-supplied inventory value exceeds 1/1000
        // of the national total: the HAVING-over-scalar-subquery shape.
        // The national total is a 1-row broadcast gate (same move as
        // tpch_q22's average-balance gate); the fraction compare is
        // exact integer cross-multiplication, no floats.
        val n3 = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)
            .filter(col("n_name") === "NATION_3")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"))
        val v = psProxy(s, d)
          .join(broadcast(n3), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("l_partkey").as("p_partkey"))
          .agg(sum(col("cost_e2") * col("avail_qty")).as("value_e2"))
        val tot = v.agg(sum(col("value_e2")).as("tot_e2"))
        v.crossJoin(broadcast(tot))
          .filter(col("value_e2") * 1000L > col("tot_e2"))
          .select(col("p_partkey"), col("value_e2"))
      },
      Some(s"""WITH ps AS ($psProxySql),
        |v AS (
        |  SELECT l_partkey AS p_partkey,
        |    sum(cost_e2 * avail_qty)::BIGINT AS value_e2
        |  FROM ps
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |    AND n_name = 'NATION_3'
        |  GROUP BY 1),
        |t AS (SELECT sum(value_e2)::BIGINT AS tot_e2 FROM v)
        |SELECT p_partkey, value_e2 FROM v, t
        |WHERE value_e2 * 1000 > tot_e2""".stripMargin),
      "TPC-H Q11 important stock: per-part inventory value among one " +
        "nation's suppliers, kept where the group exceeds a fixed " +
        "fraction of the national total.  The scalar-subquery total " +
        "re-aggregates the already-grouped values (tiny) into a 1-row " +
        "broadcast gate, and the threshold compare is integer cross-" +
        "multiplication — the value agg is the only data-sized " +
        "shuffle beyond the shared partsupp-proxy derivation."),

    // ------------------------------------------------------ Q15 shape
    QueryDef(
      "tpch_q15_top_supplier",
      (s, d) => {
        // Supplier(s) with the maximum quarterly revenue — the
        // CREATE VIEW + WHERE total = (SELECT max(...) FROM view)
        // shape.  The view materializes once as a suppkey agg; max
        // re-aggregates the per-supplier rows (bounded) into a 1-row
        // broadcast gate; ties all surface, as canonical Q15 requires.
        val r = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .groupBy(col("l_suppkey"))
          .agg(sum(floor(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - floor(col("l_discount") * 100).cast("long")))
            .as("total_rev_e4"))
        val mx = r.agg(max(col("total_rev_e4")).as("max_rev_e4"))
        r.crossJoin(broadcast(mx))
          .filter(col("total_rev_e4") === col("max_rev_e4"))
          .join(broadcast(Tables.supplier(s, d)
            .select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_rev_e4"))
      },
      Some("""WITH r AS (
        |  SELECT l_suppkey,
        |    sum(floor(l_extendedprice * 100)::BIGINT
        |      * (100 - floor(l_discount * 100)::BIGINT))::BIGINT
        |      AS total_rev_e4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1),
        |m AS (SELECT max(total_rev_e4) AS max_rev_e4 FROM r)
        |SELECT s_suppkey, s_name, total_rev_e4
        |FROM r
        |JOIN supplier ON l_suppkey = s_suppkey
        |CROSS JOIN m
        |WHERE total_rev_e4 = max_rev_e4""".stripMargin),
      "TPC-H Q15 top supplier: quarterly revenue view as one suppkey " +
        "agg over the date-pruned fact slice, then the max-revenue " +
        "scalar subquery as a 1-row broadcast gate joined back by " +
        "equality — ties surface naturally instead of an arbitrary " +
        "limit.  One fact shuffle; everything downstream is bounded " +
        "by |supplier|."),

    // ------------------------------------------------------ Q16 shape
    QueryDef(
      "tpch_q16_supplier_relationship",
      (s, d) => {
        // How many suppliers can serve each (brand, type, size) combo,
        // excluding deprioritized parts and blacklisted suppliers —
        // the NOT IN (subquery) + count(DISTINCT) rollup.  s_comment
        // is absent, so the complaint blacklist is adapted to negative
        // account balance; the NOT IN becomes a broadcast LEFT ANTI.
        val px = Tables.part(s, d)
          .filter(col("p_brand") =!= "Brand#13" &&
            col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
          .select(col("p_partkey"), col("p_brand"), col("p_type"),
            col("p_size"))
        val blacklist = Tables.supplier(s, d)
          .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
        psProxy(s, d)
          .select(col("l_partkey"), col("l_suppkey"))
          .join(broadcast(blacklist),
            col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(broadcast(px), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      },
      Some(s"""WITH ps AS ($psProxySql)
        |SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
        |FROM ps
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin),
      "TPC-H Q16 supplier relationship: distinct-supplier counts per " +
        "(brand, type, size) after excluding a blacklist — the NOT IN " +
        "subquery becomes a broadcast LEFT ANTI join (null-safe here " +
        "by construction: the blacklist key is non-null), the part " +
        "attribute filter broadcasts, and the count-distinct rolls up " +
        "on a bounded attribute domain.  The oracle keeps the " +
        "canonical NOT IN formulation, proving the anti-join rewrite."),

    // ------------------------------------------------------ Q20 shape
    QueryDef(
      "tpch_q20_promotion_stock",
      (s, d) => {
        // EUROPE suppliers whose 1996 shipments of red parts exceeded
        // half their 1997 demand — canonical Q20's nested IN chain
        // (supplier IN partsupp-slice WHERE avail > 0.5 * shipped).
        // availqty is proxied by the pair's 1996 shipped quantity and
        // the half-of-demand compare stays integer (2*q96 > q97).
        // part filter broadcasts into the fact agg; the qualifying
        // suppkey set is dimension-sized and broadcasts into a
        // LEFT SEMI against the region-filtered supplier table.
        val rp = Tables.part(s, d)
          .filter(col("p_name").startsWith("red"))
          .select(col("p_partkey"))
        val qualifying = Tables.lineitem(s, d)
          .join(broadcast(rp), col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(
            sum(when(year(col("l_shipdate")) === 1996,
              floor(col("l_quantity")).cast("long")).otherwise(0L))
              .as("q96"),
            sum(when(year(col("l_shipdate")) === 1997,
              floor(col("l_quantity")).cast("long")).otherwise(0L))
              .as("q97"))
          .filter(col("q97") > 0L && col("q96") * 2L > col("q97"))
          .select(col("l_suppkey")).distinct()
        Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)
            .join(broadcast(Tables.region(s, d)
              .filter(col("r_name") === "EUROPE")),
              col("n_regionkey") === col("r_regionkey"))),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(qualifying),
            col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_suppkey"), col("s_name"))
      },
      Some("""WITH q AS (
        |  SELECT l_partkey, l_suppkey,
        |    sum(CASE WHEN year(l_shipdate) = 1996
        |        THEN floor(l_quantity)::BIGINT ELSE 0 END)::BIGINT AS q96,
        |    sum(CASE WHEN year(l_shipdate) = 1997
        |        THEN floor(l_quantity)::BIGINT ELSE 0 END)::BIGINT AS q97
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
        |  GROUP BY 1, 2)
        |SELECT s_suppkey, s_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM q WHERE q97 > 0 AND 2 * q96 > q97)""".stripMargin),
      "TPC-H Q20 promotion stock: suppliers who stocked more than half " +
        "of next year's demand for a part-name slice, scoped to one " +
        "region — the nested IN chain executes as a broadcast part " +
        "filter into one (partkey, suppkey) fact agg, an integer " +
        "half-compare, then the small qualifying-supplier set " +
        "broadcasts into a LEFT SEMI on the region-filtered supplier " +
        "table.  The oracle keeps the canonical IN formulation."),
  )
}
