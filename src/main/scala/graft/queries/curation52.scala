package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 52: the remaining canonical TPC-H plan shapes — Q7 (two-nation
  * volume), Q8 (market share), Q9 (profit rollup), Q13 (outer-join
  * distribution), Q17 (correlated per-group average), Q21 (multi-
  * existential same-fact), Q22 (anti-join + global scalar gate).  The
  * fixture lacks partsupp, o_comment, c_phone, l_receiptdate/
  * l_commitdate and p_container, so those predicates are adapted to
  * columns that exist (noted per query); the PLAN shapes — which is
  * what these exercise — are the canonical ones.  Money follows the
  * engine-wide e2/e4 fixed-point convention (tpch_q1_pricing).
  */
object Curation52Queries {

  private val rev4 =
    (floor(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - floor(col("l_discount") * 100).cast("long"))).as("rev_e4")
  private val rev4Sql =
    """(floor(l_extendedprice * 100)::BIGINT
      |      * (100 - floor(l_discount * 100)::BIGINT))""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------- Q7 shape
    QueryDef(
      "tpch_q7_volume_shipping",
      (s, d) => {
        // Revenue shipped between a nation pair, both directions, by
        // ship year.  Supplier->nation and customer->nation chains ride
        // broadcasts; the only data-sized shuffle is lineitem x orders
        // on orderkey — the Q7 ideal (one fact pass).
        val pair = Tables.nation(s, d)
          .filter(col("n_name").isin("NATION_12", "NATION_13"))
        val sn = Tables.supplier(s, d)
          .join(broadcast(pair), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val cn = Tables.customer(s, d)
          .join(broadcast(pair), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_suppkey"),
            year(col("l_shipdate")).cast("long").as("l_year"), rev4)
          .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
          .agg(sum(col("rev_e4")).as("revenue_e4"))
      },
      Some(s"""SELECT supp_nation, cust_nation, l_year,
        |  sum(rev_e4)::BIGINT AS revenue_e4
        |FROM (
        |  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
        |    year(l_shipdate)::BIGINT AS l_year, $rev4Sql AS rev_e4
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ns ON s_nationkey = ns.n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation nc ON c_nationkey = nc.n_nationkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |    AND ns.n_name IN ('NATION_12', 'NATION_13')
        |    AND nc.n_name IN ('NATION_12', 'NATION_13')
        |    AND ns.n_name <> nc.n_name)
        |GROUP BY 1, 2, 3""".stripMargin),
      "TPC-H Q7 volume shipping: nation-pair revenue by ship year, " +
        "both directions.  Both nation chains fold into broadcast " +
        "semi-filters on the fact scan sides; the single shuffle is " +
        "lineitem x orders on orderkey.  Exact e4 revenue."),

    // ------------------------------------------------------- Q8 shape
    QueryDef(
      "tpch_q8_market_share",
      (s, d) => {
        // Market share of NATION_3 suppliers in ASIA-customer PROMO-part
        // revenue, per order year, in exact permille.  part (filtered),
        // customer->nation->region, supplier->nation all broadcast; the
        // one shuffle is lineitem x orders.
        val asiaCust = Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)
            .join(broadcast(Tables.region(s, d)
              .filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"))
        val suppN = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)
            .filter(col("p_type") === "PROMO").select(col("p_partkey"))),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey"), col("l_suppkey"), rev4)
          .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
            .select(col("o_orderkey"), col("o_custkey"),
              year(col("o_orderdate")).cast("long").as("o_year")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("o_year"))
          .agg(
            sum(when(col("supp_nation") === "NATION_3", col("rev_e4"))
              .otherwise(0L)).as("nation_rev_e4"),
            sum(col("rev_e4")).as("total_rev_e4"))
          .select(col("o_year"), col("nation_rev_e4"), col("total_rev_e4"),
            expr("nation_rev_e4 * 1000 div total_rev_e4")
              .as("mkt_share_permille"))
      },
      Some(s"""WITH base AS (
        |  SELECT year(o_orderdate)::BIGINT AS o_year,
        |    ns.n_name AS supp_nation, $rev4Sql AS rev_e4
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation nc ON c_nationkey = nc.n_nationkey
        |  JOIN region ON nc.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ns ON s_nationkey = ns.n_nationkey
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01')
        |SELECT o_year,
        |  sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_e4
        |      ELSE 0 END)::BIGINT AS nation_rev_e4,
        |  sum(rev_e4)::BIGINT AS total_rev_e4,
        |  sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_e4
        |      ELSE 0 END)::BIGINT * 1000
        |    // sum(rev_e4)::BIGINT AS mkt_share_permille
        |FROM base GROUP BY o_year""".stripMargin),
      "TPC-H Q8 market share: one nation's slice of region-scoped, " +
        "part-type-scoped revenue per year, exact permille.  Every " +
        "dimension chain broadcasts (part filter, ASIA customer semi-" +
        "filter, supplier nation decorate); the one shuffle is the " +
        "fact equi-join on orderkey."),

    // ------------------------------------------------------- Q9 shape
    QueryDef(
      "tpch_q9_profit_rollup",
      (s, d) => {
        // Profit by supplier nation and order year.  partsupp is not in
        // the fixture, so unit cost is proxied as 90% of p_retailprice
        // (e2, floor) — the plan shape (two broadcast dims on the fact,
        // one orderkey shuffle, nation-year rollup) is canonical Q9.
        val pc = Tables.part(s, d)
          .filter(col("p_name").contains("widget"))
          .select(col("p_partkey"),
            expr("floor(p_retailprice * 100) * 9 div 10").cast("long")
              .as("cost_e2"))
        val suppN = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("nation"))
        Tables.lineitem(s, d)
          .join(broadcast(pc), col("l_partkey") === col("p_partkey"))
          .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
          .select(col("l_orderkey"), col("nation"), rev4,
            (floor(col("l_quantity")).cast("long") * col("cost_e2") * 100L)
              .as("cost_e4"))
          .join(Tables.orders(s, d).select(col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("o_year")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("nation"), col("o_year"))
          .agg(sum(col("rev_e4") - col("cost_e4")).as("profit_e4"))
      },
      Some(s"""SELECT nation, o_year, sum(rev_e4 - cost_e4)::BIGINT
        |    AS profit_e4
        |FROM (
        |  SELECT ns.n_name AS nation,
        |    year(o_orderdate)::BIGINT AS o_year,
        |    $rev4Sql AS rev_e4,
        |    floor(l_quantity)::BIGINT
        |      * (floor(p_retailprice * 100)::BIGINT * 9 // 10) * 100
        |      AS cost_e4
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ns ON s_nationkey = ns.n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey)
        |GROUP BY nation, o_year""".stripMargin),
      "TPC-H Q9 profit rollup by supplier nation and order year " +
        "(unit cost proxied at 90% of p_retailprice — fixture has no " +
        "partsupp; plan shape unchanged).  Filtered part and supplier-" +
        "nation decorate the fact via broadcasts, orders joins on the " +
        "one orderkey shuffle, and the rollup is partial-aggregatable " +
        "on a bounded (25 x years) key space."),

    // ------------------------------------------------------ Q13 shape
    QueryDef(
      "tpch_q13_customer_distribution",
      (s, d) => {
        // Orders-per-customer histogram INCLUDING zero-order customers
        // — the LEFT OUTER + count(attr) + re-agg shape.  o_comment is
        // not in the fixture; the canonical exclusion predicate is
        // adapted to o_orderpriority <> '1-URGENT'.
        Tables.customer(s, d).select(col("c_custkey"))
          .join(Tables.orders(s, d)
            .filter(col("o_orderpriority") =!= "1-URGENT")
            .select(col("o_orderkey"), col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
      },
      Some("""SELECT c_count, count(*)::BIGINT AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin),
      "TPC-H Q13 customer distribution: LEFT OUTER join so zero-order " +
        "customers survive with count(o_orderkey) = 0, then the " +
        "histogram re-agg.  count(attr) (null-skipping), not " +
        "count(*), is the semantic crux.  First agg shuffles on " +
        "custkey, second on the bounded count domain."),

    // ------------------------------------------------------ Q17 shape
    QueryDef(
      "tpch_q17_small_quantity",
      (s, d) => {
        // Revenue (div 7, per canonical output) from lineitems whose
        // quantity is below 20% of their part's average — the
        // correlated scalar subquery decorrelated to an agg + self-
        // join.  p_container is adapted to p_size < 10; the 0.2*avg
        // compare is exact integer cross-multiplication:
        // qty < 0.2 * (sumq / cnt)  <=>  5 * qty * cnt < sumq.
        val pa = Tables.part(s, d)
          .filter(col("p_brand") === "Brand#13" && col("p_size") < 10)
          .select(col("p_partkey"))
        val li = Tables.lineitem(s, d)
          .join(broadcast(pa), col("l_partkey") === col("p_partkey"))
          .select(col("l_partkey"),
            floor(col("l_quantity")).cast("long").as("qty"),
            floor(col("l_extendedprice") * 100).cast("long").as("price_e2"))
        val stats = li.groupBy(col("l_partkey"))
          .agg(sum(col("qty")).as("sumq"), count(lit(1)).as("cnt"))
        li.join(stats, "l_partkey")
          .filter(col("qty") * 5L * col("cnt") < col("sumq"))
          .agg(expr("sum(price_e2) div 7").as("avg_yearly_e2"))
      },
      Some("""WITH li AS (
        |  SELECT l_partkey, floor(l_quantity)::BIGINT AS qty,
        |    floor(l_extendedprice * 100)::BIGINT AS price_e2
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#13' AND p_size < 10),
        |st AS (SELECT l_partkey, sum(qty)::BIGINT AS sumq,
        |    count(*)::BIGINT AS cnt FROM li GROUP BY l_partkey)
        |SELECT sum(price_e2)::BIGINT // 7 AS avg_yearly_e2
        |FROM li JOIN st USING (l_partkey)
        |WHERE li.qty * 5 * st.cnt < st.sumq""".stripMargin),
      "TPC-H Q17 small-quantity revenue: the correlated per-part " +
        "average decorrelates into one agg over the (part-filtered) " +
        "fact slice plus a same-key self-join — both sides share the " +
        "broadcast part filter, so the only shuffle is the partkey " +
        "agg/join.  The 0.2*avg threshold is exact integer cross-" +
        "multiplication; no floating compare."),

    // ------------------------------------------------------ Q21 shape
    QueryDef(
      "tpch_q21_waiting_supplier",
      (s, d) => {
        // Suppliers who were the SOLE late shipper in a multi-supplier
        // finished order.  l_receiptdate/l_commitdate are absent, so
        // "late" is adapted to shipping > 60 days after the order date.
        // The canonical EXISTS / NOT EXISTS pair over the same fact
        // collapses into one per-order aggregate: distinct suppliers,
        // distinct late suppliers, and (when unique) the late one.
        val l = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
          .join(Tables.orders(s, d)
            .filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_suppkey"),
            (col("l_shipdate") >
              col("o_orderdate") + expr("INTERVAL 60 DAYS")).as("late"))
        val perOrder = l.groupBy(col("l_orderkey"))
          .agg(countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(when(col("late"), col("l_suppkey")))
              .as("n_late_supp"),
            max(when(col("late"), col("l_suppkey"))).as("late_supp"))
        perOrder
          .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
          .groupBy(col("late_supp"))
          .agg(count(lit(1)).as("numwait"))
          .join(broadcast(Tables.supplier(s, d)
            .select(col("s_suppkey"), col("s_name"))),
            col("late_supp") === col("s_suppkey"))
          .select(col("s_name"), col("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(10)
      },
      Some("""WITH l AS (
        |  SELECT l_orderkey, l_suppkey,
        |    l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |po AS (SELECT l_orderkey,
        |    count(DISTINCT l_suppkey)::BIGINT AS n_supp,
        |    count(DISTINCT CASE WHEN late THEN l_suppkey END)::BIGINT
        |      AS n_late_supp,
        |    max(CASE WHEN late THEN l_suppkey END) AS late_supp
        |  FROM l GROUP BY l_orderkey)
        |SELECT s_name, count(*)::BIGINT AS numwait
        |FROM po JOIN supplier ON late_supp = s_suppkey
        |WHERE n_supp > 1 AND n_late_supp = 1
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin),
      "TPC-H Q21 waiting supplier: the EXISTS(other supplier) AND NOT " +
        "EXISTS(other late supplier) pair is algebraically one " +
        "per-order aggregate — distinct-supplier and distinct-late-" +
        "supplier counts with the unique late supplier surfaced by a " +
        "conditional max — so the fact is scanned ONCE instead of " +
        "three times.  One orderkey shuffle, a bounded per-supplier " +
        "re-agg, broadcast name decorate, TakeOrdered top-10."),

    // ------------------------------------------------------ Q22 shape
    QueryDef(
      "tpch_q22_sales_opportunity",
      (s, d) => {
        // Rich-but-inactive customers by country code: acctbal above
        // the global positive average (scalar subquery -> 1-row
        // broadcast gate) and no orders since 2000 (anti join; the
        // fixture has no orderless customers, so "never ordered" is
        // adapted to "not ordered this epoch" — same NOT EXISTS shape).
        // c_phone is absent, so cntrycode is adapted to c_nationkey
        // mod 5 with the canonical IN-list filter shape on the code.
        val avgBal = Tables.customer(s, d)
          .filter(col("c_acctbal") > 0)
          .agg(expr("sum(cast(floor(c_acctbal * 100) AS bigint)) " +
            "div count(1)").as("avg_e2"))
        Tables.customer(s, d)
          .select(col("c_custkey"),
            pmod(col("c_nationkey"), lit(5)).cast("long").as("cntrycode"),
            floor(col("c_acctbal") * 100).cast("long").as("bal_e2"))
          .filter(col("cntrycode").isin(0L, 1L, 2L, 3L))
          .crossJoin(broadcast(avgBal))
          .filter(col("bal_e2") > col("avg_e2"))
          .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
            .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("cntrycode"))
          .agg(count(lit(1)).as("numcust"), sum(col("bal_e2")).as("totacctbal_e2"))
      },
      Some("""WITH avgbal AS (
        |  SELECT sum(floor(c_acctbal * 100)::BIGINT)::BIGINT
        |      // count(*)::BIGINT AS avg_e2
        |  FROM customer WHERE c_acctbal > 0),
        |rich AS (
        |  SELECT c_custkey, (c_nationkey % 5)::BIGINT AS cntrycode,
        |    floor(c_acctbal * 100)::BIGINT AS bal_e2
        |  FROM customer, avgbal
        |  WHERE (c_nationkey % 5) IN (0, 1, 2, 3)
        |    AND floor(c_acctbal * 100)::BIGINT > avg_e2
        |    AND NOT EXISTS (SELECT 1 FROM orders
        |                    WHERE o_custkey = c_custkey
        |                      AND o_orderdate >= TIMESTAMP '2000-01-01'))
        |SELECT cntrycode, count(*)::BIGINT AS numcust,
        |  sum(bal_e2)::BIGINT AS totacctbal_e2
        |FROM rich GROUP BY cntrycode""".stripMargin),
      "TPC-H Q22 sales opportunity: the global-average scalar " +
        "subquery becomes a 1-row broadcast gate on the scan, the NOT " +
        "EXISTS becomes a LEFT ANTI join on custkey, and the rollup " +
        "runs on the bounded code domain.  The oracle keeps the " +
        "canonical NOT EXISTS formulation — same rows, proving the " +
        "anti-join rewrite."),
  )
}
