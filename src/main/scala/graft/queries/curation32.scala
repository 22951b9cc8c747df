package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 26: star-schema analytics depth on the TPC-H-ish tables —
  * shipping-priority top-k (Q3 shape), nation-pair trade flows (Q7
  * shape), per-part running inventory balances, and month-over-month
  * supplier share deltas.  All revenue arithmetic rides the lossless
  * 2-decimal fixed-point convention of tpch_q1_pricing; every dimension
  * joins broadcast, every fact-side agg combines map-side.
  */
object Curation32Queries {

  private val rev = "floor(l_extendedprice * 100)::BIGINT * " +
    "(100 - floor(l_discount * 100)::BIGINT)"

  val defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------- Q3 shape
    QueryDef(
      "tpch_q3_shipping_priority",
      (s, d) => {
        val cust = Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val ord = Tables.orders(s, d)
          .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
            col("o_orderpriority"))
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
          .select(col("l_orderkey"),
            (floor(col("l_extendedprice") * 100).cast("long") *
              (lit(100L) - floor(col("l_discount") * 100).cast("long")))
              .as("rev_e4"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority"))
          .agg(sum(col("rev_e4")).as("revenue_e4"))
          .orderBy(col("revenue_e4").desc, col("o_orderkey"))
          .limit(10)
          .select(col("o_orderkey"),
            unix_micros(col("o_orderdate").cast("timestamp"))
              .as("orderdate_us"),
            col("o_orderpriority"), col("revenue_e4"))
      },
      Some(s"""SELECT o_orderkey,
        |  epoch_us(o_orderdate::TIMESTAMP) AS orderdate_us,
        |  o_orderpriority, sum($rev)::BIGINT AS revenue_e4
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue_e4 DESC, o_orderkey LIMIT 10""".stripMargin),
      "TPC-H Q3 shipping priority: segment-filtered customers broadcast " +
        "into the orders join, date predicates pushed to both fact " +
        "scans, revenue in exact e4 fixed point, top-10 via TakeOrdered " +
        "(no global sort materializes).  The selective dimension " +
        "broadcast + pushed date range is what keeps this interactive " +
        "at 100 TB — the lineitem scan is the entire cost."),

    // -------------------------------------------------- Q7 shape
    QueryDef(
      "nation_pair_trade_flows",
      (s, d) => {
        val n1 = Tables.nation(s, d)
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, d)
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        val sup = Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))
        val ord = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"))
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"),
            (floor(col("l_extendedprice") * 100).cast("long") *
              (lit(100L) - floor(col("l_discount") * 100).cast("long")))
              .as("rev_e4"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"))
          .agg(count(lit(1)).as("n_lines"), sum(col("rev_e4")).as("volume_e4"))
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  count(*)::BIGINT AS n_lines, sum($rev)::BIGINT AS volume_e4
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON n1.n_nationkey = s_nationkey
        |JOIN nation n2 ON n2.n_nationkey = c_nationkey
        |WHERE n1.n_name <> n2.n_name
        |GROUP BY 1, 2""".stripMargin),
      "TPC-H Q7-shaped nation-pair trade flows: one fact shuffle (the " +
        "orders equi-join) with supplier/customer/nation all broadcast " +
        "— a 5-way star where only ONE join moves fact rows.  The " +
        "(supp, cust) nation matrix is the mixture-flow view of a " +
        "multi-tenant corpus: who produces, who consumes, where the " +
        "cross-border (cross-domain) volume concentrates."),

    // ------------------------------------------- running inventory
    QueryDef(
      "inventory_running_balance",
      (s, d) => {
        val w = Window.partitionBy(col("l_partkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        Tables.lineitem(s, d)
          .filter(col("l_partkey") < 50)
          .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
            col("l_shipdate"),
            floor(col("l_quantity") * 100).cast("long").as("qty_e2"))
          .withColumn("issued_e2",
            sum(col("qty_e2")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("n_issues"),
            max(col("issued_e2")).as("total_issued_e2"),
            max(when(col("issued_e2") > 100000L, 1L).otherwise(0L))
              .as("exceeded_1k"))
      },
      Some("""WITH iss AS (SELECT l_partkey,
        |    sum(floor(l_quantity * 100)::BIGINT) OVER (
        |      PARTITION BY l_partkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS issued_e2
        |  FROM lineitem WHERE l_partkey < 50)
        |SELECT l_partkey, count(*)::BIGINT AS n_issues,
        |  max(issued_e2)::BIGINT AS total_issued_e2,
        |  max(CASE WHEN issued_e2 > 100000 THEN 1 ELSE 0 END)::BIGINT
        |    AS exceeded_1k
        |FROM iss GROUP BY l_partkey""".stripMargin),
      "Per-part running issue balance over ship-date order (deterministic " +
        "tie-break on order/line), with a threshold-crossing flag — the " +
        "running-ledger window every inventory/quota system needs.  " +
        "Partitioned by part, so the window never sees more than one " +
        "part's history; the fact filter is pushed to the scan."),

    // ------------------------------------- supplier share deltas
    QueryDef(
      "supplier_share_monthly_delta",
      (s, d) => {
        val monthly = Tables.lineitem(s, d)
          .select(col("l_suppkey"),
            date_trunc("month", col("l_shipdate")).as("month"),
            (floor(col("l_extendedprice") * 100).cast("long") *
              (lit(100L) - floor(col("l_discount") * 100).cast("long")))
              .as("rev_e4"))
          .groupBy(col("l_suppkey"), col("month"))
          .agg(sum(col("rev_e4")).as("rev_e4"))
          .withColumn("share_pm", expr(
            "(1000 * rev_e4) div sum(rev_e4) over (partition by month)"))
        monthly
          .withColumn("prev_pm", lag(col("share_pm"), 1).over(
            Window.partitionBy(col("l_suppkey")).orderBy(col("month"))))
          .filter(col("prev_pm").isNotNull)
          .select(col("l_suppkey"),
            unix_micros(col("month").cast("timestamp")).as("month_us"),
            col("share_pm"), (col("share_pm") - col("prev_pm"))
              .as("delta_pm"))
      },
      Some(s"""WITH m AS (SELECT l_suppkey,
        |    date_trunc('month', l_shipdate) AS month,
        |    sum($rev)::BIGINT AS rev_e4
        |  FROM lineitem GROUP BY 1, 2),
        |sh AS (SELECT l_suppkey, month, rev_e4,
        |    ((1000 * rev_e4) // sum(rev_e4) OVER (PARTITION BY month))
        |      ::BIGINT AS share_pm
        |  FROM m),
        |lg AS (SELECT l_suppkey, month, share_pm,
        |    lag(share_pm) OVER (PARTITION BY l_suppkey ORDER BY month)
        |      AS prev_pm
        |  FROM sh)
        |SELECT l_suppkey, epoch_us(month::TIMESTAMP) AS month_us,
        |  share_pm, (share_pm - prev_pm)::BIGINT AS delta_pm
        |FROM lg WHERE prev_pm IS NOT NULL""".stripMargin),
      "Supplier market-share month-over-month deltas: monthly revenue " +
        "shares in permille (integer division against the month total) " +
        "then a lag window per supplier.  Share accounting after the " +
        "month-level pre-agg means both windows run over " +
        "suppliers x months rows — the raw fact table is touched " +
        "exactly once.  The same shape tracks per-source corpus share " +
        "drift across ingest snapshots."),
  )
}
