package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Deep analytic shapes over the star schema: the multi-table join
  * pipeline, sliding-window distinct cardinality, and cross-domain
  * quantile normalization — the reporting layer a corpus-production
  * pipeline runs on top of its run ledger (the reference's sweep
  * summaries, rag_evaluation/RAG-eval-test_model.py:250-258, are
  * single-table pandas versions of these).
  */
object AnalyticsQueries {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------ star-join revenue
    QueryDef(
      "star_join_revenue",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"),
            col("l_extendedprice"), col("l_discount"))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
        val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
        val nat = Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        val reg = Tables.region(s, d)
          .filter(col("r_name") === "ASIA").select(col("r_regionkey"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(nat, col("s_nationkey") === col("n_nationkey"))
          .join(reg, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg((sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 100)) / 100.0).as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT n_name,
        |  sum(floor(l_extendedprice * (1 - l_discount) * 100)) / 100.0
        |    AS revenue,
        |  count(*)::BIGINT AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |              AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin),
      "TPC-H Q5-shaped star join: the fact table joins one mid-size " +
        "dimension (orders, sort-merge on the shared key at scale) and " +
        "four small ones (customer/supplier/nation/region, broadcast " +
        "unhinted — PlanAuditSpec pins the threshold flip). The region " +
        "filter prunes before any join, the local-supplier predicate " +
        "(c_nationkey = s_nationkey) rides the supplier join, and " +
        "revenue aggregates on the fixed-point grid so the total is " +
        "partitioning-independent. The canonical 'would this survive " +
        "100x' plan: one fact shuffle, everything else broadcast."),

    // -------------------------------------- sliding distinct cardinality
    QueryDef(
      "sliding_distinct_users",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "3 hours", "1 hour"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .select(col("window.start").as("window_start"),
          col("n_users"), col("n_events")),
      Some("""SELECT make_timestamp(((floor(epoch(ts)/3600)::BIGINT * 3600
        |   - j.j * 3600) * 1000000)::BIGINT) AS window_start,
        | count(DISTINCT user_id)::BIGINT AS n_users,
        | count(*)::BIGINT AS n_events
        |FROM events CROSS JOIN (SELECT range AS j FROM range(0, 3)) j
        |GROUP BY 1""".stripMargin),
      "Distinct-user cardinality per 3 h window sliding by 1 h: each " +
        "event replicates into the 3 windows covering it (the " +
        "explode-into-windows form Spark's window() plans), then exact " +
        "count-distinct per window. Replication factor = window/slide " +
        "is the scale knob; at 100 TB swap the exact distinct for " +
        "approx_count_distinct (HLL++ partials merge map-side, no " +
        "per-window user shuffle — bound documented in SketchSpec)."),

    // --------------------------------------- quantile normalization
    QueryDef(
      "quantile_normalize_scores",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        // within-source rank r of m via ScalableGroups — range exchange
        // on (source, n_chars, doc_id) + broadcast per-source offsets,
        // not a source-partitioned window (corpus/|source| rows per
        // task); the doc_id tiebreak makes row_number == dense index
        val bySrc = graft.operators.ScalableGroups.withGroupRank(
          docs, Seq("source"), Seq(col("n_chars"), col("doc_id")), 8,
          rankCol = "r", sizeCol = "m")
        // global order statistics via ScalableIndex (range partition +
        // per-partition offsets) — the corpus-wide sort never collapses
        // to one task; k is the 1-based dense rank in (n_chars, doc_id)
        // order
        val globalSorted = graft.operators.ScalableIndex
          .withDenseIndex(
            docs.select(col("n_chars").as("g_chars"), col("doc_id").as("g_id")),
            Seq(col("g_chars"), col("g_id")), 8, "idx")
          .select((col("idx") + 1).as("k"), col("g_chars"))
        val n = Tables.documents(s, d).count()
        bySrc
          .withColumn("k", expr(s"(r - 1) * CAST(${n - 1} AS BIGINT)" +
            " div greatest(m - 1, 1) + 1"))
          .join(globalSorted, Seq("k"))
          .select(col("doc_id"), col("source"), col("n_chars"),
            col("g_chars").as("norm_chars"))
      },
      Some("""WITH d AS (SELECT doc_id, source, n_chars FROM documents),
        |s AS (SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY n_chars, doc_id) AS r,
        |    count(*) OVER (PARTITION BY source) AS m
        |  FROM d),
        |g AS (SELECT n_chars AS g_chars,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS k
        |  FROM d),
        |kk AS (SELECT doc_id, source, n_chars,
        |    (r - 1) * ((SELECT count(*) FROM d) - 1)
        |      // greatest(m - 1, 1) + 1 AS k
        |  FROM s)
        |SELECT doc_id, source, n_chars, g_chars AS norm_chars
        |FROM kk JOIN g ON g.k = kk.k""".stripMargin),
      "Quantile normalization across domains: each document's " +
        "within-source rank maps onto the global score distribution " +
        "(rank r of m -> global order statistic at the same quantile), " +
        "so every source ends up with an identical score distribution — " +
        "the cross-domain calibration step before mixture sampling. " +
        "Integer rank arithmetic only, so the mapping is exact in both " +
        "engines. The global ranking executes as ScalableIndex (range " +
        "partition + per-partition offsets): exact order statistics " +
        "with no single-partition stage, and the per-source ranks stay " +
        "a partitioned window — the whole plan survives a 100x corpus. " +
        "The count() feeding the quantile arithmetic is a metadata-" +
        "served parquet count, not a data pass."),

    // --------------------------------------- TPC-H Q1 (fixed point)
    QueryDef(
      "tpch_q1_pricing",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .select(col("l_returnflag"), col("l_linestatus"),
          floor(col("l_quantity") * 100).cast("long").as("q2"),
          floor(col("l_extendedprice") * 100).cast("long").as("p2"),
          floor(col("l_discount") * 100).cast("long").as("d2"),
          floor(col("l_tax") * 100).cast("long").as("t2"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("count_order"),
          sum(col("q2")).as("sum_qty_e2"),
          sum(col("p2")).as("sum_base_e2"),
          sum(col("p2") * (lit(100L) - col("d2"))).as("sum_disc_e4"),
          sum(col("p2") * (lit(100L) - col("d2")) * (lit(100L) + col("t2")))
            .as("sum_charge_e6"))
        .select(col("l_returnflag"), col("l_linestatus"), col("count_order"),
          col("sum_qty_e2"), col("sum_base_e2"), col("sum_disc_e4"),
          col("sum_charge_e6"),
          expr("sum_qty_e2 div count_order").as("avg_qty_e2"),
          expr("sum_base_e2 div count_order").as("avg_price_e2")),
      Some("""WITH q AS (SELECT l_returnflag, l_linestatus,
        |    floor(l_quantity * 100)::BIGINT AS q2,
        |    floor(l_extendedprice * 100)::BIGINT AS p2,
        |    floor(l_discount * 100)::BIGINT AS d2,
        |    floor(l_tax * 100)::BIGINT AS t2
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02')
        |SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS count_order,
        |  sum(q2)::BIGINT AS sum_qty_e2, sum(p2)::BIGINT AS sum_base_e2,
        |  sum(p2 * (100 - d2))::BIGINT AS sum_disc_e4,
        |  sum(p2 * (100 - d2) * (100 + t2))::BIGINT AS sum_charge_e6,
        |  (sum(q2) // count(*))::BIGINT AS avg_qty_e2,
        |  (sum(p2) // count(*))::BIGINT AS avg_price_e2
        |FROM q GROUP BY l_returnflag, l_linestatus""".stripMargin),
      "TPC-H Q1 pricing summary in exact fixed point: quantity/price/" +
        "discount/tax are 2-decimal fixtures, so floor(x*100) is " +
        "lossless and disc_price/charge become pure integer products " +
        "(e4/e6 scales) — order-independent partial sums where the " +
        "float original is run-order-dependent. The canonical " +
        "single-shuffle scan-heavy agg: predicate pushed to the scan, " +
        "4-way map-side combine into 6 counters per (flag, status) " +
        "pair — the shape whose 100 TB cost is the scan, nothing else."),
  )
}
