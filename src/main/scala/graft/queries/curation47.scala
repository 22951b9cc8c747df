package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 41: five more canonical TPC-H shapes over the fixture star
  * schema — Q6 (scan-only predicate agg), Q12 (join + conditional
  * counts), Q14 (promo share), Q18 (having-filtered fact self-agg then
  * enrich), Q19 (OR-of-brackets join predicate).  The fixture lacks
  * l_shipmode / p_container / commit-receipt dates, so the classic
  * predicates are adapted to the columns that exist (noted per query);
  * the PLAN shapes — which is what these exercise — are the canonical
  * ones.  All money math follows the engine-wide e2/e4 fixed-point
  * convention (tpch_q1_pricing) for cross-engine hash parity.
  */
object Curation47Queries {

  private val rev4 =
    (floor(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - floor(col("l_discount") * 100).cast("long"))).as("rev_e4")
  private val rev4Sql =
    """(floor(l_extendedprice * 100)::BIGINT
      |      * (100 - floor(l_discount * 100)::BIGINT))""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------------------- Q6 shape
    QueryDef(
      "tpch_q6_forecast_revenue",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          floor(col("l_discount") * 100).cast("long").between(5, 7) &&
          col("l_quantity") < 24)
        .agg(
          sum(floor(col("l_extendedprice") * 100).cast("long") *
            floor(col("l_discount") * 100).cast("long")).as("revenue_e4"),
          count(lit(1)).as("n_items")),
      Some("""SELECT
        |  sum(floor(l_extendedprice * 100)::BIGINT
        |      * floor(l_discount * 100)::BIGINT)::BIGINT AS revenue_e4,
        |  count(*)::BIGINT AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND floor(l_discount * 100)::BIGINT BETWEEN 5 AND 7
        |  AND l_quantity < 24""".stripMargin),
      "TPC-H Q6 forecast-revenue-change: the pure scan-side query — " +
        "every predicate (date range, discount band, quantity cap) " +
        "pushes into the parquet scan, the aggregate is one global " +
        "partial+final pair, and NOTHING shuffles but 2 longs per " +
        "partition.  The canonical at-scale smoke test: wall time is " +
        "scan bandwidth or the plan is wrong."),

    // --------------------------------------------- Q12 shape
    QueryDef(
      "tpch_q12_priority_by_flag",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_returnflag"))
        val ord = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(
            sum(when(col("o_orderpriority") === "1-URGENT" ||
              col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
              .as("high_line_count"),
            sum(when(col("o_orderpriority") =!= "1-URGENT" &&
              col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
              .as("low_line_count"))
      },
      Some("""SELECT l_returnflag,
        |  sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |           THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        |  sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |           THEN 1 ELSE 0 END)::BIGINT AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag""".stripMargin),
      "TPC-H Q12 shape — conditional priority counts per shipping class " +
        "(l_returnflag stands in for the fixture's missing l_shipmode): " +
        "date filter pushed to the lineitem scan, one fact-fact shuffle " +
        "on orderkey, CASE-counting folded into the partial aggregate " +
        "so only 2 counters per (flag, partition) reach the exchange."),

    // --------------------------------------------- Q14 shape
    QueryDef(
      "tpch_q14_promo_revenue",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .select(col("l_partkey"), rev4)
        val part = Tables.part(s, d).select(col("p_partkey"), col("p_type"))
        li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO", col("rev_e4"))
              .otherwise(0L)).as("promo_rev_e4"),
            sum(col("rev_e4")).as("total_rev_e4"))
          .select(col("promo_rev_e4"), col("total_rev_e4"),
            expr("(1000 * promo_rev_e4) div total_rev_e4")
              .as("promo_permille"))
      },
      Some(s"""SELECT promo_rev_e4, total_rev_e4,
        |  (1000 * promo_rev_e4) // total_rev_e4 AS promo_permille
        |FROM (SELECT
        |  sum(CASE WHEN p_type = 'PROMO' THEN $rev4Sql ELSE 0 END)::BIGINT
        |    AS promo_rev_e4,
        |  sum($rev4Sql)::BIGINT AS total_rev_e4
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01')""".stripMargin),
      "TPC-H Q14 promo-revenue share: quarter filter to the lineitem " +
        "scan, part dimension broadcast (no fact shuffle at all — the " +
        "only exchange is the 2-counter global agg), share computed in " +
        "integer permille.  The canonical broadcast-dim shape: at " +
        "100 TB the 2000-row part table rides the task closure while " +
        "terabytes of lineitem stream past it."),

    // --------------------------------------------- Q18 shape
    QueryDef(
      "tpch_q18_large_orders",
      (s, d) => {
        val big = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
          .filter(col("total_qty") > 150L)
        val ord = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
            floor(col("o_totalprice") * 100).cast("long").as("totalprice_e2"))
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"))
        big.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_orderdate"), col("totalprice_e2"), col("total_qty"))
          .orderBy(col("totalprice_e2").desc, col("o_orderkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, o_orderkey, o_orderdate,
        |  floor(o_totalprice * 100)::BIGINT AS totalprice_e2, total_qty
        |FROM (SELECT l_orderkey, sum(l_quantity)::BIGINT AS total_qty
        |      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150)
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY totalprice_e2 DESC, o_orderkey LIMIT 20""".stripMargin),
      "TPC-H Q18 large-volume orders: the fact table aggregates " +
        "against ITSELF first (per-order quantity, partial map-side), " +
        "the >150 HAVING prunes before any join, then orders joins on " +
        "the already-shrunk key set and customer broadcasts.  Top-20 " +
        "via TakeOrdered.  The shape that teaches aggregate-then-join " +
        "ordering: joining first would shuffle every line item against " +
        "orders for nothing."),

    // --------------------------------------------- Q19 shape
    QueryDef(
      "tpch_q19_bracket_revenue",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_quantity"), rev4)
        val part = Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"), col("p_size"))
        li.join(broadcast(part), col("l_partkey") === col("p_partkey") &&
            ((col("p_brand") === "Brand#12" &&
              col("p_size").between(1, 5) &&
              col("l_quantity").between(1, 11)) ||
             (col("p_brand") === "Brand#23" &&
              col("p_size").between(1, 10) &&
              col("l_quantity").between(10, 20)) ||
             (col("p_brand") === "Brand#34" &&
              col("p_size").between(1, 15) &&
              col("l_quantity").between(20, 30))))
          .agg(coalesce(sum(col("rev_e4")), lit(0L)).as("revenue_e4"),
            count(lit(1)).as("n_items"))
      },
      Some(s"""SELECT coalesce(sum($rev4Sql), 0)::BIGINT AS revenue_e4,
        |  count(*)::BIGINT AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |        AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |        AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin),
      "TPC-H Q19 discounted-revenue brackets: the OR-of-ANDs predicate " +
        "spans both join sides, so it evaluates inside the broadcast " +
        "hash join's probe (equi-key extracted, residual condition " +
        "applied per match) — no fact shuffle, no cartesian, the " +
        "classic test that an optimizer keeps disjunctive mixed-side " +
        "predicates as join residuals instead of degrading to NLJ."),

    // --------------------------------- bucketed co-located join
    QueryDef(
      "bucketed_colocated_join",
      (s, d) => {
        // Bucketed LAYOUT built ONCE per (application, dataset) — the
        // layoutOnce pattern shared with scale.scala's clustered
        // layouts and curation56's written ANN index: the on-disk
        // bucket layout IS the fixture this query exists to read, and
        // rebuilding it on every invocation made the bench measure the
        // two table writes instead of the co-located join (measured
        // 2.2 s -> the join alone after the first build).  Table names
        // carry the APPLICATION tag plus the dataset tag (matching the
        // app-unique-path guarantee core.scala documents for
        // buildOnce): a concurrent second JVM on the same dataset
        // gets its own tables and can never delete-and-rewrite a
        // directory this app's memoized buildOnce still reads.  The
        // table DATA lands under the buildOnce scratch path (EXTERNAL
        // bucketed tables — the bucket spec lives in catalog metadata
        // either way), so the registered shutdown hook reclaims it;
        // nothing accumulates in the session warehouse across runs.
        val appTag = graft.Scratch.tag(s.sparkContext.applicationId)
        val tag = s"${appTag}_${graft.Scratch.tag(d)}"
        val liT = s"graft_li_by_orderkey_$tag"
        val ordT = s"graft_ord_by_orderkey_$tag"
        graft.Scratch.buildOnce(s, d, "bucketjoin") { p =>
          // Write both join sides bucketed (+ sorted) by the join key;
          // the bucketed scans then report HashPartitioning(orderkey,
          // 8), so the SortMergeJoin needs NO exchange and no per-task
          // sort — the join is pre-shuffled at WRITE time.  This is
          // the layout a 100 TB fact table keeps on disk so every
          // downstream orderkey join (and this one) is narrow;
          // BucketedJoinSpec asserts the zero-exchange plan with
          // broadcast disabled.
          Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_extendedprice"),
              col("l_discount"))
            .write.mode("overwrite").format("parquet")
            .option("path", s"$p/li")
            .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .saveAsTable(liT)
          Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderpriority"))
            .write.mode("overwrite").format("parquet")
            .option("path", s"$p/ord")
            .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .saveAsTable(ordT)
        }
        s.table(liT)
          .join(s.table(ordT),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(sum(floor(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - floor(col("l_discount") * 100).cast("long")))
            .as("revenue_e4"),
            count(lit(1)).as("n_items"))
      },
      Some(s"""SELECT o_orderpriority,
        |  sum($rev4Sql)::BIGINT AS revenue_e4,
        |  count(*)::BIGINT AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin),
      "Bucketed-table co-located join: both sides persisted bucketBy(8, " +
        "orderkey) + sortBy, so the SortMergeJoin consumes the on-disk " +
        "bucket layout — zero exchange, zero sort on the join itself " +
        "(the only shuffle is the 5-key priority agg).  Values are " +
        "identical to joining the raw parquet (the oracle), which is " +
        "the point: layout is a physical choice, not a semantic one."),
  )
}
