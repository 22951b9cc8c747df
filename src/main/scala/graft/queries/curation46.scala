package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 40: interval-weighted aggregation — time-weighted averages,
  * volume-weighted prices, running-peak drawdown, and an event-sourced
  * backlog curve.  Each is a classic ops/finance readout whose exact
  * form is one window pass plus integer arithmetic.
  */
object Curation46Queries {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------- time-weighted average
    QueryDef(
      "time_weighted_avg_value",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            floor(col("value") * 1000).cast("long").as("v_e3"))
          .withColumn("w_us",
            unix_micros(lead(col("ts"), 1).over(w)) -
              unix_micros(col("ts")))
          .filter(col("w_us").isNotNull)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_intervals"),
            sum(col("w_us")).as("span_us"),
            sum(col("v_e3") * col("w_us")).as("vw"))
          .select(col("user_id"), col("n_intervals"), col("span_us"),
            expr("vw div greatest(span_us, 1)").as("twap_e3"))
      },
      Some("""WITH iv AS (SELECT user_id,
        |    floor(value * 1000)::BIGINT AS v_e3,
        |    epoch_us(lead(ts::TIMESTAMP) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id))
        |      - epoch_us(ts::TIMESTAMP) AS w_us
        |  FROM events)
        |SELECT user_id, count(*)::BIGINT AS n_intervals,
        |  sum(w_us)::BIGINT AS span_us,
        |  (sum(v_e3 * w_us) // greatest(sum(w_us), 1))::BIGINT
        |    AS twap_e3
        |FROM iv WHERE w_us IS NOT NULL GROUP BY user_id""".stripMargin),
      "Time-weighted average value per user: each event's value is " +
        "held until the next event and weighted by that holding " +
        "duration (the step-function integral / elapsed time) — the " +
        "correct mean for irregularly sampled series, where the plain " +
        "mean over-weights bursts.  Weights are exact microsecond " +
        "integers from one lead window on the user partitioning, " +
        "values are floored to the e3 grid, so the weighted mean is " +
        "order-independent integer arithmetic — reduce-order-safe on " +
        "any cluster layout."),

    // ------------------------------------ volume-weighted price
    QueryDef(
      "vwap_part_monthly",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_partkey"),
          (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
            .cast("long").as("yyyymm"),
          floor(col("l_extendedprice") * 100).cast("long").as("p_e2"),
          floor(col("l_quantity")).cast("long").as("qty"))
        .groupBy(col("l_partkey"), col("yyyymm"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("qty")).as("total_qty"),
          sum(col("p_e2") * col("qty")).as("pq"))
        .select(col("l_partkey"), col("yyyymm"), col("n_lines"),
          col("total_qty"),
          expr("pq div greatest(total_qty, 1)").as("vwap_e2")),
      Some("""SELECT l_partkey,
        |  (year(l_shipdate) * 100 + month(l_shipdate))::BIGINT AS yyyymm,
        |  count(*)::BIGINT AS n_lines,
        |  sum(floor(l_quantity)::BIGINT)::BIGINT AS total_qty,
        |  (sum(floor(l_extendedprice * 100)::BIGINT
        |       * floor(l_quantity)::BIGINT)
        |   // greatest(sum(floor(l_quantity)::BIGINT), 1))::BIGINT
        |    AS vwap_e2
        |FROM lineitem GROUP BY 1, 2""".stripMargin),
      "Volume-weighted average price per part per ship month: " +
        "sum(price x qty) / sum(qty) in exact cents — the fair unit " +
        "price when line sizes vary (a plain AVG over lines " +
        "over-weights small orders).  One partial-aggregatable " +
        "grouped agg; year/month come from engine date parts (no " +
        "locale-sensitive week logic), quantities and prices are " +
        "floored to their natural grids, and the single division per " +
        "group happens after the exact integer sums."),

    // ------------------------------------- max drawdown of volume
    QueryDef(
      "max_drawdown_daily",
      (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        val daily = Tables.events(s, d)
          .select(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("c"))
        daily
          .withColumn("peak", max(col("c")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("dd", col("peak") - col("c"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            max(col("c")).as("peak_volume"),
            max(col("dd")).as("max_drawdown"))
          .withColumn("dd_permille",
            expr("(1000 * max_drawdown) div peak_volume"))
      },
      Some("""WITH daily AS (SELECT event_type,
        |    date_trunc('day', ts) AS day, count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2),
        |dd AS (SELECT event_type, c,
        |    max(c) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      ::BIGINT AS peak
        |  FROM daily)
        |SELECT event_type, count(*)::BIGINT AS n_days,
        |  max(c)::BIGINT AS peak_volume,
        |  max(peak - c)::BIGINT AS max_drawdown,
        |  ((1000 * max(peak - c)) // max(c))::BIGINT AS dd_permille
        |FROM dd GROUP BY event_type""".stripMargin),
      "Maximum drawdown of each type's daily volume: largest drop " +
        "from a running peak — the order-sensitive decline metric a " +
        "plain min/max cannot express (a series can hit its minimum " +
        "BEFORE its maximum; drawdown only counts declines from " +
        "already-seen peaks).  One running-max window over the daily " +
        "reduction plus a grouped max; note global max(c) equals the " +
        "final running peak, so dd_permille's denominator is the " +
        "all-time peak by construction."),

    // --------------------------------------- order backlog curve
    QueryDef(
      "order_backlog_daily",
      (s, d) => {
        val opens = Tables.orders(s, d)
          .select(date_trunc("DAY", col("o_orderdate")).as("day"),
            lit(1L).as("delta"))
        val closes = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(max(col("l_shipdate")).as("last_ship"))
          .select(date_trunc("DAY", col("last_ship")).as("day"),
            lit(-1L).as("delta"))
        opens.unionByName(closes)
          .groupBy(col("day"))
          .agg(sum(when(col("delta") === 1L, 1L).otherwise(0L))
            .as("n_opened"),
            sum(when(col("delta") === -1L, 1L).otherwise(0L))
              .as("n_closed"))
          .withColumn("backlog",
            sum(col("n_opened") - col("n_closed")).over(
              Window.orderBy(col("day"))
                .rowsBetween(Window.unboundedPreceding, 0)))
          .select(unix_micros(col("day").cast("timestamp")).as("day_us"),
            col("n_opened"), col("n_closed"), col("backlog"))
      },
      Some("""WITH ev AS (
        |  SELECT date_trunc('day', o_orderdate) AS day, 1::BIGINT
        |    AS delta FROM orders
        |  UNION ALL
        |  SELECT date_trunc('day', last_ship) AS day, -1::BIGINT
        |  FROM (SELECT l_orderkey, max(l_shipdate) AS last_ship
        |        FROM lineitem GROUP BY 1)),
        |daily AS (SELECT day,
        |    sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END)::BIGINT
        |      AS n_opened,
        |    sum(CASE WHEN delta = -1 THEN 1 ELSE 0 END)::BIGINT
        |      AS n_closed
        |  FROM ev GROUP BY day)
        |SELECT epoch_us(day::TIMESTAMP) AS day_us, n_opened, n_closed,
        |  sum(n_opened - n_closed) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |    AS backlog
        |FROM daily""".stripMargin),
      "Event-sourced order-backlog curve: +1 on order placement, -1 " +
        "when the order's LAST line item ships (completion), daily " +
        "net deltas, then one cumulative sum — open orders in flight " +
        "per day, the queue-depth series capacity planning reads " +
        "(inventory_running_balance's sibling at order granularity; " +
        "orders with no line items simply never close).  The heavy " +
        "work is two distributed aggs; the cumulative pass runs over " +
        "the tiny day spine, with the range-partitioned two-phase " +
        "cumsum as the documented path if the spine were ever large."),
  )
}
