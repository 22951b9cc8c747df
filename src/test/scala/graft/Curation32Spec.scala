package graft

import org.apache.spark.sql.functions._

/** Batch-26 invariants: replay the star-schema analytics from collected
  * fixture rows with exact fixed-point arithmetic. */
class Curation32Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  private def e2(x: Double): Long = math.floor(x * 100).toLong

  private lazy val lineitem = Tables.lineitem(spark, sfDir)
    .select(col("l_orderkey"), col("l_suppkey"), col("l_partkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"),
      unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
      r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getLong(7)))

  test("tpch_q3_shipping_priority: exact top-10 replay") {
    val cutoff = java.time.Instant.parse("1995-03-15T00:00:00Z")
      .toEpochMilli * 1000L
    val building = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"),
        col("o_orderpriority")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    val rev = lineitem.filter(_._8 > cutoff)
      .flatMap { li =>
        orders.get(li._1).collect {
          case (ck, od, pri) if building(ck) && od < cutoff =>
            (li._1, od, pri, e2(li._6) * (100L - e2(li._7)))
        }
      }
      .groupBy(t => (t._1, t._2, t._3)).view
      .mapValues(_.map(_._4).sum).toSeq
      .map { case ((ok, od, pri), r) => (ok, od, pri, r) }
      .sortBy(t => (-t._4, t._1)).take(10)
    val got = byName("tpch_q3_shipping_priority").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === rev)
  }

  test("nation_pair_trade_flows: symmetric coverage, exact total") {
    val got = byName("nation_pair_trade_flows").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2),
        r.getLong(3))).toMap
    got.keys.foreach { case (a, b) => assert(a != b, "self-pair leaked") }
    // conservation: total lines across pairs == lines whose supp/cust
    // nations differ (recomputed)
    val nation = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val suppNat = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey")).collect()
      .map(r => r.getLong(0) -> nation(r.getInt(1))).toMap
    val custNat = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => r.getLong(0) -> nation(r.getInt(1))).toMap
    val orderCust = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = lineitem.map { li =>
      (suppNat(li._2), custNat(orderCust(li._1)),
        e2(li._6) * (100L - e2(li._7)))
    }.filter(t => t._1 != t._2)
      .groupBy(t => (t._1, t._2)).view
      .mapValues(v => (v.length.toLong, v.map(_._3).sum)).toMap
    assert(got === expected)
  }

  test("inventory_running_balance: exact per-part ledger replay") {
    val got = byName("inventory_running_balance").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val byPart = lineitem.filter(_._3 < 50).groupBy(_._3)
    assert(got.keySet === byPart.keySet)
    byPart.foreach { case (p, ls) =>
      val ordered = ls.sortBy(l => (l._8, l._1, l._4))
      val running = ordered.scanLeft(0L)((acc, l) => acc + e2(l._5)).drop(1)
      assert(got(p) === ((ls.length.toLong, running.max,
        if (running.exists(_ > 100000L)) 1L else 0L)), s"part $p ledger")
    }
  }

  test("supplier_share_monthly_delta: shares and deltas recompute") {
    val monthOf = (us: Long) => {
      val ld = java.time.Instant.ofEpochMilli(us / 1000)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
      ld.withDayOfMonth(1)
    }
    val monthly = lineitem
      .map(l => ((l._2, monthOf(l._8)), e2(l._6) * (100L - e2(l._7))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val totals = monthly.groupBy(_._1._2).view
      .mapValues(_.values.sum).toMap
    val share = monthly.map { case ((s, m), r) =>
      (s, m) -> 1000L * r / totals(m) }
    val expected = share.keys.groupBy(_._1).flatMap { case (s, ks) =>
      val ms = ks.map(_._2).toSeq.sortBy(_.toEpochDay)
      ms.sliding(2).collect { case Seq(m1, m2) =>
        (s, m2.atStartOfDay(java.time.ZoneOffset.UTC).toInstant
          .toEpochMilli * 1000L,
          share((s, m2)), share((s, m2)) - share((s, m1)))
      }
    }.toSet
    val got = byName("supplier_share_monthly_delta").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected)
  }
}
