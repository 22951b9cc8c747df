package graft

import org.apache.spark.sql.functions._

/** Batch-52 invariants: driver replays of the Q13/Q17/Q21/Q22 shapes
  * and conservation laws for the Q7/Q8/Q9 rollups. */
class Curation52Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  // o_orderdate as epoch micros (UTC) — fixture timestamps surface as
  // LocalDateTime under the NTZ mapping, so extract micros in-plan
  private lazy val orders: Seq[(Long, Long, String, Long, String)] =
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        expr("unix_micros(cast(o_orderdate AS timestamp))"),
        col("o_orderpriority")).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getString(4)))

  test("tpch_q13_customer_distribution: replay, customers conserved") {
    val custs = Tables.customer(spark, sfDir)
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val perCust = orders.filter(_._5 != "1-URGENT").groupBy(_._2)
      .view.mapValues(_.size.toLong).toMap
    val expected = custs.map(c => perCust.getOrElse(c, 0L))
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }.toSet
    val got = byName("tpch_q13_customer_distribution").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
    // every customer lands in exactly one bucket
    assert(got.toSeq.map(_._2).sum === custs.length.toLong)
  }

  test("tpch_q17_small_quantity: exact replay") {
    val pa = Tables.part(spark, sfDir)
      .filter(col("p_brand") === "Brand#13" && col("p_size") < 10)
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .collect().toSeq
      .map(r => (r.getLong(0), math.floor(r.getDouble(1)).toLong,
        math.floor(r.getDouble(2) * 100).toLong))
      .filter(l => pa(l._1))
    val stats = li.groupBy(_._1).view
      .mapValues(ls => (ls.map(_._2).sum, ls.size.toLong)).toMap
    val kept = li.filter { case (p, q, _) =>
      val (sumq, cnt) = stats(p); q * 5 * cnt < sumq
    }
    val expected = kept.map(_._3).sum / 7
    val got = byName("tpch_q17_small_quantity").collect().head.getLong(0)
    assert(got === expected)
  }

  test("tpch_q21_waiting_supplier: replay of the sole-late-supplier " +
    "aggregate") {
    val finished = orders.filter(_._3 == "F")
      .map(o => o._1 -> o._4).toMap
    val dayUs = 86400000000L
    val l = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"),
        expr("unix_micros(cast(l_shipdate AS timestamp))"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(x => finished.contains(x._1))
    val perOrder = l.groupBy(_._1).values.flatMap { ls =>
      val od = finished(ls.head._1)
      val supp = ls.map(_._2).distinct
      val late = ls.filter(x => x._3 > od + 60 * dayUs).map(_._2).distinct
      if (supp.size > 1 && late.size == 1) Some(late.head) else None
    }
    val names = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_name")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val expected = perOrder.groupBy(identity)
      .map { case (sk, xs) => (names(sk), xs.size.toLong) }.toSeq
      .sortBy { case (n, w) => (-w, n) }.take(10)
    val got = byName("tpch_q21_waiting_supplier").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("tpch_q22_sales_opportunity: replay of the rich-inactive gate") {
    val cutoff = java.time.Instant.parse("2000-01-01T00:00:00Z")
      .toEpochMilli * 1000L
    val activeCust = orders.filter(_._4 >= cutoff).map(_._2).toSet
    val custs = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val pos = custs.filter(_._3 > 0)
    val avgE2 = pos.map(c => math.floor(c._3 * 100).toLong).sum / pos.size
    val expected = custs
      .map(c => (c._1, (c._2 % 5).toLong, math.floor(c._3 * 100).toLong))
      .filter(c => Set(0L, 1L, 2L, 3L)(c._2) && c._3 > avgE2 &&
        !activeCust(c._1))
      .groupBy(_._2)
      .map { case (code, cs) =>
        (code, cs.size.toLong, cs.map(_._3).sum)
      }.toSet
    val got = byName("tpch_q22_sales_opportunity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("q7/q8/q9 rollups: conservation and bounds") {
    val q7 = byName("tpch_q7_volume_shipping").collect()
    assert(q7.nonEmpty && q7.length <= 4) // 2 directions x 2 ship years
    q7.foreach { r =>
      assert(r.getString(0) != r.getString(1))
      assert(r.getLong(3) > 0)
    }
    val q8 = byName("tpch_q8_market_share").collect()
    assert(q8.nonEmpty)
    q8.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2)) // nation slice <= total
      val share = r.getLong(3)
      assert(share >= 0 && share <= 1000)
      assert(share === r.getLong(1) * 1000 / r.getLong(2))
    }
    val q9 = byName("tpch_q9_profit_rollup").collect()
    assert(q9.nonEmpty)
    // every (nation, year) key is unique
    val keys = q9.map(r => (r.getString(0), r.getLong(1)))
    assert(keys.distinct.length === keys.length)
  }
}
