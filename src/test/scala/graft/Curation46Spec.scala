package graft

import org.apache.spark.sql.functions._

/** Batch-40 invariants: TWAP replay, VWAP bounds, drawdown laws,
  * backlog conservation. */
class Curation46Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("time_weighted_avg_value: exact replay for every user") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_id"),
        expr("cast(floor(value * 1000) as long)")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).flatMap { case (u, xs) =>
      val s = xs.sortBy(e => (e._2, e._3))
      val iv = s.zip(s.drop(1)).map { case (a, b) => (a._4, b._2 - a._2) }
      if (iv.isEmpty) None
      else {
        val span = iv.map(_._2).sum
        Some(u -> ((iv.length.toLong, span,
          iv.map(p => p._1 * p._2).sum / math.max(span, 1L))))
      }
    }
    val got = byName("time_weighted_avg_value").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
  }

  test("vwap_part_monthly: bounds and one-group replay") {
    val got = byName("vwap_part_monthly").collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.nonEmpty)
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"),
        expr("cast(year(l_shipdate) * 100 + month(l_shipdate) as long)"),
        expr("cast(floor(l_extendedprice * 100) as long)"),
        expr("cast(floor(l_quantity) as long)")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = li.groupBy(l => (l._1, l._2)).map { case (k, xs) =>
      val tq = xs.map(_._4).sum
      (k, (xs.length.toLong, tq,
        xs.map(x => x._3 * x._4).sum / math.max(tq, 1L)))
    }
    assert(got === expected)
    // VWAP sits inside the per-group price range
    li.groupBy(l => (l._1, l._2)).foreach { case (k, xs) =>
      val (_, _, vwap) = got(k)
      if (xs.map(_._4).sum > 0)
        assert(vwap >= xs.map(_._3).min - 1 && vwap <= xs.map(_._3).max)
    }
  }

  test("max_drawdown_daily: replay + structural laws") {
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(date_trunc('DAY', ts))").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = byName("max_drawdown_daily").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    daily.groupBy(_._1).foreach { case (et, xs) =>
      val cs = xs.sortBy(_._2).map(_._3)
      var peak = Long.MinValue; var dd = 0L
      cs.foreach { c => peak = math.max(peak, c); dd = math.max(dd, peak - c) }
      val (n, pk, mdd, perm) = got(et)
      assert(n === cs.length.toLong)
      assert(pk === cs.max)
      assert(mdd === dd, s"type $et")
      assert(perm === 1000L * dd / cs.max)
      assert(mdd <= cs.max - cs.min + math.max(0, 0)) // dd bounded by range
    }
  }

  test("order_backlog_daily: conservation and monotone accounting") {
    val got = byName("order_backlog_daily").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val nOrders = Tables.orders(spark, sfDir).count()
    val nClosed = Tables.lineitem(spark, sfDir)
      .select(countDistinct(col("l_orderkey"))).head().getLong(0)
    assert(got.map(_._2).sum === nOrders, "every order opens once")
    assert(got.map(_._3).sum === nClosed, "every lineitem order closes once")
    // backlog is the running net sum and ends at opens - closes
    var run = 0L
    got.foreach { case (_, o, c, b) =>
      run += o - c
      assert(b === run)
    }
    assert(run === nOrders - nClosed)
  }
}
