package graft

import org.apache.spark.sql.functions._

/** Batch-30 invariants: growth analytics replayed from collected events. */
class Curation36Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  private lazy val ev: Array[(Long, Long)] =
    Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))

  test("power_user_curve: exact histogram and survival curve") {
    val perUser = ev.distinct.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.length.toLong).toMap
    val hist = perUser.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val total = perUser.size.toLong
    val got = byName("power_user_curve").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet === hist.keySet)
    hist.foreach { case (days, users) =>
      val cum = hist.filter(_._1 >= days).values.sum
      assert(got(days) === ((users, 1000L * cum / total)),
        s"$days active days")
    }
  }

  test("lorenz_user_concentration: decile shares sum to totality") {
    val perUser = Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val evTotal = perUser.map(_._2).sum
    val n = perUser.length
    val ranked = perUser.sortBy(p => (-p._2, p._1)).zipWithIndex
      .map { case ((_, c), i) => (i.toLong * 10 / n + 1, c) }
    val expected = ranked.groupBy(_._1).map { case (dec, vs) =>
      dec -> (vs.length.toLong, vs.map(_._2).sum)
    }
    val got = byName("lorenz_user_concentration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSet === expected.keySet)
    var cum = 0L
    got.sortBy(_._1).foreach { case (dec, nu, share, cumShare) =>
      val (en, eev) = expected(dec)
      cum += eev
      assert(nu === en, s"decile $dec users")
      assert(share === 1000L * eev / evTotal, s"decile $dec share")
      assert(cumShare === 1000L * cum / evTotal, s"decile $dec cum")
    }
    assert(got.map(_._2).sum === n.toLong)
    // per-USER volume dominance across deciles (cross-multiplied exact;
    // raw shares need not be monotone when decile sizes are unequal)
    val perDec = got.sortBy(_._1)
      .map(r => (expected(r._1)._2, expected(r._1)._1))
    perDec.sliding(2).foreach {
      case Array((ev1, n1), (ev2, n2)) =>
        assert(ev1 * n2 >= ev2 * n1, "Lorenz per-user volume not ordered")
      case _ =>
    }
  }

  test("new_vs_returning_daily: exact split, conservation of users") {
    val ud = ev.distinct
    val firstDay = ud.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = ud.groupBy(_._2).map { case (day, us) =>
      val newU = us.count(u => firstDay(u._1) == day).toLong
      day -> (us.length.toLong, newU)
    }
    val got = byName("new_vs_returning_daily").collect()
      .map(r => r.getLong(0) / 86400000000L -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (day, (active, newU)) =>
      val (ga, gn, gr, pm) = got(day)
      assert((ga, gn, gr) === ((active, newU, active - newU)), s"day $day")
      assert(pm === 1000L * newU / active)
    }
    // every user is new exactly once
    assert(got.values.map(_._2).sum === firstDay.size.toLong)
  }

  test("anomaly_dow_baseline: exact weekday medians and flag laws") {
    val daily = ev.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val d0 = ev.map(_._2).min
    val nd = (ev.map(_._2).max - d0 + 1).toInt
    val counts = (0 until nd).map(i => daily.getOrElse(d0 + i, 0L))
    val got = byName("anomaly_dow_baseline").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got.size === nd)
    (0 until 7).foreach { dow =>
      val vals = (dow until nd by 7).map(counts(_)).sorted
      if (vals.nonEmpty) {
        val m2 = vals((vals.length + 1) / 2 - 1) +
          vals((vals.length + 2) / 2 - 1)
        (dow until nd by 7).foreach { di =>
          val (gdow, cnt, med, hi, lo) = got(di.toLong)
          assert(gdow === dow.toLong)
          assert(cnt === counts(di), s"day $di count")
          assert(med === m2, s"day $di median_x2")
          assert(hi === (if (cnt * 4 > m2 * 3) 1L else 0L), s"day $di high")
          assert(lo === (if (cnt * 4 < m2) 1L else 0L), s"day $di low")
        }
      }
    }
  }
}
