package graft

import org.apache.spark.sql.functions._

/** Batch-29 invariants: sequence-mining operators replayed from the
  * collected event log. */
class Curation35Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  /** (user, event_id, type, us) sorted per user by (us, event_id). */
  private lazy val ev: Map[Long, Seq[(Long, String, Long)]] =
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1).view
      .mapValues(_.map(e => (e._2, e._3, e._4)).sortBy(e => (e._3, e._1))
        .toSeq).toMap

  test("sequential_pattern_support: first(a) < last(b) per user, exact") {
    val expected = (for {
      (_, es) <- ev.toSeq
      types = es.map(_._2).distinct
      a <- types; b <- types if a != b
      firstA = es.filter(_._2 == a).map(_._3).min
      lastB = es.filter(_._2 == b).map(_._3).max
      if firstA < lastB
    } yield (a, b)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nUsers = ev.size.toLong
    val got = byName("sequential_pattern_support").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2),
        r.getLong(3))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (p, sup) =>
      assert(got(p) === ((sup, 1000L * sup / nUsers)), s"pattern $p")
    }
  }

  test("dwell_time_transition: exact medians per transition pair") {
    val gaps = ev.values.flatMap { es =>
      es.sliding(2).collect { case Seq((_, s, t1), (_, d2, t2)) =>
        ((s, d2), (t2 - t1) / 1000000L)
      }
    }.toSeq
    val expected = gaps.groupBy(_._1).map { case (k, gs) =>
      val sorted = gs.map(_._2).sorted
      val n = sorted.length
      val m1 = sorted((n + 1) / 2 - 1)
      val m2 = sorted((n + 2) / 2 - 1)
      k -> (n.toLong, sorted.head, sorted.last, m1 + m2)
    }
    val got = byName("dwell_time_transition").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got === expected)
  }

  test("absorbing_state_audit: transitions, terminals, self-loops exact") {
    val trans = ev.values.flatMap { es =>
      es.sliding(2).collect { case Seq((_, s, _), (_, d2, _)) => (s, d2) }
    }.toSeq
    val terminals = ev.values.map(_.last._2).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = trans.groupBy(_._1).map { case (s, ts) =>
      val self = ts.count(t => t._2 == s).toLong
      s -> (ts.size.toLong, self, ts.map(_._2).distinct.size.toLong,
        terminals.getOrElse(s, 0L), 1000L * self / ts.size)
    }
    val got = byName("absorbing_state_audit").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got === expected)
    // conservation: journeys terminate exactly once each
    assert(terminals.values.sum === ev.size.toLong)
  }

  test("weekly_autocorr_strength: exact integer moments per type") {
    val rows = ev.toSeq.flatMap { case (_, es) => es }
    val days = rows.map(_._3 / 86400000000L)
    val d0 = days.min
    val nd = (days.max - d0 + 1).toInt
    val types = rows.map(_._2).distinct
    val series = types.map { t =>
      t -> (0 until nd).map(i =>
        rows.count(r => r._2 == t && r._3 / 86400000000L - d0 == i).toLong)
    }.toMap
    val got = byName("weekly_autocorr_strength").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet === types.toSet)
    series.foreach { case (t, cs) =>
      val pairs = (7 until cs.length).map(i => (cs(i), cs(i - 7)))
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      assert(got(t) === ((n, n * sxy - sx * sy, n * sxx - sx * sx,
        n * syy - sy * sy)), s"type $t moments")
    }
  }
}
