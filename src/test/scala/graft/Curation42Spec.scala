package graft

import org.apache.spark.sql.functions._

/** Batch-36 invariants: stickiness bounds + exact recompute, runs-test
  * laws, RNN symmetry, session-basket accounting. */
class Curation42Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  private lazy val activeDays: Array[(Long, Long)] =
    Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr("unix_micros(date_trunc('DAY', ts))")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))

  test("stickiness_dau_wau: exact recompute, DAU <= WAU") {
    val dayUs = 86400000000L
    val got = byName("stickiness_dau_wau").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val days = activeDays.map(_._2).distinct
    assert(got.keySet === days.toSet)
    days.foreach { d =>
      val dau = activeDays.count(_._2 == d).toLong
      val wau = activeDays.filter(a => a._2 <= d && a._2 > d - 7 * dayUs)
        .map(_._1).distinct.length.toLong
      val (gd, gw, st) = got(d)
      assert(gd === dau, s"day $d dau")
      assert(gw === wau, s"day $d wau")
      assert(st === 1000L * dau / wau)
      assert(dau <= wau && st <= 1000L)
    }
  }

  test("runs_test_randomness: run-count laws and exact recompute") {
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(date_trunc('DAY', ts))").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = byName("runs_test_randomness").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    daily.groupBy(_._1).foreach { case (et, xs) =>
      val cs = xs.sortBy(_._2).map(_._3)
      val signs = cs.zip(cs.drop(1)).map { case (a, b) => b - a }
        .filter(_ != 0).map(x => if (x > 0) 1L else -1L)
      if (signs.nonEmpty) {
        val runs = 1L + signs.zip(signs.drop(1)).count {
          case (a, b) => a != b }
        val (nObs, nUp, nDown, nRuns, exp) = got(et)
        assert(nObs === signs.length.toLong)
        assert(nUp === signs.count(_ == 1).toLong)
        assert(nDown === signs.count(_ == -1).toLong)
        assert(nRuns === runs, s"type $et")
        assert(nRuns >= 1 && nRuns <= nObs)
        assert(exp === 1000L + 2000L * nUp * nDown / (nUp + nDown))
      }
    }
  }

  test("reciprocal_nn_pairs: symmetric subset of the edge list") {
    val edges = graft.queries.GraphQueries.knnEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = byName("reciprocal_nn_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    got.foreach { case (a, b) =>
      assert(a < b)
      assert(edges((a, b)) && edges((b, a)), s"pair ($a,$b) not mutual")
    }
    // completeness: every mutual edge pair appears
    val expected = edges.filter { case (a, b) => a < b && edges((b, a)) }
    assert(got.toSet === expected)
  }

  test("session_type_cooccurrence: support bounds and pair ordering") {
    val got = byName("session_type_cooccurrence").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (a, b, n, sup) =>
      assert(a < b, s"pair ($a,$b) not ordered")
      assert(n >= 1)
      assert(sup >= 0 && sup <= 1000)
    }
    // symmetric duplicates are impossible
    val keys = got.map(g => (g._1, g._2))
    assert(keys.distinct.length === keys.length)
    // a pair's session count cannot exceed the count of either type's
    // session appearances (monotone containment law), checked via a
    // singles recompute
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val singles = Tables.events(spark, sfDir)
      .withColumn("gap", expr(
        "unix_micros(ts) - unix_micros(lag(ts, 1) over " +
          "(partition by user_id order by ts, event_id))"))
      .withColumn("brk",
        when(col("gap").isNull || col("gap") > 600000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .select(col("user_id"), col("sid"), col("event_type")).distinct()
      .groupBy(col("event_type")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (a, b, n, _) =>
      assert(n <= singles(a) && n <= singles(b), s"pair ($a,$b)")
    }
  }
}
