package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the behavioral-analytics operators:
  * conservation laws (event mass, gap counts), interval-union bounds,
  * and the exact endpoints of cumulative curves. */
class BehaviorSpec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("timeline_overlap_merge: event mass conserved, island bounds hold") {
    val merged = byName("timeline_overlap_merge").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val perUser = Tables.events(spark, sfDir).groupBy(col("user_id"))
      .agg(count(lit(1))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged.map(_._1).toSet == perUser.keySet)
    merged.foreach { case (u, nIv, nEv, secs) =>
      assert(nEv == perUser(u), s"user $u event mass")
      assert(nIv >= 1 && nIv <= nEv)
      // every island spans at least the 10-minute interval width and at
      // most nEv of them laid end to end
      assert(secs >= 600L * nIv, s"user $u secs=$secs islands=$nIv")
      assert(secs <= 600L * nEv)
    }
  }

  test("first_touch_attribution: one row per purchase, nonneg latency, " +
    "touch really precedes") {
    val rows = byName("first_touch_attribution").collect()
    val nPurch = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    assert(rows.length == nPurch)
    rows.foreach { r =>
      if (!r.isNullAt(2)) {
        assert(!r.isNullAt(3))
        assert(r.getLong(3) >= 0L, s"negative latency for ${r.getLong(0)}")
      } else assert(r.isNullAt(3)) // organic purchase: no touch, no latency
    }
    // at least one attributed and (in this fixture) organic purchases may
    // or may not exist; attribution rate must be nonzero given click/view
    // dominance in the event mix
    assert(rows.count(r => !r.isNullAt(2)) > 0)
  }

  test("gap_time_histogram: gap count equals events minus users") {
    val hist = byName("gap_time_histogram").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nEvents = Tables.events(spark, sfDir).count()
    val nUsers = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    assert(hist.values.sum == nEvents - nUsers)
    assert(hist.keys.forall(Set("a_under_1m", "b_1m_to_10m", "c_10m_to_1h",
      "d_1h_to_1d", "e_over_1d")))
  }

  test("decile_lift_table: users conserved, population lift ends at 1000") {
    val rows = byName("decile_lift_table").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 10L).toSeq)
    val nUsers = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_._2).sum == nUsers)
    // cumulative lift over the whole population is exactly the
    // population rate: (1000 * T * U) div (U * T) = 1000
    assert(rows.last._4 == 1000L)
    rows.foreach { case (_, n, c, _) => assert(c >= 0 && c <= n) }
  }

  test("zipf_coverage_curve: monotone coverage reaching exactly 1000") {
    val rows = byName("zipf_coverage_curve").collect()
      .map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to rows.length.toLong).toSeq)
    rows.sliding(2).foreach {
      case Array((_, c1), (_, c2)) => assert(c2 >= c1)
      case _ =>
    }
    assert(rows.last._2 == 1000L)
  }
}
