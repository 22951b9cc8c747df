package graft

import org.apache.spark.sql.functions._

/** Batch-20 invariants: each sequential recurrence (Holt, KM, CUSUM) is
  * replayed in plain Scala from the raw events and compared row-for-row
  * against the engine's fold. */
class Curation26Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  /** (event_type, dayIndex) -> count, zero-filled over the full span. */
  private lazy val (dailyByType, nDays) = {
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay))
    val d0 = rows.map(_._2).min
    val d1 = rows.map(_._2).max
    val nd = (d1 - d0 + 1).toInt
    val types = rows.map(_._1).distinct
    val counts = rows.groupBy(r => (r._1, (r._2 - d0).toInt))
      .map { case (k, v) => k -> v.length.toLong }
    val filled = types.map { t =>
      t -> (0 until nd).map(i => counts.getOrElse((t, i), 0L)).toVector
    }.toMap
    (filled, nd)
  }

  test("holt_linear_forecast: exact replay of the halving recurrence") {
    val got = byName("holt_linear_forecast").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet === dailyByType.keySet)
    dailyByType.foreach { case (t, cnts) =>
      var l = cnts(0) * 1000000L
      var b = (cnts(1) - cnts(0)) * 1000000L
      cnts.drop(2).foreach { x =>
        val lNew = Math.floorDiv(x * 1000000L + l + b, 2L)
        b = Math.floorDiv(lNew - l + b, 2L)
        l = lNew
      }
      assert(got(t) === ((l, b, l + b, l + 2 * b, l + 3 * b)),
        s"event_type $t holt state")
    }
  }

  test("kaplan_meier_retention: exact replay of the product-limit curve") {
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        to_date(col("ts")).as("day"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getDate(2).toLocalDate.toEpochDay))
    val hday = rows.map(_._3).max
    val lab = rows.groupBy(_._1).toSeq.map { case (_, es) =>
      val first = es.map(_._3).min
      val pur = es.filter(_._2 == "purchase").map(_._3)
      if (pur.nonEmpty) (pur.min - first, 1L) else (hday - first, 0L)
    }
    val total = lab.size.toLong
    val byT = lab.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (t, g) => (t, g.map(_._2).sum, g.size.toLong) }
    var cum = 0L
    var s = 1000000L
    val expected = byT.flatMap { case (t, d, c) =>
      val n = total - cum
      cum += c
      if (d > 0) {
        s = s * (n - d) / n
        Some((t, n, d, s))
      } else None
    }
    val got = byName("kaplan_meier_retention").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq === expected)
    assert(got.nonEmpty, "KM curve degenerate — no conversion events")
    // survival is non-increasing and bounded
    got.map(_._4).sliding(2).foreach {
      case Array(a, b) => assert(b <= a, "survival increased")
      case _ =>
    }
  }

  test("cusum_changepoint_batch: exact replay incl. alarm-reset") {
    val totals = {
      val types = dailyByType.keys.toSeq
      (0 until nDays).map(i => types.map(t => dailyByType(t)(i)).sum)
    }
    val ref = Math.floorDiv(totals.take(7).sum * 1000L, 7L)
    val slack = ref / 20
    val thr = ref / 2
    var carry = 0L
    val expected = totals.zipWithIndex.map { case (c, i) =>
      val x = c * 1000L
      val sNow = math.max(0L, carry + x - ref - slack)
      val alarm = if (sNow > thr) 1L else 0L
      carry = if (alarm == 1L) 0L else sNow
      (i.toLong, x, sNow, alarm)
    }
    val got = byName("cusum_changepoint_batch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq === expected)
  }

  test("seasonal_naive_eval: recompute both error sums and the skill ratio") {
    val got = byName("seasonal_naive_eval").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got.keySet === dailyByType.keySet)
    dailyByType.foreach { case (t, cnts) =>
      val scored = (7 until cnts.length)
      val sae7 = scored.map(i => math.abs(cnts(i) - cnts(i - 7))).sum
      val sae1 = scored.map(i => math.abs(cnts(i) - cnts(i - 1))).sum
      val skill = 1000L * sae7 / math.max(sae1, 1L)
      assert(got(t) === ((scored.length.toLong, sae7, sae1, skill)),
        s"event_type $t seasonal eval")
    }
  }
}
