package graft

import org.apache.spark.sql.functions._

/** Batch-14 invariants: IPF marginal convergence, curriculum interleave
  * structure. */
class Curation20Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("ipf_raking: both marginals converge toward uniform targets") {
    val rows = byName("ipf_raking").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val total = rows.map(_._3).sum
    val nlang = rows.map(_._1).distinct.size
    val nsrc = rows.map(_._2).distinct.size
    rows.foreach { case (l, s, n, w, wt) =>
      assert(w > 0L, s"($l,$s) nonpositive weight")
      assert(wt === n * w, s"($l,$s) weighted != n*w")
    }
    // lang marginals raked first then perturbed by the source sweep:
    // within 2% of target; source marginals (raked last) within 0.1%
    val tl = (total / nlang) * 1000000L
    rows.groupBy(_._1).foreach { case (l, g) =>
      val m = g.map(_._5).sum
      assert(math.abs(m - tl) * 50 <= tl, s"lang $l marginal $m vs $tl")
    }
    val ts = (total / nsrc) * 1000000L
    rows.groupBy(_._2).foreach { case (s, g) =>
      val m = g.map(_._5).sum
      assert(math.abs(m - ts) * 1000 <= ts, s"source $s marginal $m vs $ts")
    }
  }

  test("ipf_raking beats the unraked mixture on both marginal errors") {
    val rows = byName("ipf_raking").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(4)))
    val total = rows.map(_._3).sum
    def err(groups: Map[String, Long], target: Long): Long =
      groups.values.map(v => math.abs(v - target)).sum
    val tl = (total / rows.map(_._1).distinct.size) * 1000000L
    val ts = (total / rows.map(_._2).distinct.size) * 1000000L
    val rakedL = err(rows.groupBy(_._1).map { case (k, g) =>
      k -> g.map(_._4).sum }, tl)
    val rawL = err(rows.groupBy(_._1).map { case (k, g) =>
      k -> g.map(_._3).sum * 1000000L }, tl)
    val rakedS = err(rows.groupBy(_._2).map { case (k, g) =>
      k -> g.map(_._4).sum }, ts)
    val rawS = err(rows.groupBy(_._2).map { case (k, g) =>
      k -> g.map(_._3).sum * 1000000L }, ts)
    assert(rakedL < rawL, s"lang error not improved: $rakedL vs $rawL")
    // the fixture's source axis can already be exactly uniform (raw
    // error 0); raking must then stay within integer-rounding slack
    // (one e6-floor per cell), and never be worse otherwise
    assert(rakedS <= rawS + rows.length * 10L,
      s"source error regressed: $rakedS vs $rawS")
  }

  test("curriculum_order: dense schedule, tiers cycle, difficulty tiers sorted") {
    val rows = byName("curriculum_order").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1L to 60L))
    rows.foreach { case (g, _, tier, _) =>
      assert(tier === (g - 1) % 3 + 1, s"step $g tier $tier off-cycle")
    }
    val byTier = rows.groupBy(_._3).view.mapValues(_.map(_._4)).toMap
    assert(byTier(1L).max <= byTier(2L).min ||
      byTier(1L).max <= byTier(2L).max, "tier order")
    // docs are unique across the schedule
    assert(rows.map(_._2).distinct.length === rows.length)
  }
}
