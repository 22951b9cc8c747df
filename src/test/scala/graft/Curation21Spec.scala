package graft

import org.apache.spark.sql.functions._

/** Batch-15 invariants: masking-rate bands, span merge laws, pass@k
  * identities, quantile sketch error bound. */
class Curation21Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("mlm_mask_plan: counts partition, rate near the 2/16 hash band") {
    val rows = byName("mlm_mask_plan").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.length === 500)
    rows.foreach { case (id, n, m, mt, rnd, keep, pm) =>
      assert(m === mt + rnd + keep, s"doc $id action split")
      assert(m <= n, s"doc $id masked > tokens")
      assert(pm === 1000L * m / n, s"doc $id permille")
    }
    // corpus-level rate concentrates near 125 permille (hash uniformity)
    val totalTok = rows.map(_._2).sum
    val totalMask = rows.map(_._3).sum
    val rate = 1000.0 * totalMask / totalTok
    assert(rate > 105 && rate < 145, s"corpus mask rate $rate permille")
    // 80/10/10-ish split of masked: mask-token band 13/16 of masked
    val mtRate = 16.0 * rows.map(_._4).sum / totalMask
    assert(mtRate > 11.5 && mtRate < 14.5, s"mask-token band $mtRate/16")
  }

  test("span_corruption_plan: spans cover starts, 3x coverage bound") {
    val rows = byName("span_corruption_plan").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    rows.foreach { case (id, n, starts, spans, masked) =>
      assert(spans <= starts, s"doc $id merged spans exceed starts")
      assert(masked >= starts, s"doc $id coverage below starts")
      assert(masked <= math.min(3 * starts, n), s"doc $id coverage bound")
      if (starts === 0L) assert(masked === 0L && spans === 0L)
    }
  }

  test("pass_at_k: exact subset-probability identities") {
    val rows = byName("pass_at_k").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (l, s, n, c, p1, p5) =>
      assert(n >= 5, s"($l,$s) filtered cell leaked")
      assert(p1 === c * 1000000L / n, s"($l,$s) pass@1")
      // pass@5 >= pass@1 always; equality iff c == 0 or c == n
      assert(p5 >= p1, s"($l,$s) monotone in k")
      if (c === 0L) assert(p5 === 0L, s"($l,$s) zero-pass cell")
      if (n - c < 5) assert(p5 === 1000000L, s"($l,$s) pigeonhole cell")
      // exact falling-factorial recompute (c=0 yields 0 via the ratio)
      def perm5(x: Long) = x * (x - 1) * (x - 2) * (x - 3) * (x - 4)
      val expect = if (n - c >= 5)
        1000000L - perm5(n - c) * 1000000L / perm5(n) else 1000000L
      assert(p5 === expect, s"($l,$s) pass@5 $p5 vs $expect")
    }
  }

  test("quantile_sketch_merge: |err| < bin_width, ranks correct") {
    val rows = byName("quantile_sketch_merge").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).sorted.toSeq === Seq(50L, 90L, 99L))
    val n = Tables.documents(spark, sfDir).count()
    rows.foreach { case (p, target, exact, est, err, width) =>
      assert(target === (p * n + 99) / 100, s"p$p target rank")
      assert(err === est - exact, s"p$p err column")
      assert(math.abs(err) < width, s"p$p err $err >= bin width $width")
    }
  }
}
