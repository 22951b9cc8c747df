package graft

import org.apache.spark.sql.functions._

/** Batch-13 invariants: CMS one-sided error, Bloom no-false-negative
  * law, HLL register recompute and accuracy bound. */
class Curation19Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  private val p = 2147483647L
  private val as = Seq(1103515245L, 40503L, 265443577L)
  private val bs = Seq(12345L, 104729L, 179424673L)

  test("cms_heavy_hitters: est >= true, overcount consistent, top-20 exact") {
    val rows = byName("cms_heavy_hitters").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 20)
    rows.foreach { case (k, t, e, o) =>
      assert(e >= t, s"key $k: CMS undercounted")
      assert(o === e - t, s"key $k overcount")
    }
    // the returned keys are exactly the top-20 by (true_cnt desc, key)
    val truth = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val top = truth.sortBy { case (k, c) => (-c, k) }.take(20).toSeq
    assert(rows.map(r => (r._1, r._2)).toSeq === top)
  }

  test("cms estimate matches driver-built sketch for every returned key") {
    val truth = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def bucket(j: Int, k: Long) = ((as(j) * k + bs(j)) % p) % 1024L
    val cells = scala.collection.mutable.Map[(Int, Long), Long]()
      .withDefaultValue(0L)
    truth.foreach { case (k, c) =>
      (0 until 3).foreach(j => cells((j, bucket(j, k))) += c)
    }
    byName("cms_heavy_hitters").collect().foreach { r =>
      val (k, est) = (r.getLong(0), r.getLong(2))
      val expect = (0 until 3).map(j => cells((j, bucket(j, k)))).min
      assert(est === expect, s"key $k sketch mismatch")
    }
  }

  test("bloom_semijoin_prune: zero false negatives, counts reconcile") {
    val r = byName("bloom_semijoin_prune").collect().head
    val (n, members, pass, fp, missed) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(missed === 0L, "Bloom false negative")
    assert(pass === members + fp, "pass != members + false positives")
    assert(members <= n && pass <= n)
    // FP rate sanity: under half the non-members pass
    assert(fp * 2 <= n - members, s"fp rate too high: $fp of ${n - members}")
  }

  test("hll_register_estimate matches a driver-built register array") {
    val keys = Tables.orders(spark, sfDir)
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0))
    val regs = Array.fill(64)(0L)
    keys.foreach { k =>
      val h = (as(0) * k + bs(0)) % p
      val bucket = (h % 64).toInt
      val rest = h / 64
      val rho =
        if (rest == 0) 26L
        else math.min(java.lang.Long.numberOfTrailingZeros(rest) + 1L, 26L)
      regs(bucket) = math.max(regs(bucket), rho)
    }
    val regsum = regs.map(m => 1L << (30 - m)).sum
    val vEmpty = regs.count(_ == 0L).toLong
    val rawEst = 3118214976372736L / (1000L * regsum)
    val r = byName("hll_register_estimate").collect().head
    assert(r.getLong(0) === 64L)
    assert(r.getLong(1) === vEmpty, "v_empty")
    assert(r.getLong(2) === rawEst, "raw_est")
    assert(r.getLong(4) === keys.length.toLong, "true_distinct")
    // m=64 gives ~13% standard error; assert within 3 sigma
    assert(r.getLong(5) <= 400L, s"err ${r.getLong(5)} permille")
  }
}
