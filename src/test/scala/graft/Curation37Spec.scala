package graft

import org.apache.spark.sql.functions._

/** Batch-31 invariants: the experimentation readouts recomputed. */
class Curation37Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("srm_check: exact chi-square contributions, healthy split") {
    val docIds = Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      val h = md.digest(s"split$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h, 16) % 10
    }
    val splits = docIds.map(id => bucket(id) match {
      case b if b < 8 => "train"
      case 8 => "val"
      case _ => "test"
    })
    val n = docIds.length.toLong
    val expected = Map("train" -> 800L, "val" -> 100L, "test" -> 100L)
    val got = byName("srm_check").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (s, pm) =>
      val obs = splits.count(_ == s).toLong
      val dev = 1000 * obs - n * pm
      assert(got(s) === ((obs, n * pm, dev * dev / (n * pm))), s"cell $s")
    }
    // the hash split is healthy: total scaled chi2 under the 0.999
    // threshold (13.8e3 at 2 dof)
    assert(got.values.map(_._3).sum < 13800L, "split shows SRM")
  }

  test("diff_in_diff_purchases: exact 2x2 replay; A/A effect near zero") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val t0 = ev.map(_._3).min
    def cell(grp: Long, period: Long): Long =
      ev.count(e => e._1 % 2 == grp &&
        (if ((e._3 - t0) / 86400000000L < 15) 0L else 1L) == period &&
        e._2 == "purchase").toLong
    val nA = ev.filter(_._1 % 2 == 0).map(_._1).distinct.length.toLong
    val nB = ev.filter(_._1 % 2 == 1).map(_._1).distinct.length.toLong
    val (a0, a1) = (1000 * cell(0, 0) / nA, 1000 * cell(0, 1) / nA)
    val (b0, b1) = (1000 * cell(1, 0) / nB, 1000 * cell(1, 1) / nB)
    val r = byName("diff_in_diff_purchases").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((nA, a0, a1)))
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) === ((nB, b0, b1)))
    val did = (b1 - b0) - (a1 - a0)
    assert(r.getLong(6) === did)
    // structural: both arms are non-empty and means are non-negative
    // (an A/A magnitude bound is meaningless at the 15-user sf0.001
    // fixture — per-arm noise dominates; the exact replay above is
    // the correctness statement)
    assert(nA > 0 && nB > 0)
    assert(Seq(a0, a1, b0, b1).forall(_ >= 0L))
  }

  test("ab_power_mde: exact replay, sqrt halving law across horizons") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val users = ev.map(_._1).distinct
    val conv = users.count(u =>
      ev.exists(e => e._1 == u && e._2 == "purchase")).toLong
    val n = users.length.toLong
    val p = 1000000L * conv / n
    val got = byName("ab_power_mde").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got.keySet === Set(1L, 2L, 4L))
    Seq(1L, 2L, 4L).foreach { m =>
      val arm = n * m / 2
      val mde = math.floor(2800.0 *
        math.sqrt((2.0 * p * (1000000L - p)) / (arm.toDouble * 1e12)) *
        1000.0).toLong
      assert(got(m) === ((n * m, arm, p, mde)), s"horizon $m")
    }
    // 4x population -> mde halves (within integer floor slack)
    val (m1, m4) = (got(1L)._4, got(4L)._4)
    assert(math.abs(m4 * 2 - m1) <= 2L, s"sqrt law violated: $m1 vs $m4")
  }
}
