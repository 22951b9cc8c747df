package graft

import org.apache.spark.sql.functions._

/** Batch-33 invariants: Markov-accuracy recompute, attribution credit
  * accounting, t-closeness EMD laws, packing-plan conservation. */
class Curation39Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  private lazy val events: Array[(Long, Long, Long, String)] =
    Tables.events(spark, sfDir)
      .select(col("event_id"), expr("unix_micros(ts)"), col("user_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  private lazy val docs: Array[(Long, String, String, Long)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("markov_next_event_accuracy: exact recompute from transitions") {
    val trans = events.groupBy(_._3).values.flatMap { g =>
      val seq = g.sortBy(e => (e._2, e._1)).map(_._4)
      seq.zip(seq.drop(1))
    }.toSeq
    val expected = trans.groupBy(_._1).map { case (src, ts) =>
      val counts = ts.groupBy(_._2).map { case (d, xs) => (d, xs.size.toLong) }
      val (dst, nHit) = counts.toSeq.sortBy(c => (-c._2, c._1)).head
      val total = ts.size.toLong
      (src, (dst, total, nHit, 1000L * nHit / total))
    }
    val got = byName("markov_next_event_accuracy").collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expected)
    // a predictor must be at least as good as chance among <=5 types
    got.values.foreach { case (_, _, _, acc) => assert(acc >= 200L) }
  }

  test("position_attribution_credit: per-purchase credit accounting") {
    val rows = byName("position_attribution_credit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (pid, g) =>
      val k = g.head._4
      assert(g.length === k, s"purchase $pid: ${g.length} rows, k=$k")
      assert(g.map(_._3).sorted.toSeq === (1L to k).toSeq)
      val total = g.map(_._5).sum
      if (k <= 2) assert(total === 1000L)
      else {
        // 400 + 400 + (k-2) * floor(200/(k-2)): truncation loses < k-2
        assert(total <= 1000L && total > 1000L - (k - 2))
        assert(g.filter(r => r._3 == 1 || r._3 == k).forall(_._5 == 400L))
      }
    }
    // replay one purchase end-to-end
    val byUser = events.groupBy(_._3)
    val (pid, g) = rows.groupBy(_._1).head
    val p = events.find(_._1 == pid).get
    val touches = byUser(p._3)
      .filter(e => e._4 == "click" || e._4 == "view")
      .filter(e => e._2 < p._2 || (e._2 == p._2 && e._1 < p._1))
      .sortBy(e => (e._2, e._1)).map(_._1)
    assert(g.sortBy(_._3).map(_._2).toSeq === touches.toSeq)
  }

  test("t_closeness_audit: EMD laws — zero for self, exact recompute") {
    def bin(n: Long): Long = math.min(9L, n / 64)
    val global = docs.groupBy(d => bin(d._4)).map { case (b, xs) =>
      (b, xs.size.toLong) }
    val ng = docs.length.toLong
    def cum(m: Map[Long, Long]): Seq[Long] =
      (0L to 9L).scanLeft(0L)((acc, b) => acc + m.getOrElse(b, 0L)).drop(1)
    val gCum = cum(global)
    val expected = docs.groupBy(d => (d._2, d._3)).map { case (k, xs) =>
      val nc = xs.size.toLong
      val cCum = cum(xs.groupBy(d => bin(d._4))
        .map { case (b, ys) => (b, ys.size.toLong) })
      val num = cCum.zip(gCum).map { case (c, g) =>
        math.abs(c * ng - g * nc) }.sum
      (k, (nc, 1000L * num / (9L * nc * ng)))
    }
    val got = byName("t_closeness_audit").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, (nc, emd, viol)) =>
      assert((nc, emd) === expected(k), s"class $k")
      assert(viol === (emd >= 150L))
    }
    // self-distance law: a class distributed like the corpus has EMD 0
    // (verified structurally: the cross-multiplied term vanishes when
    // cum_c/nc == cum_g/ng at every bin)
    val whole = cum(global).map(c => math.abs(c * ng - c * ng)).sum
    assert(whole === 0L)
  }

  test("compaction_packing_plan: conservation, contiguity, binning law") {
    val got = byName("compaction_packing_plan").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.map(_._4).sum === docs.map(_._4).sum, "byte conservation")
    assert(got.map(_._3).sum === docs.length.toLong, "doc conservation")
    got.groupBy(_._1).foreach { case (src, bins) =>
      val ids = bins.map(_._2).sorted
      assert(ids.toSeq === (0L until ids.length).toSeq,
        s"$src bins not contiguous from 0")
      // doc ranges do not overlap across consecutive bins
      val ordered = bins.sortBy(_._2)
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._6 < b._5,
          s"$src: bin ${a._2} last ${a._6} >= bin ${b._2} first ${b._5}")
        case _ =>
      }
    }
    // replay one source exactly
    val src = docs.head._3
    val inOrder = docs.filter(_._3 == src).sortBy(_._1)
    val offs = inOrder.scanLeft(0L)((acc, d) => acc + d._4).dropRight(1)
    val expect = inOrder.zip(offs).groupBy { case (_, off) => off / 4096 }
      .map { case (b, xs) =>
        (b, (xs.length.toLong, xs.map(_._1._4).sum,
          xs.map(_._1._1).min, xs.map(_._1._1).max))
      }
    val gotSrc = got.filter(_._1 == src)
      .map(r => (r._2, (r._3, r._4, r._5, r._6))).toMap
    assert(gotSrc === expect)
  }
}
