package graft

import org.apache.spark.sql.functions._

/** Batch-22 invariants: lexical recomputes, stylometry replay, exact
  * banding-curve replay, and threshold-sweep monotonicity. */
class Curation28Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  private lazy val docs: Array[(Long, Seq[String], String)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq,
        r.getString(2)))

  test("type_token_ratio: exact recompute per document") {
    val got = byName("type_token_ratio").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got.size === docs.length)
    docs.foreach { case (id, toks, _) =>
      val counts = toks.groupBy(identity).map(_._2.size)
      val nTok = toks.size.toLong
      val nTyp = counts.size.toLong
      val nHap = counts.count(_ == 1).toLong
      assert(got(id) === ((nTok, nTyp, nHap, 1000 * nTyp / nTok,
        1000 * nHap / nTyp)), s"doc $id lexical profile")
    }
  }

  test("stylometry_source_distance: full replay of profiles and L1") {
    val all = docs.flatMap { case (_, toks, src) => toks.map(src -> _) }
    val top = all.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (tok, c) => (-c, tok) }.take(20).map(_._1)
    val sources = docs.map(_._3).distinct
    val prof: Map[String, Map[String, Long]] = sources.map { s =>
      val cs = top.map(t =>
        t -> all.count(p => p._1 == s && p._2 == t).toLong)
      val tot = cs.map(_._2).sum
      s -> cs.map { case (t, c) => t -> 1000L * c / tot }.toMap
    }.toMap
    val expected = (for {
      a <- sources; b <- sources if a < b
    } yield (a, b) ->
      top.map(t => math.abs(prof(a)(t) - prof(b)(t))).sum).toMap
    val got = byName("stylometry_source_distance").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === expected)
  }

  test("minhash_band_tuning: exact replay + S-curve shape laws") {
    def sq(x: Long) = x * x / 1000000L
    def powChain(x: Long, k: Long): Long = k match {
      case 2 => sq(x)
      case 4 => sq(sq(x))
      case 8 => sq(sq(sq(x)))
      case 16 => sq(sq(sq(sq(x))))
      case 32 => sq(sq(sq(sq(sq(x)))))
      case _ => fail(s"unexpected exponent $k")
    }
    val rows = byName("minhash_band_tuning").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 4 * 19)
    rows.foreach { case (b, rr, sPm, p) =>
      val sr = powChain(sPm * 1000L, rr)
      val expected = 1000000L - powChain(1000000L - sr, b)
      assert(p === expected, s"(b=$b,r=$rr,s=$sPm) curve value")
    }
    // monotone in s for each config
    rows.groupBy(r => (r._1, r._2)).foreach { case (cfg, rs) =>
      rs.sortBy(_._3).map(_._4).sliding(2).foreach {
        case Array(p1, p2) => assert(p2 >= p1, s"$cfg not monotone")
        case _ =>
      }
    }
    // more rows per band => stricter at low similarity (s = 0.3)
    val at300 = rows.filter(_._3 == 300L).sortBy(_._2).map(_._4)
    at300.sliding(2).foreach {
      case Array(p1, p2) =>
        assert(p2 <= p1, "higher r did not suppress low-s detection")
      case _ =>
    }
  }

  test("dedup_threshold_sweep: monotone, exact at the loosest threshold") {
    val slice = docs.filter(_._1 < 200)
      .map { case (id, toks, _) => id -> toks.toSet }
    val jac = for {
      (a, ta) <- slice; (b, tb) <- slice if a < b
      ni = (ta intersect tb).size.toLong if ni > 0
    } yield (a, b, 1000L * ni / (ta.size + tb.size - ni))
    val got = byName("dedup_threshold_sweep").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet === Set(500L, 600L, 700L, 800L, 900L))
    Seq(500L, 600L, 700L, 800L, 900L).foreach { t =>
      val hits = jac.filter(_._3 >= t)
      val nDocs = hits.flatMap(h => Seq(h._1, h._2)).distinct.length.toLong
      assert(got(t) === ((hits.length.toLong, nDocs)), s"threshold $t")
    }
    got.toSeq.sortBy(_._1).map(_._2).sliding(2).foreach {
      case Seq((p1, d1), (p2, d2)) =>
        assert(p2 <= p1 && d2 <= d1, "sweep not monotone")
      case _ =>
    }
  }
}
