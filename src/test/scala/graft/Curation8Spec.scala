package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the curation8 batch: recompute-in-Scala laws
  * for the properties the oracle hash can't express. */
class Curation8Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("dsir_importance_proxy recomputes from raw bucket counts") {
    val p = 2147483647L // not used; bucket = md5 % 1024
    val md = java.security.MessageDigest.getInstance("MD5")
    def bkt(tok: String): Long = {
      val hex = md.digest(tok.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 1024L
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val all = docs.flatMap { case (_, lang, text) =>
      text.split(" ").map(t => (bkt(t), lang))
    }
    val cs = all.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ct = all.filter(_._2 == "en").groupBy(_._1)
      .view.mapValues(_.length.toLong).toMap
    val ns = all.length.toLong
    val nt = all.count(_._2 == "en").toLong
    val got = byName("dsir_importance_proxy").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.take(30).foreach { case (id, _, text) =>
      val bs = text.split(" ").map(bkt)
      val a = BigInt(bs.map(b => ct.getOrElse(b, 0L)).sum)
      val bb = BigInt(bs.map(cs).sum)
      val expected = (a * ns * 1000) / (bb * nt)
      assert(BigInt(got(id)) === expected, s"doc $id")
    }
    // en docs should on average score above non-en docs
    val byLang = docs.map { case (id, lang, _) => lang -> got(id) }
    val enAvg = byLang.filter(_._1 == "en").map(_._2).sum /
      byLang.count(_._1 == "en")
    val otherAvg = byLang.filter(_._1 != "en").map(_._2).sum /
      byLang.count(_._1 != "en")
    assert(enAvg > otherAvg,
      s"target-domain docs must score higher: en=$enAvg other=$otherAvg")
  }

  test("kendall_tau_length recomputes per lang and stays in [-1000,1000]") {
    val sample = Tables.documents(spark, sfDir)
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("x"),
        length(col("text")).cast("long").as("y"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).take(100).map(t => (t._3, t._4))).toMap
    val got = byName("kendall_tau_length").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    sample.foreach { case (lang, xs) =>
      var c = 0L; var dd = 0L; var nx = 0L; var ny = 0L; var n0 = 0L
      for (i <- xs.indices; j <- (i + 1) until xs.length) {
        val prod = (xs(i)._1 - xs(j)._1) * (xs(i)._2 - xs(j)._2)
        n0 += 1
        if (prod > 0) c += 1 else if (prod < 0) dd += 1
        if (xs(i)._1 == xs(j)._1) nx += 1
        if (xs(i)._2 == xs(j)._2) ny += 1
      }
      val tau = math.floor((c - dd).toDouble * 1000.0 /
        (math.sqrt((n0 - nx).toDouble) * math.sqrt((n0 - ny).toDouble)))
        .toLong
      assert(got(lang) === ((c, dd, tau)), s"lang $lang")
      assert(tau >= -1000 && tau <= 1000)
      // token count and char length are strongly concordant
      assert(tau > 500, s"lang $lang tau=$tau suspiciously low")
    }
  }

  test("kendall_tau_full matches the all-pairs O(n^2) recompute over " +
    "the whole corpus") {
    // the histogram-cell formulation must equal brute force exactly —
    // every pair, all ties, not a sample
    val all = Tables.documents(spark, sfDir)
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("x"),
        col("n_chars"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))).toMap
    val got = byName("kendall_tau_full").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet === all.keySet)
    all.foreach { case (lang, xs) =>
      var c = 0L; var dd = 0L; var nx = 0L; var ny = 0L; var n0 = 0L
      for (i <- xs.indices; j <- (i + 1) until xs.length) {
        val prod = (xs(i)._1 - xs(j)._1) * (xs(i)._2 - xs(j)._2)
        n0 += 1
        if (prod > 0) c += 1 else if (prod < 0) dd += 1
        if (xs(i)._1 == xs(j)._1) nx += 1
        if (xs(i)._2 == xs(j)._2) ny += 1
      }
      val tau = math.floor((c - dd).toDouble * 1000.0 /
        (math.sqrt((n0 - nx).toDouble) * math.sqrt((n0 - ny).toDouble)))
        .toLong
      assert(got(lang) === ((xs.length.toLong, c, dd, tau)), s"lang $lang")
    }
  }

  test("autocorr_lag1 matches a sequential per-user recompute") {
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2),
        r.getDouble(3)))
    val got = byName("autocorr_lag1").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    events.groupBy(_._1).foreach { case (uid, evs) =>
      val ordered = evs.sortBy(e => (e._2, e._3))
        .map(e => math.floor(e._4 * 100).toLong)
      val pairs = ordered.zip(ordered.drop(1)) // (prev=a, cur=b)
      val n = pairs.length.toLong
      if (n >= 10) {
        val sa = pairs.map(_._1).sum; val sb = pairs.map(_._2).sum
        val saa = pairs.map(p => p._1 * p._1).sum
        val sbb = pairs.map(p => p._2 * p._2).sum
        val sab = pairs.map(p => p._1 * p._2).sum
        val r = (n * sab - sa * sb).toDouble /
          (math.sqrt((n * saa - sa * sa).toDouble) *
            math.sqrt((n * sbb - sb * sb).toDouble))
        val (gn, gr) = got(uid)
        assert(gn === n, s"user $uid n")
        assert(math.abs(gr - r) < 1e-12, s"user $uid r: $gr vs $r")
        assert(gr >= -1.0 - 1e-9 && gr <= 1.0 + 1e-9)
      } else assert(!got.contains(uid))
    }
  }

  test("kcore_membership: peel rounds are monotone and degree-consistent") {
    val edges = graft.queries.GraphQueries.knnEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = (edges ++ edges.map(_.swap)).distinct
    val got = byName("kcore_membership").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def degrees(es: Seq[(Long, Long)]): Map[Long, Int] =
      es.groupBy(_._1).view.mapValues(_.length).toMap
    val d0 = degrees(und)
    assert(got.keySet === d0.keySet)
    val keep1 = d0.filter(_._2 >= 5).keySet
    val e1 = und.filter(e => keep1(e._1) && keep1(e._2))
    val keep2 = degrees(e1).filter(_._2 >= 5).keySet
    got.foreach { case (u, rounds) =>
      val expected = (if (keep1(u)) 1 else 0) + (if (keep2(u)) 1 else 0)
      assert(rounds === expected.toLong, s"node $u")
    }
    // survivors of round 2 must have been survivors of round 1
    assert(keep2.subsetOf(keep1))
  }
}
