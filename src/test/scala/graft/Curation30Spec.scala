package graft

import org.apache.spark.sql.functions._

/** Batch-24 invariants: full Scala replays of the search operators. */
class Curation30Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  private lazy val docs: Array[(Long, Array[String])] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))

  private lazy val q5: Seq[String] =
    docs.flatMap(_._2).groupBy(identity).view.mapValues(_.length).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(5).map(_._1)

  test("rm3_query_expansion: full replay of the feedback loop") {
    val expected = q5.flatMap { q =>
      val scored = docs.filter(_._2.contains(q)).map { case (id, ts) =>
        (id, 1000L * ts.count(_ == q) / ts.length)
      }
      val top3 = scored.sortBy { case (id, sc) => (-sc, id) }.take(3)
      val weights = top3.flatMap { case (id, _) =>
        docs.find(_._1 == id).get._2.filter(_ != q) }
        .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      weights.sortBy { case (t, w) => (-w, t) }.take(5).zipWithIndex
        .map { case ((t, w), i) => (q, t, w, i + 1L) }
    }.toSet
    val got = byName("rm3_query_expansion").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === expected)
  }

  test("field_boosted_search: exact field tf split and boost arithmetic") {
    val got = byName("field_boosted_search").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty)
    got.foreach { case (q, id, tft, tfb, score, rank) =>
      val ts = docs.find(_._1 == id).get._2
      assert(tft === ts.take(10).count(_ == q).toLong, s"($q,$id) title tf")
      assert(tfb === ts.drop(10).count(_ == q).toLong, s"($q,$id) body tf")
      assert(score === 3 * tft + tfb, s"($q,$id) boost")
      assert(rank >= 1L && rank <= 5L)
    }
    // rank-1 doc per query maximizes the boosted score
    got.filter(_._6 == 1L).foreach { case (q, id, _, _, score, _) =>
      val best = docs.map { case (_, ts) =>
        3L * ts.take(10).count(_ == q) + ts.drop(10).count(_ == q) }.max
      assert(score === best, s"$q rank-1 not maximal")
    }
  }

  test("snippet_extraction: the reported window is exact and maximal") {
    val term = q5.head
    val got = byName("snippet_extraction").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (id, start, hits) =>
      val pos = docs.find(_._1 == id).get._2.zipWithIndex
        .filter(_._1 == term).map(_._2.toLong)
      def winHits(p: Long) = pos.count(x => x >= p && x <= p + 7).toLong
      assert(pos.contains(start), s"doc $id start is not a hit position")
      assert(hits === winHits(start), s"doc $id window count")
      assert(hits >= 2L)
      assert(pos.map(winHits).max === hits, s"doc $id window not maximal")
      val ties = pos.filter(p => winHits(p) == hits)
      assert(start === ties.min, s"doc $id tie-break not earliest")
    }
  }

  test("did_you_mean_edit1: suggestions are true edit-1 vocabulary hits") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    val vocab = docs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val probes = vocab.toSeq.sortBy { case (t, c) => (c, t) }.take(5)
      .map(_._1 + "z")
    val got = byName("did_you_mean_edit1").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSet === probes.toSet)
    got.foreach { case (p, sug, freq, rank) =>
      assert(lev(p, sug) <= 1, s"$p -> $sug distance")
      assert(vocab(sug) === freq, s"$sug freq")
      assert(rank >= 1L && rank <= 3L)
    }
    // the un-typo'd original is always a candidate; rank order is by freq
    probes.foreach { p =>
      val rows = got.filter(_._1 == p).sortBy(_._4)
      rows.map(_._3).sliding(2).foreach {
        case Array(c1, c2) => assert(c1 >= c2, s"$p rank order")
        case _ =>
      }
    }
  }
}
