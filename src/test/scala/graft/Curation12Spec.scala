package graft

import org.apache.spark.sql.functions._

/** Batch-6 invariants: winnowing pair-detection recall/precision
  * structure and Neyman allocation laws. */
class Curation12Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("winnow_overlap_pairs finds every injected exact duplicate") {
    val pairs = byName("winnow_overlap_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val baseIds = Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // exact dups: doc_id % 25 == 0 cloned at +2000000 — identical text
    // means identical fingerprint sets -> containment 1000
    val exact = baseIds.filter(_ % 25 == 0)
    assert(exact.nonEmpty)
    exact.foreach { d =>
      val c = pairs.get((d, d + 2000000L))
      assert(c.contains(1000L), s"exact dup $d: $c")
    }
    // near-dups (90% prefix at +1000000): high containment from the
    // short side — the winnowing guarantee makes these unmissable
    val near = baseIds.filter(_ % 50 == 0)
    near.foreach { d =>
      val c = pairs.get((d, d + 1000000L))
      assert(c.exists(_ >= 500L), s"near dup $d: $c")
    }
    // precision structure: every reported pair clears the 50% line
    assert(pairs.values.forall(_ >= 500L))
  }

  test("winnow_overlap_pairs containment matches a set recompute") {
    // recompute fingerprint sets with the kernel directly (driver-side)
    val c = Corpus.withDups(spark, sfDir)
      .filter(length(col("text")) >= 11)
      .select(col("doc_id"),
        graft.functions.WinnowKernel.winnowFps(col("text")).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // bucket cap replica
    val counts = c.values.toSeq.flatten.groupBy(identity)
      .view.mapValues(_.size).toMap
    val capped = c.view.mapValues(_.filter(counts(_) <= 64)).toMap
    val got = byName("winnow_overlap_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    got.foreach { case ((a, b), (shared, perm)) =>
      val inter = capped(a).intersect(capped(b)).size.toLong
      assert(inter === shared, s"pair ($a,$b) shared")
      val mn = math.min(capped(a).size, capped(b).size).toLong
      assert(perm === shared * 1000 / mn, s"pair ($a,$b) containment")
    }
  }

  test("neyman_allocation sums exactly to the budget, ordered by w") {
    val rows = byName("neyman_allocation").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._4).sum === 1000L)
    assert(rows.length === 5)
    // every stratum gets a positive allocation on this fixture
    assert(rows.forall(_._4 > 0))
    // base proportionality: alloc within 1 of the exact share
    val tw = rows.map(_._3).sum
    rows.foreach { case (lang, _, w, alloc) =>
      val exact = 1000.0 * w / tw
      assert(math.abs(alloc - exact) <= 1.0, s"$lang: $alloc vs $exact")
    }
    // weight recompute from raw moments
    val m = Tables.documents(spark, sfDir)
      .select(col("lang"), size(split(col("text"), " ")).cast("long")
        .as("x")).collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { case (lang, n, w, _) =>
      val xs = m(lang)
      assert(n === xs.size.toLong)
      val sx = xs.sum; val sxx = xs.map(x => x * x).sum
      val want = math.floor(
        math.sqrt((n * sxx - sx * sx).toDouble) * 1000).toLong
      assert(w === want, s"$lang weight")
    }
  }
}
