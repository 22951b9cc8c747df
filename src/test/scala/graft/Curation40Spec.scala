package graft

import org.apache.spark.sql.functions._

/** Batch-34 invariants: ablation accounting, HT unbiasedness structure,
  * silhouette recompute, dedup P/R confusion-matrix laws. */
class Curation40Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  private lazy val docs: Array[(Long, String, String, Long)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("source_ablation_impact: exact LOO recompute, zero-sum structure") {
    val nAll = docs.length.toLong
    val wAll = docs.map(_._4).sum
    val got = byName("source_ablation_impact").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val bySrc = docs.groupBy(_._3)
    assert(got.keySet === bySrc.keySet)
    bySrc.foreach { case (src, xs) =>
      val (nSrc, meanAll, loo, impact) = got(src)
      assert(nSrc === xs.length.toLong)
      assert(meanAll === 1000L * wAll / nAll)
      assert(loo ===
        1000L * (wAll - xs.map(_._4).sum) / (nAll - xs.length))
      assert(impact === loo - meanAll)
    }
    // impacts cannot all share a strict sign (some source is below the
    // mean iff another is above it)
    val impacts = got.values.map(_._4)
    assert(impacts.exists(_ >= 0) && impacts.exists(_ <= 0))
  }

  test("horvitz_thompson_stratified: design replay, bounded error") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(id: Long): Long = {
      val hex = md.digest(s"ht$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val got = byName("horvitz_thompson_stratified").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    docs.groupBy(_._2).foreach { case (lang, xs) =>
      val m = if (lang == "en") 4L else 2L
      val sampled = xs.filter(x => h32(x._1) % m == 0)
      val (n, ns, tt, ht, err) = got(lang)
      assert(n === xs.length.toLong)
      assert(ns === sampled.length.toLong)
      assert(tt === xs.map(_._4).sum)
      assert(ht === sampled.map(_._4 * m).sum)
      assert(err === 1000L * math.abs(ht - tt) / tt)
      // the design earns its keep on this fixture: within 50%
      assert(err <= 500L, s"$lang HT error $err permille")
    }
  }

  test("silhouette_by_label: exact recompute on the bounded slice") {
    val vecs = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 200)
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).map(x => math.floor(x.toDouble * 1000).toLong)))
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expected = vecs.map { case (i, li, vi) =>
      val means = vecs.filter(_._1 != i).groupBy(_._2).map { case (lj, g) =>
        (lj, g.map(o => d2(vi, o._3)).sum / g.length)
      }
      val a2 = means(li)
      val b2 = means.filter(_._1 != li).values.min
      val g = math.max(math.max(a2, b2), 1L)
      (i, li, 1000L * (b2 - a2 + g) / g - 1000L)
    }
    val expByLabel = expected.groupBy(_._2).map { case (l, xs) =>
      (l, (xs.length.toLong,
        xs.map(_._3 + 1000L).sum / xs.length - 1000L,
        xs.count(_._3 < 0).toLong))
    }
    val got = byName("silhouette_by_label").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expByLabel)
  }

  test("dedup_recall_eval: canary accounting and exact-dup recall floor") {
    val r = byName("dedup_recall_eval").collect().head
    val (nInj, nCaught, recall) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (nExact, exactCaught) = (r.getLong(3), r.getLong(4))
    val (nNear, nearCaught) = (r.getLong(5), r.getLong(6))
    // canary cardinality by construction: docs at %25 & !%50 give 1
    // exact pair; docs at %50 give 1 exact + 2 near pairs
    val ids = docs.map(_._1)
    val both = ids.count(_ % 50 == 0).toLong
    val exactOnly = ids.count(i => i % 25 == 0 && i % 50 != 0).toLong
    assert(nExact === exactOnly + both)
    assert(nNear === 2 * both)
    assert(nInj === nExact + nNear)
    assert(nCaught === exactCaught + nearCaught)
    // exact duplicates are structurally unmissable
    assert(exactCaught === nExact)
    assert(recall === 1000L * nCaught / nInj)
    assert(recall >= 700L, s"recall $recall permille")
    assert(r.getLong(7) >= 0L) // organic discoveries are non-negative
  }
}
