package graft

import org.apache.spark.sql.functions._

/** Recall evaluation of the approximate-nearest-neighbor paths against
  * the brute-force ground truth — the eval harness a 100 TB deployment
  * runs before trusting an index. The oracle pins each query's OUTPUT;
  * this pins the RELATIONSHIP between the approximate and exact
  * operators, which no single-query check can see. */
class AnnRecallSpec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  /** exact top-5 neighbor set per query from the brute-force ranking */
  private lazy val exact: Map[Long, Set[Long]] =
    byName("cosine_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  test("IVF top-k recall@5 against brute force is usable and measured") {
    val ivf = byName("ann_ivf_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    // every IVF query id must exist in the exact ranking
    assert(ivf.keySet.subsetOf(exact.keySet))
    val hits = ivf.map { case (q, approx) =>
      (approx intersect exact(q)).size
    }.sum
    val total = ivf.size * 5
    val recallPermille = 1000L * hits / total
    // nprobe covers a fraction of 8 centroids over RANDOM 64-dim
    // vectors (no cluster structure — the hardest case for IVF):
    // measured 360 permille at sf0.001; random routing would land near
    // 5/500 = 10 permille. Floor at 250 to catch routing regressions
    // without overfitting the fixture draw.
    assert(recallPermille >= 250L,
      s"IVF recall@5 = $recallPermille permille")
  }

  test("LSH top-k output is structurally sound per query") {
    val lsh = byName("ann_lsh_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(lsh.nonEmpty)
    val corpus = Tables.embeddings(spark, sfDir)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    lsh.foreach { case (q, n, _, _, _) =>
      assert(corpus.contains(n) && n != q)
    }
    lsh.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._4)
      // ranks consecutive from 1, at most k=3, one bucket per query,
      // scores non-increasing in rank (exact cosine within the bucket)
      assert(sorted.map(_._4).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.length <= 3)
      assert(sorted.map(_._3).distinct.length == 1, s"query $q buckets")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 >= b._5, s"query $q score order")
        case _ =>
      }
    }
    // single-table sign-LSH on random 64-dim vectors is NOT expected to
    // recover the global top-5 (per-plane agreement ~0.6^planes); the
    // measured overlap is reported by AnnRecallSpec's IVF test pattern
    // but not floored — the banding variant that does chase recall is
    // dedup_minhash_lsh's multi-band construction.
  }
}
