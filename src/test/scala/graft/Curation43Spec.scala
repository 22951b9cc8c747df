package graft

import org.apache.spark.sql.functions._

/** Batch-37 invariants: modularity recompute, tau bounds + identity,
  * bit-balance laws, RBO replay. */
class Curation43Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("community_modularity: exact recompute from edges + communities") {
    val edges = graft.queries.GraphQueries.knnEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val comm = graft.queries.GraphQueries.lpCommunities(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = und.length.toLong
    val deg = und.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (n, xs) => (n, xs.length.toLong) }
    val eIn = und.filter { case (a, b) => comm(a) == comm(b) }
      .groupBy(e => comm(e._1)).map { case (c, xs) => (c, xs.length.toLong) }
    val degC = deg.groupBy { case (n, _) => comm(n) }
      .map { case (c, xs) => (c, xs.map(_._2).sum) }
    val num = degC.map { case (c, dc) =>
      4L * m * eIn.getOrElse(c, 0L) - dc * dc }.sum
    val qE6 = 1000000L * (num + 4 * m * m) / (4 * m * m) - 1000000L
    val r = byName("community_modularity").collect().head
    assert(r.getLong(0) === degC.size.toLong)
    assert(r.getLong(1) === m)
    assert(r.getLong(2) === qE6)
    // detected communities beat the random cut on this graph
    assert(r.getLong(2) > 0L, s"Q = ${r.getLong(2)} e6")
  }

  test("ranker_agreement_tau: bounds, identity-ranker sanity") {
    val got = byName("ranker_agreement_tau").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.length === 10)
    got.foreach { case (qid, nPairs, c, disc, tau) =>
      assert(nPairs === 59L * 58L / 2L, s"query $qid")
      assert(c + disc <= nPairs)
      assert(tau >= -1000L && tau <= 1000L)
      assert(tau === 1000L * (c - disc + nPairs) / nPairs - 1000L)
      // an 8-dim JL sketch of 64 dims must beat a coin flip on rank
      // preservation
      assert(tau > 0L, s"query $qid tau $tau")
    }
  }

  test("shingle_bit_balance: 31 bits, conservation, low-bit balance") {
    val got = byName("shingle_bit_balance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).sorted.toSeq === (0L to 30L).toSeq)
    val total = got.head._3
    assert(got.forall(_._3 == total))
    got.foreach { case (bit, nSet, tot, share) =>
      assert(nSet >= 0 && nSet <= tot)
      assert(share === 1000L * nSet / tot)
      // md5-derived hashes: every low bit sits near 500 permille
      if (bit <= 24) assert(share >= 400 && share <= 600,
        s"bit $bit share $share")
    }
    // recompute one bit from the kernel directly
    import graft.functions.MinHashKernel.shingleHashes
    val n7 = Tables.documents(spark, sfDir)
      .select(explode(shingleHashes(col("text"))).as("sh"))
      .agg(count(lit(1)), sum(expr("(sh >> 7) & 1"))).head()
    assert(n7.getLong(0) === total)
    assert(got.find(_._1 == 7L).get._2 === n7.getLong(1))
  }

  test("rbo_topterm_drift: exact replay from half-corpus term lists") {
    def half(par: Int): Seq[String] = {
      val df = Tables.documents(spark, sfDir)
        .filter(pmod(col("doc_id"), lit(2)) === par)
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("df")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      df.sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSeq
    }
    val (la, lb) = (half(0), half(1))
    val w = (1 to 10).map(dd => math.round(math.pow(0.9, dd - 1) * 1e6))
    var wagree = 0L
    (1 to 10).foreach { dd =>
      val ov = la.take(dd).toSet.intersect(lb.take(dd).toSet).size.toLong
      wagree += w(dd - 1) * ov * (2520L / dd)
    }
    val wsum = w.sum
    val r = byName("rbo_topterm_drift").collect().head
    assert(r.getLong(0) === wsum)
    assert(r.getLong(1) === wagree)
    assert(r.getLong(2) === 1000L * wagree / (2520L * wsum))
    assert(r.getLong(2) >= 0 && r.getLong(2) <= 1000)
  }
}
