package graft

import graft.queries.GraphQueries

/** Batch-21 invariants: recompute every graph metric from the collected
  * edge list with plain Scala set algebra. */
class Curation27Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  private lazy val edges: Set[(Long, Long)] =
    GraphQueries.knnEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val und: Set[(Long, Long)] =
    edges.map { case (s, d) => (math.min(s, d), math.max(s, d)) }

  private lazy val nbrs: Map[Long, Set[Long]] = {
    val sym = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
  }

  test("node_jaccard_linkpred: exact Jaccard, non-edges only, complete") {
    val got = byName("node_jaccard_linkpred").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    got.foreach { case ((x, y), (cn, pm)) =>
      assert(!und.contains((x, y)), s"($x,$y) is already an edge")
      val inter = (nbrs(x) intersect nbrs(y)).size.toLong
      val union = (nbrs(x) union nbrs(y)).size.toLong
      assert(cn === inter, s"($x,$y) common-neighbor count")
      assert(pm === 1000L * inter / union, s"($x,$y) jaccard")
      assert(pm >= 250L, s"($x,$y) under threshold")
    }
    // completeness over all 2-hop non-adjacent pairs
    val expected = for {
      x <- nbrs.keys; w <- nbrs(x); y <- nbrs(w)
      if x < y && !und.contains((x, y))
      inter = (nbrs(x) intersect nbrs(y)).size.toLong
      if inter > 0
      union = (nbrs(x) union nbrs(y)).size.toLong
      if 1000L * inter / union >= 250L
    } yield (x, y)
    assert(got.keySet === expected.toSet)
  }

  test("graph_reciprocity: k out-degree, exact reciprocal counts") {
    val rows = byName("graph_reciprocity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 300)
    rows.foreach { case (v, outDeg, nRec, pm) =>
      assert(outDeg === 3L, s"node $v out-degree")
      val rec = edges.count { case (s, d) =>
        s == v && edges.contains((d, s)) }
      assert(nRec === rec.toLong, s"node $v reciprocal count")
      assert(pm === 1000L * nRec / outDeg, s"node $v permille")
    }
  }

  test("degree_assortativity: exact moments and Cauchy-Schwarz bound") {
    val degs = nbrs.map { case (k, v) => k -> v.size.toLong }
    val ps = und.toSeq.flatMap { case (a, b) =>
      Seq((degs(a), degs(b)), (degs(b), degs(a))) }
    val m2 = ps.size.toLong
    val sj = ps.map(_._1).sum
    val sk = ps.map(_._2).sum
    val sjk = ps.map(p => p._1 * p._2).sum
    val sjj = ps.map(p => p._1 * p._1).sum
    val skk = ps.map(p => p._2 * p._2).sum
    val r = byName("degree_assortativity").collect().head
    assert(r.getLong(0) === m2)
    assert(r.getLong(1) === m2 * sjk - sj * sk)
    assert(r.getLong(2) === m2 * sjj - sj * sj)
    assert(r.getLong(3) === m2 * skk - sk * sk)
    // symmetric orientation: var terms equal, covariance bounded
    assert(r.getLong(2) === r.getLong(3), "orientation symmetry broken")
    assert(BigInt(r.getLong(1)).pow(2) <=
      BigInt(r.getLong(2)) * BigInt(r.getLong(3)), "|r| > 1")
  }

  test("local_bridge_edges: one row per edge, exact wedge counts") {
    val rows = byName("local_bridge_edges").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === und.size, "row per undirected edge")
    rows.foreach { case (a, b, cn, bridge) =>
      val inter = (nbrs(a) intersect nbrs(b)).size.toLong
      assert(cn === inter, s"($a,$b) common neighbors")
      assert(bridge === (if (inter == 0) 1L else 0L), s"($a,$b) flag")
    }
    assert(rows.exists(_._4 == 0L), "no triangle-supported edge found")
  }
}
