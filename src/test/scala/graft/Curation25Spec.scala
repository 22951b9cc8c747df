package graft

import org.apache.spark.sql.functions._
import graft.queries.VectorQueries

/** Batch-19 invariants: hard-negative definition, in-batch negative
  * completeness, margin sign law, and an exact sequential replay of the
  * herding recurrence. */
class Curation25Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  private lazy val ranked = VectorQueries.rankedRelevant(spark, sfDir)
    .select(col("qid"), col("cid"), col("rank"), col("relevant"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))

  test("hard_negative_mining: negatives sit strictly above the first hit") {
    val firstHit = ranked.filter(_._4).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._3).min }
    val posOf = ranked.filter(_._4).groupBy(_._1)
      .map { case (q, rs) => q -> rs.minBy(_._3)._2 }
    val got = byName("hard_negative_mining").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length <= 2, s"qid $q over the 2-negative cap")
    }
    got.foreach { case (q, pos, neg, negRank) =>
      assert(pos === posOf(q), s"qid $q pos_id")
      assert(negRank < firstHit(q), s"qid $q negative not above first hit")
      val isRel = ranked.find(r => r._1 == q && r._2 == neg).get._4
      assert(!isRel, s"qid $q mined a relevant doc as negative")
    }
    // completeness: a query whose first hit is at rank 1 mines nothing,
    // every other query with >=1 above-hit negative appears
    val expectedQids = firstHit.filter(_._2 > 1).keySet
    assert(got.map(_._1).toSet === expectedQids)
  }

  test("dpr_inbatch_negatives: complete within batch, label flags exact") {
    val labels = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = byName("dpr_inbatch_negatives").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val batchOf = rows.map(r => r._1 -> r._2).toMap
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val others = batchOf.filter { case (oq, b) =>
        oq != q && b == batchOf(q) }.keySet
      assert(rs.map(_._3).toSet === others,
        s"qid $q in-batch negatives incomplete")
    }
    rows.foreach { case (q, _, nq, _, fn) =>
      assert(fn === (if (labels(q) == labels(nq)) 1L else 0L),
        s"($q,$nq) false_negative flag")
    }
  }

  test("triplet_margin_audit: every margin non-positive, counts bounded") {
    val rows = byName("triplet_margin_audit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (q, n, worst, closest) =>
      assert(n >= 1L && n <= 2L, s"qid $q triplet count $n")
      assert(worst <= closest, s"qid $q min/max inverted")
      assert(closest <= 0L,
        s"qid $q has a positive margin — neg not actually ranked above pos")
    }
  }

  test("herding_coreset_select: exact replay of the integer recurrence") {
    val cand = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 100)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1e6).toLong))
      .sortBy(_._1)
    val dims = cand.head._2.indices
    val sums = dims.map(i => cand.map(_._2(i)).sum)
    var w = sums.toArray
    var excluded = Set.empty[Long]
    val expected = (1 to 3).map { k =>
      val (cid, score) = cand.filter(c => !excluded.contains(c._1))
        .map { case (id, phi) =>
          id -> dims.map(i => phi(i) * w(i)).sum }
        .maxBy { case (id, sc) => (sc, -id) }
      excluded += cid
      val phi = cand.find(_._1 == cid).get._2
      w = dims.map(i => w(i) + sums(i) - 100L * phi(i)).toArray
      (k.toLong, cid, score)
    }
    val got = byName("herding_coreset_select").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq === expected)
  }
}
