package graft

import org.apache.spark.sql.functions._

/** Batch-12 invariants: NDCG bounds and driver recompute, MRR cutoff
  * laws, tie-aware AUC recompute, calibration-bin totals/monotonicity. */
class Curation18Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  private val discE6 = Seq(1000000L, 630929L, 500000L, 430676L, 386852L,
    356207L, 333333L, 315464L, 301029L, 289064L)

  test("ndcg_at_10: bounded, dcg<=idcg, matches driver recompute") {
    val ranked = graft.queries.VectorQueries.rankedRelevant(spark, sfDir)
      .select(col("qid"), col("rank"), col("relevant")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byQ = ranked.groupBy(_._1)
    val got = byName("ndcg_at_10").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.size === 20)
    byQ.foreach { case (qid, rows) =>
      val dcg = rows.filter(r => r._3 && r._2 <= 10)
        .map(r => discE6(r._2.toInt - 1)).sum
      val nrel = rows.count(_._3).toLong
      val idcg = if (nrel == 0) 0L
        else discE6.take(math.min(nrel, 10L).toInt).sum
      val ndcg = if (idcg == 0) 0L else dcg * 1000000L / idcg
      val (gd, gi, gn) = got(qid)
      assert(gd === dcg, s"qid $qid dcg")
      assert(gi === idcg, s"qid $qid idcg")
      assert(gn === ndcg, s"qid $qid ndcg")
      assert(gd <= gi, s"qid $qid dcg>idcg")
      assert(gn >= 0L && gn <= 1000000L, s"qid $qid ndcg range")
    }
  }

  test("mrr_at_10: rr3 <= rr10, values on the reciprocal grid") {
    val rows = byName("mrr_at_10").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 20)
    val grid = (1L to 10L).map(1000000L / _).toSet + 0L
    rows.foreach { case (qid, rr10, rr3) =>
      assert(rr3 <= rr10, s"qid $qid cutoff monotonicity")
      assert(grid.contains(rr10), s"qid $qid rr10 off-grid")
      assert(rr3 === 0L || rr3 === rr10, s"qid $qid rr3 grid")
    }
  }

  test("auc_rank_sum matches an O(n^2) driver recompute") {
    val sc = Tables.embeddings(spark, sfDir)
      .select(
        floor(element_at(col("embedding"), 1).cast("double") * 1000)
          .cast("long"),
        when(col("label") < 5, lit(1L)).otherwise(lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pos = sc.filter(_._2 == 1L).map(_._1)
    val neg = sc.filter(_._2 == 0L).map(_._1)
    var u2 = 0L
    for (p <- pos; n <- neg)
      u2 += (if (p > n) 2L else if (p == n) 1L else 0L)
    val expected = u2 * 500000L / (pos.length.toLong * neg.length)
    val row = byName("auc_rank_sum").collect().head
    assert(row.getLong(0) === pos.length.toLong)
    assert(row.getLong(1) === neg.length.toLong)
    assert(row.getLong(2) === expected)
    assert(row.getLong(2) >= 0L && row.getLong(2) <= 1000000L)
  }

  test("calibration_bins: partition of rows, rates bounded, scores ordered") {
    val rows = byName("calibration_bins").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1L to 10L))
    val total = Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_._2).sum === total)
    rows.foreach { case (bin, n, nPos, _, rate) =>
      assert(nPos <= n, s"bin $bin pos>n")
      assert(rate >= 0L && rate <= 1000L, s"bin $bin rate range")
      assert(rate === 1000L * nPos / n, s"bin $bin rate recompute")
    }
    // ntile over ascending score: bin mean scores are nondecreasing
    val means = rows.map(_._4)
    assert(means.zip(means.tail).forall { case (a, b) => a <= b },
      "bin mean scores not sorted")
  }
}
