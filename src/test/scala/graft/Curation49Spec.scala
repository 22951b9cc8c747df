package graft

import org.apache.spark.sql.functions._

/** Batch-49 invariants: preference-pair mining, length-bias audit, and
  * GRPO advantage normalization — each recomputed independently on the
  * driver from the raw documents fixture. */
class Curation49Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  // (doc_id, source, lang, score_e3, len) replica of the scored CTE
  private lazy val scoredDocs: Seq[(Long, String, String, Long, Long)] = {
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .collect().toSeq.map { r =>
      val (id, src, lang, t) =
        (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))
      val toks = t.split(" ", -1)
      val score = toks.distinct.length.toLong * 1000L / toks.length +
        math.min(t.length.toLong, 400L)
      (id, src, lang, score, t.length.toLong)
    }
  }

  private lazy val pairsExpected
      : Set[(String, String, Long, Long, Long, Long)] =
    scoredDocs.groupBy(d => (d._2, d._3)).flatMap { case ((src, lang), ds) =>
      val chosen = ds.minBy(d => (-d._4, d._1))
      val rejected = ds.minBy(d => (d._4, d._1))
      val margin = chosen._4 - rejected._4
      if (margin >= 1)
        Some((src, lang, chosen._1, rejected._1, margin,
          chosen._5 - rejected._5))
      else None
    }.toSet

  test("preference_pair_mining: exact driver replay") {
    val got = byName("preference_pair_mining").collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === pairsExpected)
  }

  test("preference_pair_mining: chosen differs from rejected, margin " +
    "positive, both ids in the group") {
    val byGroup = scoredDocs.groupBy(d => (d._2, d._3))
      .view.mapValues(_.map(_._1).toSet).toMap
    pairsExpected.foreach { case (src, lang, c, r, m, _) =>
      assert(c != r && m >= 1)
      assert(byGroup((src, lang)).contains(c))
      assert(byGroup((src, lang)).contains(r))
    }
  }

  test("dpo_length_bias_audit: accounting ties out against the pairs") {
    val expected = pairsExpected.toSeq.groupBy(_._2).map {
      case (lang, ps) =>
        (lang, ps.size.toLong, ps.count(_._6 > 0).toLong,
          ps.count(_._6 < 0).toLong, ps.map(_._6).sum)
    }.toSet
    val got = byName("dpo_length_bias_audit").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expected)
    // internal law: longer + shorter + ties = n_pairs
    got.foreach { case (_, n, lo, sh, _) => assert(lo + sh <= n) }
  }

  test("grpo_advantage_normalize: exact driver replay, near-zero group " +
    "mean") {
    val expected = scoredDocs.groupBy(_._2).flatMap { case (src, ds) =>
      val n = ds.size.toLong
      val sm = ds.map(_._4).sum
      val sq = ds.map(d => d._4 * d._4).sum
      val nstd = math.max(math.sqrt((n * sq - sm * sm).toDouble).toLong, 1L)
      ds.map(d => (d._1, src, (n * d._4 - sm) * 1000L / nstd))
    }.toSet
    val got = byName("grpo_advantage_normalize").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expected)
    // the raw (pre-truncation) advantages sum to zero per group; after
    // integer truncation the group sum stays within n of zero
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(math.abs(rows.toSeq.map(_._3).sum) <= rows.size * 1000L)
    }
  }
}
