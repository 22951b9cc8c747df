package graft

import org.apache.spark.sql.functions._

/** Batch-11 invariants: multi-probe dominance, BPE compression laws,
  * whitening moments. */
class Curation17Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("ann_multiprobe_topk dominates single-probe LSH candidate-wise") {
    val single = byName("ann_lsh_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = byName("ann_multiprobe_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the multi-probe candidate pool is a superset per query, so each
    // query returns at least as many top-3 rows
    val sCount = single.groupBy(_._1).view.mapValues(_.size).toMap
    val mCount = multi.groupBy(_._1).view.mapValues(_.size).toMap
    sCount.foreach { case (qid, n) =>
      assert(mCount.getOrElse(qid, 0) >= n, s"qid $qid lost candidates")
    }
    // multi-probe scores at each rank are >= single-probe scores
    val sBest = byName("ann_lsh_topk").collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(4)).toMap
    val mBest = byName("ann_multiprobe_topk").collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    sBest.foreach { case ((qid, rank), score) =>
      mBest.get((qid, rank)).foreach(ms =>
        assert(ms >= score, s"qid $qid rank $rank regressed"))
    }
  }

  test("bpe_compression_ratio: bounded, consistent, and actually merges") {
    val rows = byName("bpe_compression_ratio").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 100)
    rows.foreach { case (id, before, after, ratio) =>
      assert(after <= before, s"doc $id grew")
      // 5 merges can at most halve (every symbol pair merged)
      assert(after * 2 >= before, s"doc $id shrank impossibly")
      assert(ratio === after * 1000 / before, s"doc $id ratio")
      // charified length law: before = char count (incl. '_' markers)
      assert(before > 0)
    }
    // the corpus-level winner pairs must have bitten: mean ratio < 1000
    val mean = rows.map(_._4).sum / rows.length
    assert(mean < 990, s"merges had no effect: mean ratio $mean")
  }

  test("embedding_whiten matches driver recompute; z stats are standard") {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val x0 = e.map(p => p._1 -> math.floor(p._2(0).toDouble * 1000).toLong)
    val x1 = e.map(p => p._1 -> math.floor(p._2(1).toDouble * 1000).toLong)
    val n = e.length.toLong
    def z(xs: Array[(Long, Long)]): Map[Long, Long] = {
      val sx = xs.map(_._2).sum
      val sxx = xs.map(p => p._2 * p._2).sum
      val den = math.sqrt((n * sxx - sx * sx).toDouble)
      xs.map { case (id, x) =>
        id -> math.floor((n * x - sx).toDouble * 1000 / den).toLong
      }.toMap
    }
    val (w0, w1) = (z(x0), z(x1))
    val got = byName("embedding_whiten").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got.foreach { case (id, (z0, z1)) =>
      assert(z0 === w0(id), s"vec $id z0")
      assert(z1 === w1(id), s"vec $id z1")
    }
    // standardized: mean ~ 0 at e3 scale, sd ~ 1000 (z is *sqrt(n)-free)
    val zs = got.values.map(_._1.toDouble)
    val mean = zs.sum / zs.size
    assert(math.abs(mean) < 5, s"whitened mean $mean")
    val sd = math.sqrt(zs.map(v => (v - mean) * (v - mean)).sum / zs.size)
    assert(sd > 900 && sd < 1100, s"whitened sd $sd")
  }
}
