package graft

import org.apache.spark.sql.functions._

/** Batch-32 invariants: sampling estimator accuracy, cap and fill laws,
  * container-model recompute. */
class Curation38Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  private lazy val docs: Array[(Long, String, Long, Long)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        size(split(col("text"), " ")).cast("long")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("budgeted_topk_per_source: caps respected, selection exact") {
    val got = byName("budgeted_topk_per_source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.length === math.min(50, docs.length))
    got.groupBy(_._2).foreach { case (src, rows) =>
      assert(rows.length <= 5, s"source $src over cap")
    }
    // replay: per-source top-5 then global top-50
    val capped = docs.groupBy(_._2).values.flatMap { g =>
      g.sortBy(d => (-d._3, d._1)).take(5)
    }.toSeq
    val expected = capped.sortBy(d => (-d._3, d._1)).take(50)
      .map(d => (d._1, d._2, d._3)).toSet
    assert(got.map(g => (g._1, g._2, g._3)).toSet === expected)
  }

  test("priority_sample_estimator: exact replay, bounded error") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def u48(id: Long): Long = {
      val h = md.digest(s"pri$id".getBytes("UTF-8"))
        .take(6).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h, 16) + 1L
    }
    val qs = docs.map { d =>
      (d._1, d._4, d._4.toDouble / (u48(d._1).toDouble / 2.81474976710656e14))
    }.sortBy(q => (-q._3, q._1))
    val trueTotal = docs.map(_._4).sum
    val r = byName("priority_sample_estimator").collect().head
    assert(r.getLong(0) === 50L)
    assert(r.getLong(1) === trueTotal)
    val tau = math.floor(qs(50)._3 * 1e6).toLong
    val est = qs.take(50).map(q => math.max(q._2 * 1000000L, tau)).sum /
      1000000L
    assert(r.getLong(2) === est)
    assert(r.getLong(3) === 1000L * math.abs(est - trueTotal) / trueTotal)
    // the estimator earns its keep: within 25% on this fixture
    assert(r.getLong(3) <= 250L, s"estimator error ${r.getLong(3)} permille")
  }

  test("range_partition_boundaries: complete, ordered, near-uniform") {
    val got = byName("range_partition_boundaries").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(got.map(_._1).toSeq === (0L until 16L))
    assert(got.map(_._2).sum === docs.length.toLong)
    // bounds are non-decreasing across partitions
    got.sliding(2).foreach {
      case Array((_, _, _, hi1, _), (_, _, lo2, _, _)) =>
        assert(lo2 >= hi1, "partition bounds overlap-inverted")
      case _ =>
    }
    // equi-depth: every partition within one row of ideal
    val ideal = docs.length / 16
    got.foreach { case (pid, n, _, _, _) =>
      assert(math.abs(n - ideal) <= 1, s"partition $pid fill $n")
    }
  }

  test("bitmap_index_size_model: exact container choice recompute") {
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val chunks = ds.map(_._1).groupBy(_ / 256)
      val picks = chunks.values.map { ids =>
        val sorted = ids.sorted
        val runs = sorted.indices.count(i =>
          i == 0 || sorted(i) != sorted(i - 1) + 1).toLong
        val ab = sorted.length.toLong * 2
        val bb = 32L
        val rb = runs * 4
        val best = math.min(ab, math.min(bb, rb))
        val container =
          if (rb <= ab && rb <= bb) "run"
          else if (ab <= bb) "array" else "bitmap"
        (container, best)
      }
      src -> (chunks.size.toLong,
        picks.count(_._1 == "array").toLong,
        picks.count(_._1 == "bitmap").toLong,
        picks.count(_._1 == "run").toLong,
        picks.map(_._2).sum)
    }
    val got = byName("bitmap_index_size_model").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got === expected)
  }
}
