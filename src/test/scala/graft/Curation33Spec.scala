package graft

import org.apache.spark.sql.functions._

/** Batch-27 invariants: exact Scala replay of the Lloyd substrate and
  * the quantization/probe/stability/residual audits on top of it. */
class Curation33Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  private lazy val vecs: Array[(Long, Int, Array[Long])] =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(v => math.floor(v.toDouble * 1e6).toLong)
          .toArray))

  private def sq(a: Array[Long], b: Array[Long]): Long =
    a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum

  /** 2-pass deterministic Lloyd replay: returns vec_id -> (cluster, dist). */
  private def lloyd(initIds: Seq[Long]): Map[Long, (Long, Long)] = {
    val cents0 = initIds.map(id => id -> vecs.find(_._1 == id).get._3)
    def assign(cents: Seq[(Long, Array[Long])]) =
      vecs.map { case (id, _, v) =>
        val (cid, dist) = cents.map { case (c, cv) => (c, sq(v, cv)) }
          .minBy { case (c, dd) => (dd, c) }
        id -> (cid, dist)
      }.toMap
    val a1 = assign(cents0)
    val cents1 = a1.values.map(_._1).toSeq.distinct.map { c =>
      val members = vecs.filter(v => a1(v._1)._1 == c).map(_._3)
      c -> Array.tabulate(64)(i => members.map(_(i)).sum / members.length)
    }
    assign(cents1)
  }

  test("quantization_error_audit: exact distortion recompute per label") {
    val dims = 0 until 64
    val lo = dims.map(i => vecs.map(_._3(i)).min)
    val span = dims.map(i => vecs.map(_._3(i)).max - lo(i))
    val perVec = vecs.map { case (id, label, v) =>
      val dist = dims.map { i =>
        if (span(i) == 0) 0L
        else {
          val num = 255L * (v(i) - lo(i))
          math.abs(num - (num / span(i)) * span(i))
        }
      }.sum
      (label, dist)
    }
    val expected = perVec.groupBy(_._1).map { case (l, ds) =>
      l -> (ds.length.toLong, ds.map(_._2).sum / ds.length,
        ds.map(_._2).max)
    }
    val got = byName("quantization_error_audit").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === expected)
  }

  test("ann_probe_cost_curve: cumulative worst-case from the Lloyd replay") {
    val sizes = lloyd(0L until 8L).values.groupBy(_._1).view
      .mapValues(_.size.toLong).toSeq
      .sortBy { case (c, s) => (-s, c) }.map(_._2)
    val total = sizes.sum
    val got = byName("ann_probe_cost_curve").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.length === sizes.length)
    got.zipWithIndex.foreach { case ((k, worst, avg, pm), i) =>
      assert(k === i + 1L)
      assert(worst === sizes.take(i + 1).sum, s"nprobe $k worst")
      assert(avg === k * total / 8, s"nprobe $k avg")
      assert(worst >= avg, s"nprobe $k worst below uniform expectation")
      assert(pm === 1000L * worst / avg)
    }
    assert(got.last._2 === total, "full probe must scan everything")
  }

  test("kmeans_assignment_stability: exact Rand-index replay") {
    val a = lloyd(0L until 8L)
    val b = lloyd(8L until 16L)
    val panel = vecs.map(_._1).filter(_ < 100).sorted
    val pairs = for {
      i <- panel.indices; j <- (i + 1) until panel.length
    } yield (panel(i), panel(j))
    val n11 = pairs.count { case (x, y) =>
      a(x)._1 == a(y)._1 && b(x)._1 == b(y)._1 }
    val n00 = pairs.count { case (x, y) =>
      a(x)._1 != a(y)._1 && b(x)._1 != b(y)._1 }
    val r = byName("kmeans_assignment_stability").collect().head
    assert(r.getLong(0) === pairs.length.toLong)
    assert(r.getLong(1) === n11.toLong)
    assert(r.getLong(2) === n00.toLong)
    assert(r.getLong(3) === 1000L * (n11 + n00) / pairs.length)
  }

  test("residual_vector_energy: exact per-cluster energy accounting") {
    val a2 = lloyd(0L until 8L)
    val expected = vecs.groupBy(v => a2(v._1)._1).map { case (c, ms) =>
      val res = ms.map(v => a2(v._1)._2)
      val raw = ms.map(v => sq(v._3, Array.fill(64)(0L)))
      c -> (ms.length.toLong, res.sum / ms.length,
        1000L * res.sum / raw.sum)
    }
    val got = byName("residual_vector_energy").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === expected)
    got.values.foreach { case (_, _, pm) =>
      assert(pm >= 0L && pm <= 1000L, "residual exceeded raw energy")
    }
  }
}
