package graft

import org.apache.spark.sql.functions._

/** Batch-50 invariants: FIM split conservation, padding-waste
  * accounting, and per-source novelty — driver-side replays from the
  * raw documents fixture. */
class Curation50Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  private lazy val docs: Seq[(Long, String, String)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text")).collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("fim_split_plan: exact replay, spans conserve the token count") {
    val expected = docs.map { case (id, _, t) =>
      (id, t.split(" ", -1).length.toLong)
    }.filter(_._2 >= 5).map { case (id, n) =>
      val p = n * 2 / 5
      val m = n * 3 / 5 - p
      val s = n - n * 3 / 5
      (id, n, p, m, s, n + 3)
    }.toSet
    val got = byName("fim_split_plan").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === expected)
    got.foreach { case (_, n, p, m, s, psm) =>
      assert(p + m + s === n); assert(psm === n + 3)
      assert(p >= 1 && m >= 1 && s >= 1) // n >= 5 guarantees all parts
    }
  }

  test("seq_length_bins_waste: exact replay, waste nonnegative, " +
    "fill <= 1000") {
    val bins = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L)
    val expected = docs.map(d => d._3.split(" ", -1).length.toLong)
      .groupBy(n => bins.find(n <= _).getOrElse(4096L))
      .map { case (bin, ns) =>
        val nd = ns.size.toLong; val st = ns.sum
        (bin, nd, st, nd * bin - st, st * 1000L / (nd * bin))
      }.toSet
    val got = byName("seq_length_bins_waste").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expected)
    got.foreach { case (_, _, _, waste, fill) =>
      assert(waste >= 0 && fill >= 0 && fill <= 1000)
    }
  }

  test("cross_source_novelty: exact replay, exclusive <= total") {
    val bySource = docs.flatMap { case (_, src, t) =>
      val toks = t.split(" ", -1)
      if (toks.length < 4) Seq.empty
      else (0 to toks.length - 4)
        .map(i => (src, toks.slice(i, i + 4).mkString(" ")))
    }.distinct
    val spread = bySource.groupBy(_._2).view.mapValues(_.size).toMap
    val expected = bySource.groupBy(_._1).map { case (src, gs) =>
      val n = gs.size.toLong
      val excl = gs.count(g => spread(g._2) == 1).toLong
      (src, n, excl, excl * 1000L / n)
    }.toSet
    val got = byName("cross_source_novelty").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
    got.foreach { case (_, n, excl, _) => assert(excl <= n) }
  }
}
