package graft

import org.apache.spark.sql.functions._

/** Batch-28 invariants: the governance summaries recomputed exactly. */
class Curation34Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  private lazy val docs: Array[(Long, String, String, String, Long)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))

  test("dataset_card_summary: every field recomputed") {
    val toks = docs.flatMap(_._2.split(" "))
    val n = docs.length.toLong
    val sorted = docs.map(_._5).sorted
    val dups = docs.groupBy(_._2).values.map(_.length - 1).sum.toLong
    val r = byName("dataset_card_summary").collect().head
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === docs.map(_._3).distinct.length.toLong)
    assert(r.getLong(2) === docs.map(_._4).distinct.length.toLong)
    assert(r.getLong(3) === toks.length.toLong)
    assert(r.getLong(4) === toks.distinct.length.toLong)
    assert(r.getLong(5) === docs.map(_._5).sum)
    assert(r.getLong(6) === docs.map(_._5).sum / n)
    assert(r.getLong(7) === sorted(((n + 1) / 2 - 1).toInt))
    assert(r.getLong(8) === dups)
    assert(r.getLong(9) === 1000L * dups / n)
  }

  test("mixture_token_budget_planner: exact budget, exact allocation") {
    val avail = docs.groupBy(_._4).view
      .mapValues(_.map(_._2.split(" ").length.toLong).sum).toMap
    val w = avail.view.mapValues(a =>
      math.floor(math.sqrt(a.toDouble) * 1000).toLong).toMap
    val wtot = w.values.sum
    val base = w.view.mapValues(x => 1000000L * x / wtot).toMap
    val rem = w.map { case (s, x) => s -> 1000000L * x % wtot }
    val leftover = 1000000L - base.values.sum
    val ranked = rem.toSeq.sortBy { case (s, r) => (-r, s) }.map(_._1)
      .zipWithIndex.map { case (s, i) => s -> (i + 1L) }.toMap
    val got = byName("mixture_token_budget_planner").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(got.keySet === avail.keySet)
    assert(got.values.map(_._2).sum === 1000000L, "budget not exact")
    got.foreach { case (s, (av, quota, epochs)) =>
      assert(av === avail(s), s"$s avail")
      val expQ = base(s) + (if (ranked(s) <= leftover) 1L else 0L)
      assert(quota === expQ, s"$s quota")
      assert(epochs === 1000L * quota / math.max(av, 1L), s"$s epochs")
    }
  }

  test("pipeline_stage_funnel: chained stages, exact counts") {
    val k1 = docs.map(d => d._5 >= 100 && d._5 <= 2000)
    val k2 = docs.map(d => Set("en", "de", "fr")(d._3))
    val k3 = docs.map { d =>
      val wl = d._5 / math.max(d._2.split(" ").length.toLong, 1L)
      wl >= 3 && wl <= 12
    }
    val firstOfHash = docs.groupBy(_._2).values
      .map(g => g.minBy(_._1)._1).toSet
    val k4 = docs.map(d => firstOfHash(d._1))
    val n0 = docs.length.toLong
    val n1 = docs.indices.count(i => k1(i)).toLong
    val n2 = docs.indices.count(i => k1(i) && k2(i)).toLong
    val n3 = docs.indices.count(i => k1(i) && k2(i) && k3(i)).toLong
    val n4 = docs.indices.count(i =>
      k1(i) && k2(i) && k3(i) && k4(i)).toLong
    val expected = Map(
      "length_gate" -> (n0, n1), "lang_gate" -> (n1, n2),
      "word_len_gate" -> (n2, n3), "exact_dedup" -> (n3, n4))
    val got = byName("pipeline_stage_funnel").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (stage, (in, out)) =>
      val (gi, go, dr, pm) = got(stage)
      assert((gi, go) === ((in, out)), s"$stage counts")
      assert(dr === in - out)
      assert(pm === 1000L * (in - out) / math.max(in, 1L))
    }
  }

  test("gate_agreement_kappa: exact contingency table and kappa") {
    val a = docs.map(d => d._5 >= 150 && d._5 <= 1500)
    val b = docs.map { d =>
      val wl = d._5 / math.max(d._2.split(" ").length.toLong, 1L)
      wl >= 4 && wl <= 9
    }
    val n = docs.length.toLong
    val n11 = docs.indices.count(i => a(i) && b(i)).toLong
    val n10 = docs.indices.count(i => a(i) && !b(i)).toLong
    val n01 = docs.indices.count(i => !a(i) && b(i)).toLong
    val n00 = docs.indices.count(i => !a(i) && !b(i)).toLong
    val exp = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    val r = byName("gate_agreement_kappa").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((n, n11, n10, n01, n00)))
    assert(r.getLong(5) === 1000L * (n11 + n00) / n)
    assert(r.getLong(6) ===
      1000L * (n * (n11 + n00) - exp) / (n * n - exp))
  }
}
