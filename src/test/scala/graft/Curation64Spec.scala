package graft

import org.apache.spark.sql.functions._

/** Laws of the Welch test the oracle's algebra mirror cannot
  * independently confirm: a driver replay from raw values with the
  * SAME integer floors, plus the Welch-Satterthwaite dof bracketing. */
class Curation64Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("welch_t_lang_pair equals the moment replay with identical " +
    "integer floors; dof inside the Welch-Satterthwaite bracket") {
    val rows = Tables.documents(spark, sfDir)
      .filter(col("lang").isin("en", "de"))
      .select(col("lang"), col("n_chars")).collect()
    val xs = rows.filter(_.getString(0) == "en").map(_.getLong(1))
    val ys = rows.filter(_.getString(0) == "de").map(_.getLong(1))
    val r = byName("welch_t_lang_pair").collect().head
    def moments(a: Array[Long]) =
      (a.length.toLong, a.sum, a.map(v => v * v).sum)
    val (na, sa, qa) = moments(xs); val (nb, sb, qb) = moments(ys)
    val mean1 = sa * 1000 / na; val mean2 = sb * 1000 / nb
    val var1 = (qa * na - sa * sa) * 1000 / (na * (na - 1))
    val var2 = (qb * nb - sb * sb) * 1000 / (nb * (nb - 1))
    val a = var1 / na; val b = var2 / nb
    val t2 = (mean1 - mean2) * (mean1 - mean2) / (a + b)
    val dof = (a + b) * (a + b) / (a * a / (na - 1) + b * b / (nb - 1))
    assert(r.getLong(0) === na && r.getLong(1) === nb)
    assert(r.getLong(2) === mean1 && r.getLong(3) === mean2)
    assert(r.getLong(4) === var1 && r.getLong(5) === var2)
    assert(r.getLong(6) === t2, s"t2 ${r.getLong(6)} != replay $t2")
    assert(r.getLong(7) === dof, s"dof ${r.getLong(7)} != replay $dof")
    // Welch-Satterthwaite bracketing (integer floors can undershoot
    // the real-valued lower bound by at most 1)
    assert(dof >= math.min(na, nb) - 2 && dof <= na + nb - 2,
      s"dof $dof outside [min(n)-2, n1+n2-2]")
    // forward direction only: equal e3 means force t^2 = 0.  (The
    // converse is NOT a theorem under integer floors — a nonzero mean
    // gap smaller than the pooled variance term floors t^2 to 0.)
    if (mean1 == mean2) assert(t2 === 0L)
  }
}
