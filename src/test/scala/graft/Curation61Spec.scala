package graft

import org.apache.spark.sql.functions._

/** Semantic laws of the hypothesis-test family (curation61) the oracle's
  * hash parity can't state: Pearson identity between the cell table and
  * the statistic, the exact SSB+SSW=SST cancellation, effect-size
  * bounds, and jackknife estimate geometry. */
class Curation61Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("chi_square_cells: completed grid conserves mass and shape") {
    val cells = byName("chi_square_cells").persist()
    val docs = Tables.documents(spark, sfDir)
    // observed mass equals the corpus
    assert(cells.agg(sum(col("o"))).head.getLong(0) === docs.count())
    // the grid is the full lang x bucket cross product
    val nr = cells.select(col("lang")).distinct().count()
    val nc = cells.select(col("len_bucket")).distinct().count()
    assert(cells.count() === nr * nc)
    // expected mass at e3 matches observed mass within one floor per cell
    val eSum = cells.agg(sum(col("e_e3"))).head.getLong(0)
    val oSumE3 = docs.count() * 1000
    assert(eSum <= oSumE3 && eSum > oSumE3 - 1000 * nr * nc)
    cells.unpersist()
  }

  test("chi_square_independence: statistic is the cell-table sum") {
    val stat = byName("chi_square_independence").head
    val cellSum = byName("chi_square_cells")
      .agg(sum(col("cell_chi2_e3"))).head.getLong(0)
    assert(stat.getAs[Long]("chi2_e3") === cellSum)
    val cells = byName("chi_square_cells")
    val nr = cells.select(col("lang")).distinct().count()
    val nc = cells.select(col("len_bucket")).distinct().count()
    assert(stat.getAs[Long]("dof") === (nr - 1) * (nc - 1))
    // the reject flag is exactly the pinned-threshold comparison
    assert(stat.getAs[Boolean]("reject_independence") ===
      (stat.getAs[Long]("chi2_e3") > stat.getAs[Long]("crit_e3")))
  }

  test("cramers_v_assoc: V^2 lands in [0, 1e6] for both pairs") {
    val v = byName("cramers_v_assoc").collect()
    assert(v.map(_.getAs[String]("pair")).toSet ===
      Set("lang_x_len_bucket", "lang_x_source"))
    v.foreach { r =>
      val v2 = r.getAs[Long]("v2_e6")
      assert(v2 >= 0L && v2 <= 1000000L)
    }
  }

  test("anova_f_oneway: SSB + SSW == SST exactly (floors cancel)") {
    val a = byName("anova_f_oneway").head
    // independent SST: sum(x^2) - (sum x)^2 // n over the raw scan
    val t = Tables.documents(spark, sfDir)
      .agg(sum(col("n_chars") * col("n_chars")).as("q"),
        sum(col("n_chars")).as("s"), count(lit(1)).as("n"))
      .select(expr("q - (s * s) div n").as("sst")).head.getLong(0)
    assert(a.getAs[Long]("ssb") + a.getAs[Long]("ssw") === t)
    assert(a.getAs[Long]("ssb") >= 0L && a.getAs[Long]("ssw") > 0L)
  }

  test("jackknife: LOSO estimates bracket the mean, variance non-negative") {
    val inf = byName("jackknife_source_influence").persist()
    val nSources = Tables.documents(spark, sfDir)
      .select(col("source")).distinct().count()
    assert(inf.count() === nSources)
    // every LOSO mean stays inside the raw n_chars support
    val b = Tables.documents(spark, sfDir)
      .agg(min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi")).head
    val bad = inf.filter(
      col("theta_loso_e6") < b.getAs[Long]("lo") * 1000000L ||
        col("theta_loso_e6") > b.getAs[Long]("hi") * 1000000L).count()
    assert(bad === 0)
    // influence decomposition: theta_all - influence == theta_loso
    val thetaAll = Tables.documents(spark, sfDir)
      .agg(expr("(sum(n_chars) * 1000000) div count(*)").as("t"))
      .head.getLong(0)
    val broken = inf.filter(
      lit(thetaAll) - col("influence_e6") =!= col("theta_loso_e6")).count()
    assert(broken === 0)
    inf.unpersist()
    val v = byName("jackknife_variance").head
    assert(v.getAs[Long]("var_jk_e6") >= 0L)
    assert(v.getAs[Long]("k") === nSources)
    // the jackknife mean of LOSO estimates stays within 1 char of the
    // corpus mean (exact equality is not implied by floor arithmetic)
    assert(math.abs(v.getAs[Long]("theta_bar_e6") - thetaAll) <= 1000000L)
  }
}
