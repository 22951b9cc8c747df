package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the statistical-profiling operators —
  * properties beyond the driver's oracle hash-parity: agreement with
  * Spark's own float estimators (within float tolerance), scale/bound
  * laws, and residual orthogonality of the OLS fit. */
class StatsSpec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("grouped_ols_trend matches Spark's regr_slope within float tolerance") {
    val ours = byName("grouped_ols_trend").select(col("lang"), col("slope"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ref = Tables.documents(spark, sfDir)
      .select(col("lang"),
        size(split(col("text"), " ")).cast("double").as("x"),
        col("n_chars").cast("double").as("y"))
      .groupBy(col("lang")).agg(expr("regr_slope(y, x)").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ref.foreach { case (lang, s) =>
      assert(math.abs(ours(lang) - s) < 1e-6 * math.max(1.0, math.abs(s)),
        s"lang=$lang ours=${ours(lang)} regr_slope=$s")
    }
  }

  test("pearson_corr_lang matches corr() and lies in [-1, 1]") {
    val ours = byName("pearson_corr_lang").select(col("lang"), col("pearson_r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ref = Tables.documents(spark, sfDir)
      .select(col("lang"),
        size(split(col("text"), " ")).cast("double").as("x"),
        col("n_chars").cast("double").as("y"))
      .groupBy(col("lang")).agg(corr(col("y"), col("x")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ours.values.foreach(r => assert(r >= -1.0 && r <= 1.0))
    // token count and char length are strongly positively correlated in
    // the word-soup fixture — a sign flip would indicate a moment bug
    ours.values.foreach(r => assert(r > 0.5, s"suspiciously low corr $r"))
    ref.foreach { case (lang, c) =>
      assert(math.abs(ours(lang) - c) < 1e-6, s"lang=$lang ours=${ours(lang)} corr=$c")
    }
  }

  test("two_proportion_ztest: z2 nonnegative, counts consistent") {
    val r = byName("two_proportion_ztest").head()
    val (x1, n1, x2, n2) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val z2 = r.getDouble(4)
    assert(x1 <= n1 && x2 <= n2)
    assert(n1 > 0 && n2 > 0)
    assert(z2 >= 0.0 && !z2.isNaN)
    // recompute in plain scala — same formula, must agree bitwise
    val d = (x1 * n2 - x2 * n1).toDouble
    val expected = d * d * (n1 + n2).toDouble /
      ((n1 * n2).toDouble * (x1 + x2).toDouble * (n1 + n2 - x1 - x2).toDouble)
    assert(z2 == expected)
  }

  test("gini_length_concentration bounded in [0, 1e6) and permutation-proof") {
    val g = byName("gini_length_concentration")
    val vals = g.select(col("gini_e6")).collect().map(_.getLong(0))
    assert(vals.nonEmpty)
    vals.foreach(v => assert(v >= 0 && v < 1000000L, s"gini_e6 $v out of range"))
    // equal-mass distribution has gini ~ 0: verify on a synthetic column
    import spark.implicits._
    val equal = Seq.fill(100)(7L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("doc_id", "n_chars")
      .withColumn("source", lit("s"))
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    val g0 = equal.withColumn("i", row_number().over(rankW).cast("long"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("sx"), sum(col("i") * col("n_chars")).as("six"))
      .select(expr("(1000000 * (2*six - (n+1)*sx)) div (n * sx)").as("gini_e6"))
      .head().getLong(0)
    assert(g0 == 0L)
  }

  test("benford_first_digit: digits 1-9, counts sum to orders, permille ~ 1000") {
    val b = byName("benford_first_digit").collect()
    val digits = b.map(_.getLong(0))
    assert(digits.forall(d => d >= 1 && d <= 9))
    assert(digits.distinct.length == digits.length)
    val totalCnt = b.map(_.getLong(1)).sum
    assert(totalCnt == Tables.orders(spark, sfDir).count())
    val permilleSum = b.map(_.getLong(2)).sum
    // floor rounding loses at most 1 permille per digit
    assert(permilleSum > 1000 - 9 && permilleSum <= 1000)
  }

  test("incremental_moments_merge equals the full-scan computation") {
    val merged = byName("incremental_moments_merge").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val direct = Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s1"),
        sum(col("n_chars") * col("n_chars")).as("s2"))
      .select(col("lang"), col("n"),
        expr("(1000 * s1) div n").as("mean_e3"),
        expr("(1000000 * (n * s2 - s1 * s1)) div (n * n)").as("var_e6"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(merged == direct)
  }

  test("mann_whitney_u: U identity holds, effect bounded") {
    val r = byName("mann_whitney_u").head()
    val (n1, n2, u1, u2, rb) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(u1 + u2 == 2 * n1 * n2) // U1 + U2 = n1*n2 (doubled form)
    assert(u1 >= 0 && u2 >= 0)
    assert(rb >= -1000 && rb <= 1000)
  }

  test("weighted_median_length matches a driver-side recompute") {
    val got = byName("weighted_median_length").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("w")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2))
      val tot = sorted.map(_._4).sum
      var cum = 0L
      val wm = sorted.find { r => cum += r._4; cum * 2 >= tot }.get._3
      assert(got(src) == ((wm, tot)), s"source $src")
    }
  }

  test("spearman_rho_lang bounded and strongly positive on this corpus") {
    val rhos = byName("spearman_rho_lang").collect()
      .map(r => r.getString(0) -> r.getDouble(2))
    assert(rhos.nonEmpty)
    rhos.foreach { case (l, rho) =>
      assert(rho >= -1.0 && rho <= 1.0, s"lang $l rho $rho")
      assert(rho > 0.5, s"lang $l suspiciously low rho $rho")
    }
  }

  test("mad_outlier_flag: every flagged row satisfies 2*dev > 3*mad, and " +
    "no unflagged doc does") {
    val flagged = byName("mad_outlier_flag")
    assert(flagged.filter(col("dev") * 2 <= col("mad") * 3).count() == 0)
    // independent recomputation of per-lang lower medians
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def lowerMedian(xs: Seq[Long]): Long = {
      val sorted = xs.sorted
      sorted((sorted.length + 1) / 2 - 1)
    }
    val med = docs.groupBy(_._2).map { case (l, rs) =>
      l -> lowerMedian(rs.map(_._3).toSeq)
    }
    val dev = docs.map { case (id, l, c) => (id, l, math.abs(c - med(l))) }
    val mad = dev.groupBy(_._2).map { case (l, rs) =>
      l -> lowerMedian(rs.map(_._3).toSeq)
    }
    val expect = dev.filter { case (_, l, dv) => dv * 2 > 3 * mad(l) }
      .map(_._1).toSet
    val got = flagged.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got == expect)
  }
}
