package graft

import org.apache.spark.sql.functions._

/** Batch-7 invariants: OLS residual screen and Ochiai similarity. */
class Curation13Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("ols_residual_outliers recomputes fit, residuals, and threshold") {
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("x"),
        length(col("text")).cast("long").as("y"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val got = byName("ols_residual_outliers").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    base.groupBy(_._2).foreach { case (lang, docs) =>
      val n = docs.size.toLong
      val sx = docs.map(_._3).sum; val sy = docs.map(_._4).sum
      val sxx = docs.map(d => d._3 * d._3).sum
      val sxy = docs.map(d => d._3 * d._4).sum
      val syy = docs.map(d => d._4 * d._4).sum
      val b = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      val a = (sy.toDouble - b * sx.toDouble) / n.toDouble
      val sdr = math.sqrt(
        (syy.toDouble - a * sy.toDouble - b * sxy.toDouble) / n.toDouble)
      docs.foreach { case (id, _, x, y) =>
        val r = y.toDouble - a - b * x.toDouble
        if (math.abs(r) > 2.0 * sdr)
          assert(got.get(id).contains(math.floor(r * 1000).toLong),
            s"doc $id should be flagged with ${math.floor(r * 1000)}")
        else assert(!got.contains(id), s"doc $id spuriously flagged")
      }
    }
    // the screen flags a small minority, not the bulk
    assert(got.size > 0 && got.size < base.length / 10)
  }

  test("item_cooccurrence_cosine recomputes from incidence sets") {
    val ut = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byType = ut.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val got = byName("item_cooccurrence_cosine").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val types = byType.keys.toSeq.sorted
    for (i <- types.indices; j <- (i + 1) until types.length) {
      val (a, b) = (types(i), types(j))
      val both = byType(a).intersect(byType(b)).size.toLong
      if (both > 0) {
        val want = math.floor(both.toDouble * 1000 /
          math.sqrt((byType(a).size.toLong * byType(b).size).toDouble))
          .toLong
        assert(got((a, b)) === ((both, want)), s"pair ($a,$b)")
        // Ochiai is bounded by 1000 and by each marginal containment
        assert(want <= 1000L)
      } else assert(!got.contains((a, b)))
    }
  }
}
