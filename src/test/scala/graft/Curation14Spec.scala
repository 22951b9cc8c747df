package graft

import org.apache.spark.sql.functions._

/** Batch-8 invariants: KS statistic recompute and conformal coverage
  * guarantee. */
class Curation14Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("ks_two_sample equals a sorted-sample recompute") {
    val lens = Tables.documents(spark, sfDir)
      .filter(col("lang").isin("en", "de"))
      .select(col("lang"), length(col("text")).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val en = lens.filter(_._1 == "en").map(_._2).sorted
    val de = lens.filter(_._1 == "de").map(_._2).sorted
    val n = en.length.toLong; val m = de.length.toLong
    val support = (en ++ de).distinct.sorted
    val dScaled = support.map { v =>
      val fe = en.count(_ <= v).toLong
      val fd = de.count(_ <= v).toLong
      math.abs(fe * m - fd * n)
    }.max
    val r = byName("ks_two_sample").head()
    assert(r.getLong(0) === n && r.getLong(1) === m)
    assert(r.getLong(2) === dScaled)
    assert(r.getLong(3) === dScaled * 1000 / (n * m))
    // D in [0, 1]: scaled bound
    assert(dScaled <= n * m)
  }

  test("conformal_threshold: exact order statistic and coverage near 90%") {
    def nonconf(text: String): Long = {
      val t = text.split(" ", -1)
      1000L - t.distinct.length.toLong * 1000L / t.length
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), nonconf(r.getString(1))))
    val cal = docs.filter(d => bucket(d._1) < 50)
      .sortBy(d => (d._2, d._1))
    val test = docs.filter(d => bucket(d._1) >= 50)
    val ncal = cal.length.toLong
    val rank = ((ncal + 1) * 9 + 9) / 10
    val q90 = cal((rank - 1).toInt)._2
    val covered = test.count(_._2 <= q90).toLong
    val r = byName("conformal_threshold").head()
    assert(r.getLong(0) === q90, "threshold")
    assert(r.getLong(1) === ncal)
    assert(r.getLong(2) === test.length.toLong)
    assert(r.getLong(3) === covered)
    assert(r.getLong(4) === covered * 1000 / test.length)
    // the conformal guarantee: realized coverage >= ~88% (finite-sample
    // slack on a 250-doc test split), and not vacuously 100%
    assert(r.getLong(4) >= 860L && r.getLong(4) < 1000L,
      s"coverage ${r.getLong(4)} outside the plausible band")
  }
}
