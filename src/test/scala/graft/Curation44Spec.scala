package graft

import org.apache.spark.sql.functions._

/** Batch-38 invariants: confusable-pair soundness, calendar laws,
  * DW recompute, ABC partition laws. */
class Curation44Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("confusable_token_pairs: sound distances, ordered, deduped") {
    val got = byName("confusable_token_pairs").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.nonEmpty)
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length)
    }
    got.foreach { case (a, b, d) =>
      assert(a < b)
      assert(d >= 1 && d <= 2)
      assert(d === lev(a, b).toLong, s"pair ($a,$b)")
      assert(a.split("_")(0) === b.split("_")(0), s"block ($a,$b)")
      assert(math.abs(a.length - b.length) <= 2)
    }
    assert(got.map(p => (p._1, p._2)).distinct.length === got.length)
  }

  test("calendar_dim_build: contiguous spine, field laws") {
    val got = byName("calendar_dim_build").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7)))
      .sortBy(_._1)
    val dayUs = 86400000000L
    assert(got.length >= 365)
    got.sliding(2).foreach {
      case Array(a, b) => assert(b._1 - a._1 === dayUs, "gap in spine")
      case _ =>
    }
    got.foreach { case (us, yr, qtr, mo, dom, dow, we, ms) =>
      assert(us % dayUs === 0L)
      assert(qtr === (mo - 1) / 3 + 1)
      assert(dow === (us / dayUs + 3) % 7)
      assert(we === (dow >= 5))
      assert(ms === (dom == 1L))
      assert(yr >= 1995 && yr <= 2001)
      // cross-check dow against java.time
      val ld = java.time.LocalDate.ofEpochDay(us / dayUs)
      assert(dow === (ld.getDayOfWeek.getValue - 1).toLong,
        s"dow mismatch at $ld")
    }
  }

  test("durbin_watson_daily: exact recompute, range sanity") {
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(date_trunc('DAY', ts))").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = byName("durbin_watson_daily").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    daily.groupBy(_._1).foreach { case (et, xs) =>
      val cs = xs.sortBy(_._2).map(_._3)
      val n = cs.length.toLong
      val ssum = cs.sum
      val num = cs.zip(cs.drop(1)).map { case (a, b) =>
        n * n * (b - a) * (b - a) }.sum
      val den = cs.map(c => (n * c - ssum) * (n * c - ssum)).sum
      val (nDays, dw) = got(et)
      assert(nDays === n)
      assert(dw === 1000L * num / math.max(den, 1L), s"type $et")
      assert(dw >= 0 && dw <= 4000, s"type $et dw $dw")
    }
  }

  test("abc_part_classification: partition laws, monotone classes") {
    val got = byName("abc_part_classification").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.nonEmpty)
    val total = got.map(_._2).sum
    val ordered = got.sortBy(p => (-p._2, p._1))
    var cum = 0L
    ordered.foreach { case (pk, rev, share, cls) =>
      cum += rev
      assert(share === 1000L * cum / total, s"part $pk")
      val expected = if (100 * cum <= 80 * total) "A"
        else if (100 * cum <= 95 * total) "B" else "C"
      assert(cls === expected, s"part $pk")
    }
    // class sequence along the ranking is monotone A* B* C*
    val seq = ordered.map(_._4).mkString
    assert("^A*B*C*$".r.findFirstIn(seq).isDefined, "non-monotone classes")
    assert(Set("A", "B", "C").subsetOf(got.map(_._4).toSet))
  }
}
