package graft

import org.apache.spark.sql.functions._

/** Distributed sketch construction (DataFrameStatFunctions): the
  * pre-filter structures a 100 TB join planner reaches for before any
  * shuffle — a Bloom filter of build-side keys shipped to the probe-side
  * scan, and Count-Min for heavy-hitter estimates. Sketch contents are
  * merge-order-dependent, so these are property tests (no DuckDB
  * oracle): Bloom admits every inserted key (no false negatives) and
  * stays near the requested false-positive rate; CMS never
  * under-counts. */
class SketchSpec extends SparkSpec {

  test("bloom filter over doc ids: zero false negatives, bounded fpp") {
    val docs = Tables.documents(spark, sfDir)
    val bloom = docs.stat.bloomFilter("doc_id", expectedNumItems = 1000,
      fpp = 0.01)
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0))
    assert(ids.forall(bloom.mightContain), "bloom dropped an inserted key")
    // keys far outside the inserted range: ~fpp of them may false-positive
    val probes = (1000000L until 1010000L)
    val fp = probes.count(bloom.mightContain)
    assert(fp < probes.size * 0.05,
      s"false-positive rate ${fp.toDouble / probes.size} >> requested 0.01")
  }

  test("freqItems finds every genuinely frequent event type") {
    val ev = Tables.events(spark, sfDir)
    val found = ev.stat.freqItems(Array("event_type"), support = 0.2)
      .head().getSeq[String](0).toSet
    // any value with true frequency >= support must be reported
    val n = ev.count()
    val truth = ev.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= n * 0.2)
      .collect().map(_.getString(0)).toSet
    assert(truth.subsetOf(found),
      s"freqItems missed ${truth.diff(found)}")
  }

  test("count-min sketch never under-counts event types") {
    val ev = Tables.events(spark, sfDir)
    val cms = ev.stat.countMinSketch("event_type", eps = 0.001,
      confidence = 0.99, seed = 42)
    val truth = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    truth.foreach { case (k, n) =>
      assert(cms.estimateCount(k) >= n, s"CMS under-counted $k")
    }
  }

  test("approx_count_distinct tracks the exact cardinality within rsd") {
    val ev = Tables.events(spark, sfDir)
    val exact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    val approx = ev.select(approx_count_distinct(col("user_id"), rsd = 0.02))
      .head().getLong(0)
    // HLL++ at rsd=0.02: allow 3 sigma
    assert(math.abs(approx - exact) <= math.max(3, 0.06 * exact),
      s"HLL estimate $approx vs exact $exact")
  }

  test("approx percentile brackets the exact median") {
    val ev = Tables.events(spark, sfDir)
    val exact = ev.stat.approxQuantile("value", Array(0.5), 0.0).head
    val approx = ev.select(
      percentile_approx(col("value"), lit(0.5), lit(10000))).head().getDouble(0)
    // accuracy 10000 -> rank error <= n/10000; value tolerance via the
    // exact p45/p55 band (any value in that band is a valid 1%-rank miss)
    val band = ev.stat.approxQuantile("value", Array(0.45, 0.55), 0.0)
    assert(approx >= band(0) && approx <= band(1),
      s"approx median $approx outside exact [p45, p55] band " +
        s"[${band(0)}, ${band(1)}]; exact median was $exact")
  }
}
