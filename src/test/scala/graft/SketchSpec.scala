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
}
