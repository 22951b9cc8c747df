package graft

import org.apache.spark.sql.functions._

/** Invariants for the advanced operator family (advanced.scala). */
class AdvancedSpec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("asof join emits one row per probe event, never self-referencing") {
    val res = byName("asof_join_latest_ref")
    val probes = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "error")).count()
    assert(res.count() === probes)
    assert(res.filter(col("asof_ref") === col("event_id")).count() === 0)
    // every non-sentinel ref is a real signup/click event id
    val refs = res.filter(col("asof_ref") =!= -1L)
      .select(col("asof_ref").as("event_id")).distinct()
    val builds = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("signup", "click"))
      .select(col("event_id"))
    assert(refs.except(builds).count() === 0)
  }

  test("range join counts only events within the hour window") {
    val res = byName("range_join_bucketed")
    assert(res.filter(col("n_prior") < 1).count() === 0)
  }

  test("quantiles are ordered") {
    val r = byName("quantile_values").head()
    assert(r.getDouble(0) <= r.getDouble(1) && r.getDouble(1) <= r.getDouble(2))
  }

  test("dedup clusters map every injected copy to its original") {
    val res = byName("dedup_clusters")
    val exact = res.filter(col("doc_id") >= 2000000L)
    assert(exact.filter(col("cluster_id") =!= col("doc_id") - 2000000L)
      .count() === 0)
    val near = res.filter(col("doc_id") >= 1000000L && col("doc_id") < 2000000L)
    assert(near.filter(col("cluster_id") =!= col("doc_id") - 1000000L)
      .count() === 0)
    // cluster representative is never itself listed as a member
    assert(res.filter(col("doc_id") === col("cluster_id")).count() === 0)
  }

  test("int8 quantization stays in range with correct self-scale") {
    val res = byName("embedding_quantize_int8")
    assert(res.filter(col("q0") > 127L || col("q0") < -128L).count() === 0)
    assert(res.filter(col("q1") > 127L || col("q1") < -128L).count() === 0)
  }

  test("argmax picks an event actually achieving the per-user max") {
    val res = byName("argmax_event_per_user")
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id").as("top_event"),
        floor(col("value") * 100).cast("long").as("v100"))
    assert(res.join(ev, Seq("user_id", "top_event", "v100")).count()
      === res.count())
  }

  test("tfidf emits at most 3 ranked terms per doc") {
    val res = byName("tfidf_top_terms")
    assert(res.filter(col("rk") > 3L).count() === 0)
    val over = res.groupBy(col("doc_id")).count().filter(col("count") > 3)
    assert(over.count() === 0)
  }

  test("stratified sample downsamples the dominant stratum harder") {
    val res = byName("sample_stratified").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = Tables.documents(spark, sfDir).groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // en sampled at ~10%, tail at ~50% — allow generous slack on sf0.001
    val enRate = res.getOrElse("en", 0L).toDouble / totals("en")
    assert(enRate < 0.3, s"en rate $enRate")
  }
}
