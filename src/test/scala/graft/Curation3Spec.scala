package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the Curation3Queries batch — properties the
  * DuckDB hash-compare cannot express (cross-query consistency, interval
  * algebra, bounds), run on sf0.001.
  */
class Curation3Spec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("line_dedup_global: keeps each distinct line exactly once globally") {
    val r = run("line_dedup_global")
    val kept = r.agg(sum(col("n_kept"))).head.getLong(0)
    val total = r.agg(sum(col("n_lines"))).head.getLong(0)
    // globally-kept line instances == number of distinct lines in corpus
    val distinctLines = Corpus.withDups(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(explode(transform(
        sequence(lit(0), expr("(size(toks) - 1) div 10")),
        i => array_join(slice(col("toks"), i * lit(10) + lit(1), lit(10)), " ")))
        .as("line"))
      .distinct().count()
    assert(kept === distinctLines)
    assert(kept <= total)
  }

  test("line_dedup_global: exact-duplicate docs are fully emptied") {
    // every +2000000 injected doc repeats its base doc verbatim, and the
    // base doc (smaller doc_id) always wins first-occurrence — so the
    // injected copy keeps zero lines
    val r = run("line_dedup_global").filter(col("doc_id") >= 2000000L)
    assert(r.count() > 0)
    assert(r.filter(col("n_kept") =!= 0).count() === 0)
  }

  test("boilerplate_lines: every flagged line has >= 2 distinct source docs") {
    val r = run("boilerplate_lines")
    assert(r.count() > 0) // dup injection guarantees repeats
    assert(r.filter(col("doc_freq") < 2).count() === 0)
  }

  test("scd2_history: exactly one current version per customer, " +
    "intervals chain without gaps or overlaps") {
    val r = run("scd2_history").cache()
    try {
      val perCust = r.groupBy("o_custkey")
        .agg(sum(when(col("is_current"), 1L).otherwise(0L)).as("n_current"))
      assert(perCust.filter(col("n_current") =!= 1L).count() === 0)
      // chaining: each non-current row's valid_to equals the next row's
      // valid_from within the customer (lead over the same ordering)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(col("valid_from_us"), col("o_orderkey"))
      val chained = r.withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
        .filter(col("valid_to_us").isNotNull)
      assert(chained.filter(col("valid_to_us") =!= col("next_from")).count() === 0)
    } finally r.unpersist()
  }

  test("interpolate_linear: observed readings pass through unchanged, " +
    "interpolated values stay inside the neighbor envelope") {
    val r = run("interpolate_linear").cache()
    try {
      assert(r.filter(col("reading_e3").isNotNull &&
        col("interp_e3") =!= col("reading_e3").cast("double")).count() === 0)
      // interior interpolations: between min and max of the two anchors.
      // Recompute anchors the same way the query does, on the result.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("t_us", "event_id")
      val prev = w.rowsBetween(Long.MinValue, -1)
      val next = w.rowsBetween(1, Long.MaxValue)
      val env = r
        .withColumn("pv", last(col("reading_e3"), ignoreNulls = true).over(prev))
        .withColumn("nv", first(col("reading_e3"), ignoreNulls = true).over(next))
        .filter(col("reading_e3").isNull &&
          col("pv").isNotNull && col("nv").isNotNull)
      val out = env.filter(
        col("interp_e3") < least(col("pv"), col("nv")).cast("double") ||
          col("interp_e3") > greatest(col("pv"), col("nv")).cast("double"))
      assert(out.count() === 0)
    } finally r.unpersist()
  }

  test("embedding_dim_stats: one row per dimension, non-negative variance, " +
    "mean inside [min, max]") {
    val r = run("embedding_dim_stats").cache()
    try {
      assert(r.count() === 64)
      assert(r.filter(col("variance") < 0).count() === 0)
      assert(r.filter(col("mean") * 1000 < col("min_e3") ||
        col("mean") * 1000 > col("max_e3") + 1).count() === 0)
    } finally r.unpersist()
  }

  test("topk_terms_per_lang: at most 3 terms per lang, counts non-increasing") {
    val r = run("topk_terms_per_lang").cache()
    try {
      assert(r.groupBy("lang").count().filter(col("count") > 3).count() === 0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("rk")
      val bad = r.withColumn("prev_n", lag(col("n"), 1).over(w))
        .filter(col("prev_n").isNotNull && col("n") > col("prev_n"))
      assert(bad.count() === 0)
    } finally r.unpersist()
  }

  test("sample_fixed_per_group: exactly min(5, group size) per lang, " +
    "stable across runs") {
    val sizes = Tables.documents(spark, sfDir).groupBy("lang").count()
    val r1 = run("sample_fixed_per_group")
    val got = r1.groupBy("lang").count().withColumnRenamed("count", "got")
    val bad = sizes.join(got, Seq("lang"), "left")
      .filter(coalesce(col("got"), lit(0L)) =!= least(lit(5L), col("count")))
    assert(bad.count() === 0)
    val r2 = run("sample_fixed_per_group")
    assert(r1.exceptAll(r2).count() === 0 && r2.exceptAll(r1).count() === 0)
  }
}
