package graft

import org.apache.spark.sql.functions._

/** Semantic + plan invariants for AnalyticsQueries (sf0.001). */
class AnalyticsSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("star_join_revenue: positive revenue, nations confined to ASIA") {
    val r = run("star_join_revenue").cache()
    try {
      assert(r.count() > 0)
      assert(r.filter(col("revenue") <= 0).count() === 0)
      val asiaNations = Tables.nation(spark, sfDir)
        .join(Tables.region(spark, sfDir)
          .filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_name").collect().map(_.getString(0)).toSet
      val got = r.select("n_name").collect().map(_.getString(0)).toSet
      assert(got.subsetOf(asiaNations))
    } finally r.unpersist()
  }

  test("star_join_revenue: dimension joins broadcast in the physical plan") {
    val plan = run("star_join_revenue").queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("sliding_distinct_users: distinct count bounded by event count " +
    "and by the global user population") {
    val r = run("sliding_distinct_users").cache()
    try {
      assert(r.filter(col("n_users") > col("n_events")).count() === 0)
      val totalUsers = Tables.events(spark, sfDir)
        .select("user_id").distinct().count()
      assert(r.filter(col("n_users") > totalUsers).count() === 0)
      // every event lands in exactly 3 windows
      val totalEvents = Tables.events(spark, sfDir).count()
      val replicated = r.agg(sum("n_events")).head.getLong(0)
      assert(replicated === totalEvents * 3)
    } finally r.unpersist()
  }

  test("quantile_normalize_scores: bijective per doc, rank-preserving " +
    "within source, range-bounded by the global distribution") {
    val r = run("quantile_normalize_scores").cache()
    try {
      val docs = Tables.documents(spark, sfDir)
      assert(r.count() === docs.count())
      val (gMin, gMax) = {
        val row = docs.agg(min("n_chars"), max("n_chars")).head
        (row.getLong(0), row.getLong(1))
      }
      assert(r.filter(col("norm_chars") < gMin ||
        col("norm_chars") > gMax).count() === 0)
      // within a source, higher raw score never maps to a lower quantile
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("n_chars"), col("doc_id"))
      val bad = r.withColumn("prev", lag(col("norm_chars"), 1).over(w))
        .filter(col("prev").isNotNull && col("norm_chars") < col("prev"))
      assert(bad.count() === 0)
    } finally r.unpersist()
  }
}
