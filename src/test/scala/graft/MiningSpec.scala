package graft

import org.apache.spark.sql.functions._

/** Invariants for MiningQueries (sf0.001). */
class MiningSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("cooccurrence_pairs: ordered pairs, counts bounded by user population") {
    val r = run("cooccurrence_pairs").cache()
    try {
      assert(r.filter(col("type_a") >= col("type_b")).count() === 0)
      val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
      assert(r.filter(col("n_users") > users).count() === 0)
    } finally r.unpersist()
  }

  test("event_transition_counts: total transitions = events minus active users") {
    val total = run("event_transition_counts").agg(sum("n")).head.getLong(0)
    val ev = Tables.events(spark, sfDir)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(total === expected)
  }

  test("cogroup_user_activity: covers the union of both key domains, " +
    "and counts reconcile with the inputs") {
    val r = run("cogroup_user_activity").cache()
    try {
      val evUsers = Tables.events(spark, sfDir)
        .select("user_id").distinct().count()
      val orUsers = Tables.orders(spark, sfDir)
        .select(col("o_custkey")).distinct().count()
      assert(r.count() >= math.max(evUsers, orUsers))
      assert(r.agg(sum("n_events")).head.getLong(0) ===
        Tables.events(spark, sfDir).count())
      assert(r.agg(sum("n_orders")).head.getLong(0) ===
        Tables.orders(spark, sfDir).count())
      // a key missing from one side has the zero/None signature
      assert(r.filter(col("n_events") === 0 &&
        col("last_event_us").isNotNull).count() === 0)
    } finally r.unpersist()
  }
}
