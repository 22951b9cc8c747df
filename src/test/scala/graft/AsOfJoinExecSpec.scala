package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOfJoin

/** The custom as-of physical operator: plan shape, parity with the
  * union+window formulation, and a synthetic edge-case battery checked
  * against a brute-force reference. */
class AsOfJoinExecSpec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("plans AsOfJoinExec with three exchanges (two join-side, one pre-agg)") {
    val df = byName("asof_join_exec")
    val plan = df.queryExecution.executedPlan.toString
    // physical nodeName strips the Exec suffix
    assert(plan.contains("AsOfJoin"), s"custom operator missing:\n$plan")
    assert(!plan.contains("!AsOfJoin"), s"operator has missing inputs:\n$plan")
    val exchanges = "(?m)Exchange".r.findAllIn(plan).length
    assert(exchanges <= 3, s"as-of exec grew to $exchanges exchanges:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "fallback join appeared next to the custom operator")
  }

  test("row-for-row parity with the union+window as-of join") {
    val exec = byName("asof_join_exec").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val window = byName("asof_join_latest_ref").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(exec.nonEmpty)
    assert(exec === window)
  }

  test("edge cases: unmatched keys, equal timestamps, repeated updates") {
    import spark.implicits._
    // left: (id, key, t); right: (key, t, value)
    val left = Seq(
      (1L, 10L, 100L), // before any right row for key 10 -> null
      (2L, 10L, 200L), // equal timestamp -> inclusive match (v=7)
      (3L, 10L, 250L), // between updates -> still v=7
      (4L, 10L, 300L), // second update at 300 inclusive -> v=9
      (5L, 10L, 999L), // far after -> latest v=9
      (6L, 20L, 500L), // key with no right rows -> null
      (7L, 30L, 50L),  // right rows exist but all later -> null
      (8L, 40L, 700L)  // single exact-time match -> v=13
    ).toDF("id", "k", "t")
      .select(col("id"), col("k").as("key"), col("t").as("time"))
    val right = Seq(
      (10L, 200L, 7L), (10L, 300L, 9L),
      (30L, 60L, 11L),
      (40L, 700L, 13L),
      (99L, 1L, 99L) // key never probed
    ).toDF("key", "rt", "v")
      .select(col("key").as("rkey"), col("rt"), col("v"))
    val got = AsOfJoin.latest(left, "key", "time",
        right, "rkey", "rt", "v", "asof_v")
      .select(col("id"), col("asof_v")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val expected = Map(
      1L -> None, 2L -> Some(7L), 3L -> Some(7L), 4L -> Some(9L),
      5L -> Some(9L), 6L -> None, 7L -> None, 8L -> Some(13L))
    assert(got === expected)
  }

  test("SQL metrics account for every output row and every match") {
    import spark.implicits._
    val left = (1L to 400L).map(i => (i, i % 5, i * 10)).toDF("id", "key", "time")
    val right = (1L to 100L).map(i => (i % 3, i * 17, i)).toDF("rkey", "rt", "v")
    val df = AsOfJoin.latest(left, "key", "time",
      right, "rkey", "rt", "v", "asof_v")
    val rows = df.collect()
    val matched = rows.count(!_.isNullAt(3))
    // after collect() the adaptive plan is final; unwrap the adaptive
    // root AND the query-stage leaves (QueryStageExec hides its inner
    // plan from collect) to reach the custom operator
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def find(p: SparkPlan): Option[graft.plans.AsOfJoinExec] =
      p.collectFirst { case a: graft.plans.AsOfJoinExec => a }
        .orElse(p.collect { case q: QueryStageExec => q.plan }
          .flatMap(find(_)).headOption)
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val exec = find(finalPlan)
      .getOrElse(fail(s"AsOfJoinExec not found in executed plan:\n$finalPlan"))
    assert(exec.metrics("numOutputRows").value == rows.length.toLong)
    assert(exec.metrics("numMatched").value == matched.toLong)
    assert(matched > 0 && matched < rows.length,
      "fixture must exercise both matched and unmatched rows")
  }

  test("repartitioned inputs do not change the result (merge is local-safe)") {
    import spark.implicits._
    val left = (1L to 500L).map(i => (i, i % 7, i * 10)).toDF("id", "key", "time")
    val right = (1L to 300L).map(i => (i % 7, i * 13, i)).toDF("rkey", "rt", "v")
    def run(lparts: Int, rparts: Int) =
      AsOfJoin.latest(left.repartition(lparts), "key", "time",
          right.repartition(rparts), "rkey", "rt", "v", "asof_v")
        .select(col("id"), col("asof_v")).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val a = run(3, 5)
    val b = run(13, 2)
    assert(a === b)
    // brute-force reference on the driver
    val rrows = (1L to 300L).map(i => (i % 7, i * 13, i))
    val expected = (1L to 500L).map { i =>
      val k = i % 7; val t = i * 10
      val cands = rrows.filter(r => r._1 == k && r._2 <= t)
      i -> (if (cands.isEmpty) None
            else Some(cands.maxBy(r => (r._2, r._3))._3))
    }.toMap
    // note: ties on right time resolved by arrival order in the merge —
    // make the reference unambiguous by construction (rt = i*13 unique)
    assert(a === expected)
  }
}
