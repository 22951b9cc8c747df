package graft

/** Exchange accounting on shared-subtree plans. Two facts, both
  * measured on the final adaptive plan:
  *  - genuine reuse: tpch_q17 joins a fact slice to its own aggregate,
  *    and both consumers need identical columns, so the second
  *    exchange is a ReusedExchange;
  *  - the trap: a two-branch repartition+aggregate+join does NOT
  *    reuse — column pruning specializes each branch's exchange — so
  *    repartitioned_two_phase_agg computes both measures in one
  *    two-phase agg instead, pinned here to exactly one exchange. */
class ExchangeReuseSpec extends SparkSpec {

  private def finalPlan(name: String): String = {
    val df = SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)
    df.queryExecution.toRdd.count() // run so AQE finalizes the plan
    df.queryExecution.executedPlan.toString
  }

  test("tpch_q17_small_quantity: the self-join-on-own-aggregate " +
    "reuses the fact exchange (ReusedExchange in the final plan)") {
    assert(finalPlan("tpch_q17_small_quantity").contains("ReusedExchange"))
  }

  test("tpch_q2 and tpch_q11: the shared partsupp-proxy subtree is " +
    "computed once at runtime (AQE stage reuse)") {
    // both queries reference the proxy-derived frame twice (per-part
    // min / national total scalar gate); the initial plan duplicates
    // the subtree, and AQE stage reuse collapses it — so the fact
    // shuffles ONCE per query at runtime, which is the 100 TB claim
    for (n <- Seq("tpch_q2_min_cost_supplier", "tpch_q11_important_stock"))
      assert(finalPlan(n).split("== Initial Plan ==").head
        .contains("ReusedExchange"), s"$n lost runtime stage reuse")
  }

  test("repartitioned_two_phase_agg: both measures ride exactly one " +
    "exchange") {
    // the adaptive plan string prints Final and Initial sections —
    // count exchanges in the final section only
    val plan = finalPlan("repartitioned_two_phase_agg")
      .split("== Initial Plan ==").head
    val exchanges = "(?<!Reused)Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges === 1, s"expected one exchange:\n$plan")
  }
}
