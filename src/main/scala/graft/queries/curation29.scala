package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.plans.AsOfJoin

/** Batch 23: the whole-operator as-of join (custom logical plan +
  * planner strategy + physical merge, graft.plans.AsOfJoin) exercised on
  * the same probe/build semantics as the declarative
  * `asof_join_latest_ref` — one query, two independent engine paths,
  * one DuckDB oracle.
  */
object Curation29Queries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "asof_join_exec",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"),
            col("event_type"))
        val probes = ev
          .filter(col("event_type").isin("purchase", "error"))
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"))
        val builds = ev
          .filter(col("event_type").isin("signup", "click"))
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("ref_event"))
          .select(col("user_id").as("b_user"),
            unix_micros(col("ts")).as("t_us"), col("ref_event"))
        AsOfJoin.latest(probes, "user_id", "ts_us",
            builds, "b_user", "t_us", "ref_event", "asof_raw")
          .select(col("event_id"), col("user_id"), col("ts_us"),
            coalesce(col("asof_raw"), lit(-1L)).as("asof_ref"))
      },
      Some("""WITH builds AS (
        |  SELECT user_id, ts AS t, max(event_id) AS ref_event
        |  FROM events WHERE event_type IN ('signup', 'click')
        |  GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts::TIMESTAMP) AS ts_us,
        |       coalesce(b.ref_event, -1) AS asof_ref
        |FROM events e
        |ASOF LEFT JOIN builds b
        |  ON e.user_id = b.user_id AND e.ts >= b.t
        |WHERE e.event_type IN ('purchase', 'error')""".stripMargin),
      "As-of join through the custom physical operator (AsOfJoinPlan -> " +
        "AsOfJoinStrategy -> AsOfJoinExec): children hash-clustered on " +
        "the key and sorted (key, time) by EnsureRequirements, then a " +
        "per-partition two-pointer merge holding one long of state. " +
        "Same semantics and oracle as asof_join_latest_ref (DuckDB " +
        "native ASOF JOIN), so the custom operator, the union+window " +
        "formulation, and an independent engine must all agree — the " +
        "strongest correctness statement we can make about planner-" +
        "level code. The probe side streams unbuffered: at 100 TB this " +
        "is the as-of shape with the smallest memory footprint."),
  )
}
