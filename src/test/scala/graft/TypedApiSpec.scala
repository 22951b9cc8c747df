package graft

import org.apache.spark.sql.functions._

final case class RawEvent(event_id: Long, user_id: Long, event_type: String,
    ts: java.sql.Timestamp)
final case class Run(user_id: Long, event_type: String, run_len: Long,
    start_id: Long)

/** Typed KeyValueGroupedDataset batch surface: the sequential
  * flatMapGroups fold must reproduce the declarative gaps-and-islands
  * query row for row — two implementations of one semantic, one
  * group-buffered and imperative, one windowed and vectorized. */
class TypedApiSpec extends SparkSpec {

  test("flatMapGroups run-length encoding matches the islands query") {
    import spark.implicits._
    val evs = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .as[RawEvent]
    val typed = evs.groupByKey(_.user_id)
      .flatMapGroups { (user, it) =>
        // sort: Spark guarantees no intra-group order (same contract as
        // capacityGate); the fold is deterministic only after this
        val sorted = it.toIndexedSeq.sortBy(e => (e.ts.getTime, e.event_id))
        val runs = scala.collection.mutable.ArrayBuffer.empty[Run]
        sorted.foreach { e =>
          runs.lastOption match {
            case Some(r) if r.event_type == e.event_type =>
              runs(runs.length - 1) =
                r.copy(run_len = r.run_len + 1,
                  start_id = math.min(r.start_id, e.event_id))
            case _ =>
              runs += Run(user, e.event_type, 1L, e.event_id)
          }
        }
        runs.iterator
      }
    val declarative = SparkEntry.registry.find(_.name == "event_runs_rle").get
      .fn(spark, sfDir)
    val a = typed.toDF().orderBy("user_id", "start_id").collect().toSeq
    val b = declarative.select(col("user_id"), col("event_type"),
      col("run_len"), col("start_id"))
      .orderBy("user_id", "start_id").collect().toSeq
    assert(a.length === b.length, s"${a.length} typed vs ${b.length} declarative")
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }
}
