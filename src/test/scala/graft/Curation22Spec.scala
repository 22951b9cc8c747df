package graft

import org.apache.spark.sql.functions._

/** Batch-16 invariants: merge classification partition laws, purged
  * split accounting. */
class Curation22Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("merge_upsert_classify: partitions the key union, classes lawful") {
    val rows = byName("merge_upsert_classify").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // one verdict per user in the union of both snapshots
    assert(rows.map(_._1).distinct.length === rows.length)
    val byAction = rows.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byAction.keySet.subsetOf(
      Set("insert", "update", "delete", "unchanged")))
    // driver recompute of the two snapshot key sets
    def users(lo: Int, hi: Int): Set[Long] =
      Tables.events(spark, sfDir)
        .filter(dayofmonth(col("ts")) >= lo && dayofmonth(col("ts")) < hi)
        .select(col("user_id")).distinct().collect()
        .map(_.getLong(0)).toSet
    val base = users(1, 16)
    val next = users(16, 31)
    assert(rows.length === (base ++ next).size, "union coverage")
    val actions = rows.toMap
    (next -- base).foreach(u => assert(actions(u) === "insert", s"u$u"))
    (base -- next).foreach(u => assert(actions(u) === "delete", s"u$u"))
    (base & next).foreach(u =>
      assert(actions(u) === "update" || actions(u) === "unchanged", s"u$u"))
  }

  test("purged_time_split: folds account for every event, embargo bounded") {
    val rows = byName("purged_time_split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 3L))
    val total = Tables.events(spark, sfDir).count()
    rows.foreach { case (fold, test, train, embargo) =>
      assert(test + train + embargo === total, s"fold $fold accounting")
      assert(test > 0L && train > 0L, s"fold $fold degenerate")
      // embargo is at most 2 calendar days of a 30-day month
      assert(embargo < total / 5, s"fold $fold embargo $embargo oversized")
    }
    // every event is a test row in exactly one fold
    assert(rows.map(_._2).sum === total, "test windows partition the month")
  }
}
