package graft

import graft.functions.{RankHit, RankMetricsAgg}

/** Typed-UDAF rank metrics vs the built-in agg pipeline. */
class RankMetricsAggSpec extends SparkSpec {

  test("aggregator matches hand-computed metrics, sentinel on miss") {
    import spark.implicits._
    val hits = Seq(
      RankHit(1, relevant = false), RankHit(2, relevant = true),
      RankHit(3, relevant = true), RankHit(4, relevant = false)).toDS()
    val m = hits.select(new RankMetricsAgg(zone = 500).toColumn).head()
    assert(m.avgRank === 2.5)
    assert(m.firstHit === 2L)
    assert(m.nRelevant === 2L)

    val misses = Seq(RankHit(1, relevant = false)).toDS()
    val m2 = misses.select(new RankMetricsAgg(zone = 500).toColumn).head()
    assert(m2.firstHit === 500L)
    assert(m2.avgRank === 500.0)
    assert(m2.nRelevant === 0L)
  }

  test("aggregator agrees with the flagship query's per-query metrics") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ranked = queries.VectorQueries.rankedRelevant(spark, sfDir)
      .select(col("qid"), col("rank"), col("relevant"))
      .as[(Long, Long, Boolean)]
    val byAgg = ranked.groupByKey(_._1)
      .mapValues(t => RankHit(t._2, t._3))
      .agg(new RankMetricsAgg(zone = 500).toColumn)
      .collect().toMap
    val byBuiltin = queries.VectorQueries.rankedRelevant(spark, sfDir)
      .groupBy(col("qid"))
      .agg(coalesce(min(when(col("relevant"), col("rank"))), lit(500L))
        .as("first_hit"))
      .as[(Long, Long)].collect().toMap
    byBuiltin.foreach { case (q, fh) =>
      assert(byAgg(q).firstHit === fh, s"query $q")
    }
  }
}
