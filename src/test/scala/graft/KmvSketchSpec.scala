package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKLongsAgg.minkLongs
import graft.queries.Curation57Queries

/** KMV / theta-style sketch pins (curation57.scala):
  *
  *  1. below saturation the sketch is EXACT (it holds every distinct
  *     hash), and saturated estimates land within the family's known
  *     error envelope (~1/sqrt(k) stderr; we pin 3 sigma);
  *  2. the closure property that makes the sketch mergeable: the k
  *     smallest of the pooled per-group sketches equal the k smallest
  *     of the full distinct hash set — i.e. merging sketches loses
  *     NOTHING vs resketching the raw union;
  *  3. the Jaccard estimate tracks the exact vocabulary Jaccard within
  *     the same envelope;
  *  4. plan shape: the sketch agg runs with map-side partials
  *     (partial_topk_longs), the property that bounds the exchange to
  *     n_groups * k longs at any corpus size.
  */
class KmvSketchSpec extends SparkSpec {

  private def h60(c: String) =
    expr(s"cast(conv(substring(md5($c), 1, 15), 16, 10) as bigint)")

  test("kmv_distinct_by_type: exact below saturation, 3-sigma above") {
    val out = SparkEntry.queries("kmv_distinct_by_type")(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = Tables.events(spark, sfDir)
      .agg(countDistinct("user_id")).head().getLong(0)
    out.foreach { case (t, (nKept, est)) =>
      val truth = if (t == "_all") exactAll else exact(t)
      if (nKept < 32) assert(est == truth, s"$t unsaturated must be exact")
      else {
        val rel = math.abs(est - truth).toDouble / truth
        assert(rel < 3.0 / math.sqrt(32.0), s"$t est=$est truth=$truth")
      }
    }
  }

  test("KMV closure: merged per-type sketches == resketch of raw union") {
    val k = 32
    val hashes = Tables.events(spark, sfDir)
      .select(col("event_type"), h60("cast(user_id as string)").as("h"))
      .distinct()
    val perType = hashes.groupBy("event_type")
      .agg(minkLongs(col("h"), k).as("sk"))
    val merged = perType.select(explode(col("sk")).as("h")).distinct()
      .agg(minkLongs(col("h"), k)).head().getSeq[Long](0)
    val direct = hashes.select(col("h")).distinct()
      .agg(minkLongs(col("h"), k)).head().getSeq[Long](0)
    assert(merged == direct,
      "pooling per-group sketches must lose nothing vs resketching")
  }

  test("kmv_jaccard_sources tracks exact vocabulary Jaccard") {
    val out = SparkEntry.queries("kmv_jaccard_sources")(spark, sfDir)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(4))).toMap
    assert(out.size == 6, "4 sources -> 6 pairs")
    val vocab = Tables.documents(spark, sfDir)
      .where(col("source").isin("src0", "src1", "src2", "src3"))
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0).distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (s, ws) => s -> ws.map(_._2).toSet }
    out.foreach { case ((a, b), permille) =>
      assert(permille >= 0 && permille <= 1000)
      val inter = (vocab(a) & vocab(b)).size.toDouble
      val truth = inter / (vocab(a) | vocab(b)).size
      // k = 64 -> stderr ~ sqrt(J(1-J)/64) <= 1/16; pin 3 sigma + the
      // permille floor
      assert(math.abs(permille / 1000.0 - truth) < 3.0 / 16.0 + 0.001,
        s"($a,$b) est=${permille / 1000.0} truth=$truth")
    }
  }

  test("sketch agg plans with map-side partials") {
    val k = 32
    val plan = Tables.events(spark, sfDir)
      .select(col("event_type"), h60("cast(user_id as string)").as("h"))
      .distinct()
      .groupBy("event_type").agg(minkLongs(col("h"), k).as("sk"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_longs"), plan)
  }

  test("registry wiring: both queries registered with oracles") {
    Curation57Queries.defs.foreach { q =>
      assert(SparkEntry.queries.contains(q.name))
      assert(q.oracle.nonEmpty)
      assert(SparkEntry.queries(q.name)(spark, sfDir).count() > 0)
    }
  }
}
