package graft

import org.apache.spark.sql.functions._
import graft.queries.Curation58Queries

/** Count-Min Sketch pins (curation58.scala):
  *
  *  1. the defining CMS guarantee: est >= exact for EVERY distinct
  *     token (min over rows can collide upward, never downward);
  *  2. mergeability: per-lang counter grids summed == the grid built
  *     over the whole corpus in one pass (sketch merge is groupBy-sum);
  *  3. the heavy-hitter two-pass is lossless: its output equals the
  *     direct exact computation (CMS pre-filter has no false
  *     negatives, and the exact pass removes the false positives);
  *  4. plan shape: the counter-grid agg runs with map-side partials
  *     (partial_count) — the property that bounds the exchange at
  *     d*w groups at any corpus size — and the probe join broadcasts
  *     the counter table.
  */
class CmsSketchSpec extends SparkSpec {

  private def toks =
    Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)

  private def h60(c: String) =
    expr(s"cast(conv(substring(md5($c), 1, 15), 16, 10) as bigint)")

  private def buckets(h: String) =
    array((0 until 4).map(i => expr(s"shiftright($h, ${15 * i}) & 1023")): _*)

  test("CMS never underestimates: est >= exact for every distinct token") {
    val counters = toks.select(h60("w").as("h"))
      .select(posexplode(buckets("h")).as(Seq("r", "b")))
      .groupBy("r", "b").agg(count(lit(1)).as("cnt"))
    val exact = toks.groupBy("w").agg(count(lit(1)).as("exact_cnt"))
    val under = exact.withColumn("h", h60("w"))
      .select(col("w"), col("exact_cnt"),
        posexplode(buckets("h")).as(Seq("r", "b")))
      .join(broadcast(counters), Seq("r", "b"))
      .groupBy("w", "exact_cnt").agg(min("cnt").as("est"))
      .where(col("est") < col("exact_cnt"))
    assert(under.count() == 0, "CMS estimate below the true count")
  }

  test("merged per-lang counter grids == one-pass global grid") {
    val perLang = toks.select(col("lang"), h60("w").as("h"))
      .select(col("lang"), posexplode(buckets("h")).as(Seq("r", "b")))
      .groupBy("lang", "r", "b").agg(count(lit(1)).as("cnt"))
    val merged = perLang.groupBy("r", "b").agg(sum("cnt").as("cnt"))
    val direct = toks.select(h60("w").as("h"))
      .select(posexplode(buckets("h")).as(Seq("r", "b")))
      .groupBy("r", "b").agg(count(lit(1)).cast("long").as("cnt"))
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
      "sketch merge must equal resketching the union")
  }

  test("heavy-hitter two-pass output == direct exact computation") {
    val out = SparkEntry.queries("cms_heavy_hitters_twopass")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = toks.count()
    val thr = total / 200
    val direct = toks.groupBy("w").agg(count(lit(1)).as("c"))
      .where(col("c") >= thr)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == direct, s"two-pass=$out direct=$direct")
  }

  test("counter grid plans with map-side partials; probe broadcasts") {
    val plan = SparkEntry.queries("cms_token_freq")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("registry wiring: both queries registered with oracles") {
    Curation58Queries.defs.foreach { q =>
      assert(SparkEntry.queries.contains(q.name))
      assert(q.oracle.nonEmpty)
      assert(SparkEntry.queries(q.name)(spark, sfDir).count() > 0)
    }
  }
}
