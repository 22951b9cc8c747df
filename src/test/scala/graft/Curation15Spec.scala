package graft

import org.apache.spark.sql.functions._

/** Batch-9 invariants: ANN recall detail and Theil-Sen robustness. */
class Curation15Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("ann_recall_at_k agrees with set recompute of exact vs LSH tops") {
    val exact = byName("cosine_topk") // top-5; reuse its top-3 prefix
      .filter(col("rank") <= 3).filter(col("qid") =!= col("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cosine_topk uses qid < 10 — same query set as ann_recall_at_k
    val lsh = byName("ann_lsh_topk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = byName("ann_recall_at_k").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.size === 10)
    (0L until 10L).foreach { qid =>
      val e = exact.filter(_._1 == qid).map(_._2)
      val l = lsh.filter(_._1 == qid).map(_._2)
      val hits = e.intersect(l).size.toLong
      val (gHits, gRec) = got(qid)
      assert(gHits === hits, s"qid $qid hits")
      assert(gRec === hits * 1000 / e.size, s"qid $qid recall")
    }
    // recall is a valid permille; the aggregate floor on a realistic
    // corpus is pinned by AnnRecallSpec (sf0.001's ~50 vectors scatter
    // into 256 buckets, so near-zero recall here is expected)
    assert(got.values.forall(v => v._2 >= 0 && v._2 <= 1000))
  }

  test("theil_sen_slope matches a driver-side median recompute and " +
    "shrugs at an outlier that moves OLS") {
    val sample = Tables.documents(spark, sfDir)
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("x"),
        length(col("text")).cast("long").as("y"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).take(60)).toMap
    val got = byName("theil_sen_slope").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    sample.foreach { case (lang, docs) =>
      val pairs = for {
        i <- docs.indices; j <- (i + 1) until docs.length
        if docs(i)._3 != docs(j)._3
      } yield {
        val dy = docs(j)._4 - docs(i)._4
        val dx = docs(j)._3 - docs(i)._3
        (dy, dx, docs(i)._2, docs(j)._2)
      }
      val ordered = pairs.sortBy(p =>
        (p._1.toDouble / p._2.toDouble, p._1, p._2, p._3, p._4))
      val np = ordered.length
      val med = ordered((np + 1) / 2 - 1)
      val want = {
        val q = med._1 * 1000000L
        // floor division semantics of Spark's div / DuckDB's //
        Math.floorDiv(q, med._2)
      }
      assert(got(lang) === ((np.toLong, want)), s"lang $lang")
      // slope is positive and near chars-per-token plausibility
      assert(want > 3000000L && want < 13000000L, s"lang $lang: $want")
    }
  }
}
