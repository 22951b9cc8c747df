package graft

import org.apache.spark.sql.functions._

/** Batch-39 invariants: Q10/Q4 replays, anisotropy recompute, kNN
  * accuracy recompute. */
class Curation45Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  private def us(s: String): Long =
    java.time.Instant.parse(s).toEpochMilli * 1000L

  test("tpch_q10_returned_items: top-20 replay") {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("unix_micros(cast(o_orderdate as timestamp))")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(o => o._3 >= us("1996-01-01T00:00:00Z") &&
        o._3 < us("1996-04-01T00:00:00Z"))
      .map(o => (o._1, o._2)).toMap
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getInt(2))))
      .toMap
    val nat = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    val perCust = li.flatMap { case (ok, price, disc) =>
      ord.get(ok).map(ck => (ck, math.floor(price * 100).toLong *
        (100L - math.floor(disc * 100).toLong)))
    }.groupBy(_._1).map { case (ck, xs) => (ck, xs.map(_._2).sum) }
    val expected = perCust.toSeq.sortBy(p => (-p._2, p._1)).take(20)
      .map { case (ck, rev) =>
        val (name, nk) = cust(ck)
        (ck, name, nat(nk), rev)
      }
    val got = byName("tpch_q10_returned_items").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === expected)
  }

  test("tpch_q4_order_priority: semi-join replay, conservation") {
    val lateOrders = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        expr("unix_micros(cast(l_shipdate as timestamp))")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, xs) => (k, xs.map(_._2).max) }
    val dayUs = 86400000000L
    val ords = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        expr("unix_micros(cast(o_orderdate as timestamp))"),
        col("o_orderpriority")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .filter(o => o._2 >= us("1996-01-01T00:00:00Z") &&
        o._2 < us("1996-04-01T00:00:00Z"))
    // max ship lag is enough to decide EXISTS for the > comparison
    val expected = ords.filter { o =>
      lateOrders.get(o._1).exists(_ > o._2 + 60 * dayUs) }
      .groupBy(_._3).map { case (p, xs) => (p, xs.size.toLong) }
    val got = byName("tpch_q4_order_priority").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
    assert(got.values.sum <= ords.length.toLong)
  }

  test("embedding_anisotropy: exact recompute on the fixed pairing") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val n = vecs.size.toLong
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val ab = a.zip(b).map { case (x, y) => x * y }.sum
      ab / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val cosE6 = vecs.keys.toSeq.flatMap { i =>
      val p = (i * 7 + 13) % n
      if (p == i) None
      else Some(math.floor(cos(vecs(i), vecs(p)) * 1e6).toLong)
    }
    val r = byName("embedding_anisotropy").collect().head
    assert(r.getLong(0) === cosE6.length.toLong)
    // Spark div, DuckDB integer //, and Scala Long / all truncate
    // toward zero, so the mean recompute is exact even when negative
    assert(r.getLong(1) === cosE6.sum / cosE6.length)
    assert(r.getLong(2) === cosE6.count(_ < 0).toLong)
    assert(r.getLong(3) === 1000L * cosE6.count(_ < 0) / cosE6.length)
    assert(r.getLong(1) >= -1000000L && r.getLong(1) <= 1000000L)
  }

  test("knn_label_accuracy: exact vote replay") {
    val labels = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 300)
      .select(col("vec_id"), col("label").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = graft.queries.GraphQueries.knnEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pred = edges.groupBy(_._1).map { case (src, es) =>
      val votes = es.map(e => labels(e._2)).groupBy(identity)
        .map { case (l, xs) => (l, xs.size) }
      (src, votes.toSeq.sortBy(v => (-v._2, v._1)).head._1)
    }
    val expected = labels.keys.groupBy(labels).map { case (l, nodes) =>
      val withPred = nodes.filter(pred.contains)
      (l, (withPred.size.toLong,
        withPred.count(nd => pred(nd) == l).toLong))
    }
    val got = byName("knn_label_accuracy").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (l, (n, c, acc)) =>
      assert((n, c) === expected(l), s"label $l")
      assert(acc === 1000L * c / n)
    }
  }
}
