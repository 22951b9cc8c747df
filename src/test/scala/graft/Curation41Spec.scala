package graft

import org.apache.spark.sql.functions._

/** Batch-35 invariants: Q5 revenue conservation + replay, ADC vs exact
  * distance dominance, Mann-Kendall pair laws, confusion-matrix
  * accounting. */
class Curation41Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("tpch_q5_local_supplier: exact replay from collected tables") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("unix_micros(cast(o_orderdate as timestamp))")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val sup = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val nat = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .collect().map(r => (r.getInt(0), (r.getString(1), r.getInt(2)))).toMap
    val asia = Tables.region(spark, sfDir)
      .filter(col("r_name") === "ASIA")
      .select(col("r_regionkey")).collect().map(_.getInt(0)).toSet
    def us(s: String) = java.time.Instant.parse(s).toEpochMilli * 1000L
    val ordOk = ord.filter(o => o._3 >= us("1996-01-01T00:00:00Z") &&
      o._3 < us("1997-01-01T00:00:00Z")).map(o => (o._1, o._2)).toMap
    val expected = li.flatMap { case (ok, sk, price, disc) =>
      for {
        ck <- ordOk.get(ok)
        cn <- cust.get(ck)
        sn <- sup.get(sk)
        if cn == sn
        (name, rk) <- nat.get(sn)
        if asia(rk)
      } yield (name, math.floor(price * 100).toLong *
        (100L - math.floor(disc * 100).toLong))
    }.groupBy(_._1).map { case (n, xs) => (n, xs.map(_._2).sum) }
    val got = byName("tpch_q5_local_supplier").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("pq_adc_topk: 5 hits per query, ADC self-distance is minimal-ish") {
    val got = byName("pq_adc_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet === (0L until 5L).toSet)
    byQ.foreach { case (q, rows) =>
      assert(rows.length === 5, s"query $q")
      assert(rows.map(_._3).sorted.toSeq === (1L to 5L).toSeq)
      // ranks ordered by distance with id tie-break
      val sorted = rows.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 < b._4 || (a._4 == b._4 && a._2 < b._2))
        case _ =>
      }
      // codebook vectors 0..7 include the queries 0..4: a query's ADC
      // distance to ITSELF is the sum of its per-subspace quantization
      // residuals, which is <= its distance to any other vector's code
      // cells only in aggregate — but rank 1 must still have distance
      // <= the query's own reconstruction distance
      val self = rows.find(_._2 == q)
      self.foreach(sr => assert(sorted.head._4 <= sr._4))
    }
  }

  test("mann_kendall_trend: pair-count law and sign recompute") {
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"), date_trunc("DAY", col("ts")),
        lit(1L)).groupBy(col("event_type"),
        col("date_trunc(DAY, ts)").as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val got = byName("mann_kendall_trend").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))).toMap
    daily.groupBy(_._1).foreach { case (et, xs) =>
      val (nDays, nPairs, sStat, trend) = got(et)
      assert(nDays === xs.length.toLong)
      assert(nPairs === nDays * (nDays - 1) / 2)
      val sorted = xs.sortBy(_._2).map(_._3)
      val s = (for {
        i <- sorted.indices; j <- (i + 1) until sorted.length
      } yield math.signum(sorted(j) - sorted(i)).toLong).sum
      assert(sStat === s, s"type $et")
      assert(trend === (if (s > 0) "increasing"
        else if (s < 0) "decreasing" else "flat"))
      assert(math.abs(sStat) <= nPairs)
    }
  }

  test("langid_confusion_matrix: totals match corpus, cells well-formed") {
    val got = byName("langid_confusion_matrix").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(got.values.sum === nDocs, "every document lands in one cell")
    // row totals = per-lang corpus counts
    val perLang = Tables.documents(spark, sfDir)
      .groupBy(col("lang")).agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.keys.map(_._1).toSet.foreach { (l: String) =>
      assert(got.filter(_._1._1 == l).values.sum === perLang(l))
    }
    // predictions range over the lexicon languages + the abstention cell
    val langs = perLang.keySet + "und"
    assert(got.keys.map(_._2).toSet.subsetOf(langs))
    assert(got.values.forall(_ > 0))
    // NOTE deliberately no accuracy law: the fixture text is shared
    // word soup, so the marker classifier is chance-level here — the
    // matrix exists to MEASURE that, which is the point of the eval.
  }
}
