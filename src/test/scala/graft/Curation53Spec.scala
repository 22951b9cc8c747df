package graft

import org.apache.spark.sql.functions._

/** Batch-53 invariants: exact driver replays of the five closing TPC-H
  * shapes (Q2/Q11/Q15/Q16/Q20) against the fact-derived supplier-part
  * proxy, plus the laws each shape must satisfy (min-cost membership,
  * fraction-gate conservation, max-tie completeness, blacklist
  * exclusion, semi-join scoping). */
class Curation53Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  // fact rows once: (partkey, suppkey, floor(price*100), floor(qty),
  // shipYear)
  private lazy val li: Seq[(Long, Long, Long, Long, Int)] =
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"),
        floor(col("l_extendedprice") * 100).cast("long"),
        floor(col("l_quantity")).cast("long"),
        year(col("l_shipdate")),
        floor(col("l_discount") * 100).cast("long"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))

  // partsupp proxy replay: (partkey, suppkey) -> (minPrice_e2, sumQty)
  private lazy val ps: Map[(Long, Long), (Long, Long)] =
    li.groupBy(x => (x._1, x._2)).view.mapValues { xs =>
      (xs.map(_._3).min, xs.map(_._4).sum)
    }.toMap

  private lazy val suppliers: Seq[(Long, String, Int, Long)] =
    Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        floor(col("s_acctbal") * 100).cast("long"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))

  private lazy val nationName: Map[Int, String] =
    Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap

  private lazy val europeNations: Set[Int] = {
    val reg = Tables.region(spark, sfDir)
      .filter(col("r_name") === "EUROPE")
      .select(col("r_regionkey")).collect().map(_.getInt(0)).toSet
    Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_regionkey")).collect()
      .filter(r => reg(r.getInt(1))).map(_.getInt(0)).toSet
  }

  test("tpch_q2_min_cost_supplier: exact replay incl. deterministic " +
    "top-100 cut; every row carries its part's min cost") {
    val parts = Tables.part(spark, sfDir)
      .filter(col("p_type") === "LARGE" && col("p_size") < 15)
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val eu = suppliers.filter(s => europeNations(s._3))
      .map(s => s._1 -> (s._2, nationName(s._3), s._4)).toMap
    val pse = ps.toSeq.collect {
      case ((pk, sk), (cost, _)) if parts(pk) && eu.contains(sk) =>
        val (name, nat, bal) = eu(sk)
        (pk, name, nat, bal, cost)
    }
    val minCost = pse.groupBy(_._1).view.mapValues(_.map(_._5).min).toMap
    val expected = pse.filter(r => r._5 == minCost(r._1))
      .sortBy(r => (-r._4, r._3, r._2, r._1)).take(100)
    val got = byName("tpch_q2_min_cost_supplier").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("tpch_q11_important_stock: exact replay; kept value mass " +
    "exceeds the fraction gate, dropped mass does not") {
    val n3 = suppliers.filter(s => nationName(s._3) == "NATION_3")
      .map(_._1).toSet
    val values = ps.toSeq.collect {
      case ((pk, sk), (cost, qty)) if n3(sk) => pk -> cost * qty
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val tot = values.values.sum
    val expected = values.filter { case (_, v) => v * 1000L > tot }.toSet
    val got = byName("tpch_q11_important_stock").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
    got.foreach { case (_, v) => assert(v * 1000L > tot) }
  }

  test("tpch_q15_top_supplier: exact replay; result is the complete " +
    "argmax tie set") {
    val rev = li.collect { case (_, sk, price, _, 1996) => (sk, price) }
    // quarter restriction needs the month — recompute from the table
    val q = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("l_suppkey"),
        floor(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - floor(col("l_discount") * 100).cast("long")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val bySupp = q.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val mx = bySupp.values.max
    val names = suppliers.map(s => s._1 -> s._2).toMap
    val expected = bySupp.filter(_._2 == mx)
      .map { case (sk, v) => (sk, names(sk), v) }.toSet
    val got = byName("tpch_q15_top_supplier").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
    assert(rev.nonEmpty) // the year slice the quarter came from is live
  }

  test("tpch_q16_supplier_relationship: exact replay; no blacklisted " +
    "supplier contributes") {
    val attrs = Tables.part(spark, sfDir)
      .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2),
        r.getInt(3))).toMap
    val black = suppliers.filter(_._4 < 0).map(_._1).toSet
    val expected = ps.keySet.toSeq
      .filter { case (pk, sk) => attrs.contains(pk) && !black(sk) }
      .groupBy { case (pk, _) => attrs(pk) }.view
      .mapValues(_.map(_._2).distinct.size.toLong).toMap
      .map { case ((b, t, z), c) => (b, t, z, c) }.toSet
    val got = byName("tpch_q16_supplier_relationship").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("tpch_q20_promotion_stock: exact replay; output scoped to " +
    "EUROPE suppliers") {
    val red = Tables.part(spark, sfDir)
      .filter(col("p_name").startsWith("red"))
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val pairs = li.filter(x => red(x._1)).groupBy(x => (x._1, x._2))
      .view.mapValues { xs =>
        (xs.filter(_._5 == 1996).map(_._4).sum,
          xs.filter(_._5 == 1997).map(_._4).sum)
      }.toMap
    val qualifying = pairs.collect {
      case ((_, sk), (q96, q97)) if q97 > 0 && 2 * q96 > q97 => sk
    }.toSet
    val expected = suppliers
      .filter(s => europeNations(s._3) && qualifying(s._1))
      .map(s => (s._1, s._2)).toSet
    val got = byName("tpch_q20_promotion_stock").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
    got.foreach { case (sk, _) =>
      val nk = suppliers.find(_._1 == sk).get._3
      assert(europeNations(nk))
    }
  }
}
