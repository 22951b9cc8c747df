package graft

import org.apache.spark.sql.functions._

/** Batch-41 invariants: the five new TPC-H shapes replayed through
  * independent formulations (different plan, same values). */
class Curation47Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("tpch_q6: driver-side replay of the scan-only predicate agg") {
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_extendedprice"), col("l_discount"), col("l_quantity"),
        expr("unix_micros(cast(l_shipdate as timestamp))").as("us"))
      .collect()
    def us(s: String) = java.time.Instant.parse(s).toEpochMilli * 1000L
    val sel = rows.filter { r =>
      val disc = math.floor(r.getDouble(1) * 100).toLong
      r.getLong(3) >= us("1996-01-01T00:00:00Z") &&
        r.getLong(3) < us("1997-01-01T00:00:00Z") &&
        disc >= 5 && disc <= 7 && r.getDouble(2) < 24
    }
    val expRev = sel.map(r => math.floor(r.getDouble(0) * 100).toLong *
      math.floor(r.getDouble(1) * 100).toLong).sum
    val got = byName("tpch_q6_forecast_revenue").head()
    assert(got.getLong(0) === expRev)
    assert(got.getLong(1) === sel.length.toLong)
  }

  test("tpch_q12: high + low counts conserve the joined row count") {
    val got = byName("tpch_q12_priority_by_flag").collect()
    assert(got.nonEmpty)
    val joined = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(got.map(r => r.getLong(1) + r.getLong(2)).sum === joined)
    // independent recount of the high side
    val high = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(spark, sfDir).filter(
        col("o_orderpriority").isin("1-URGENT", "2-HIGH")),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(got.map(_.getLong(1)).sum === high)
  }

  test("tpch_q14: promo share replayed via two separate filtered aggs") {
    val r = byName("tpch_q14_promo_revenue").head()
    val (promo, total, permille) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(promo >= 0 && promo <= total)
    assert(permille === 1000L * promo / total)
    def rev(onlyPromo: Boolean): Long = {
      val li = Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      val p0 = Tables.part(spark, sfDir)
      val p = if (onlyPromo) p0.filter(col("p_type") === "PROMO") else p0
      li.join(p, col("l_partkey") === col("p_partkey"))
        .select((floor(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - floor(col("l_discount") * 100).cast("long")))
          .as("rev"))
        .agg(coalesce(sum(col("rev")), lit(0L))).head().getLong(0)
    }
    assert(rev(onlyPromo = true) === promo)
    assert(rev(onlyPromo = false) === total)
  }

  test("tpch_q18: every returned order exceeds the quantity threshold " +
    "and the ordering is by price desc") {
    val got = byName("tpch_q18_large_orders").collect()
    assert(got.nonEmpty)
    val qtyByOrder = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("q")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      assert(r.getLong(5) > 150L)
      assert(qtyByOrder(r.getLong(2)) === r.getLong(5))
    }
    val prices = got.map(r => (r.getLong(4), r.getLong(2)))
    assert(prices.sortBy(p => (-p._1, p._2)).toSeq === prices.toSeq)
  }

  test("tpch_q19: bracket-union formulation matches the OR-residual join") {
    val got = byName("tpch_q19_bracket_revenue").head()
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_quantity"),
        (floor(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - floor(col("l_discount") * 100).cast("long")))
          .as("rev"))
    val part = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    // union of three separately-filtered equi-joins — a different plan
    // (three joins, no residual) that must agree with the OR form
    val brackets = Seq(
      ("Brand#12", 1, 5, 1.0, 11.0),
      ("Brand#23", 1, 10, 10.0, 20.0),
      ("Brand#34", 1, 15, 20.0, 30.0))
    val uni = brackets.map { case (b, s0, s1, q0, q1) =>
      li.filter(col("l_quantity").between(q0, q1))
        .join(part.filter(col("p_brand") === b &&
          col("p_size").between(s0, s1)),
          col("l_partkey") === col("p_partkey"))
        .select(col("rev"))
    }.reduce(_ unionByName _)
      .agg(coalesce(sum(col("rev")), lit(0L)), count(lit(1))).head()
    assert(uni.getLong(0) === got.getLong(0))
    assert(uni.getLong(1) === got.getLong(1))
  }
}
