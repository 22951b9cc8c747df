package graft

import org.apache.spark.sql.functions._
import graft.queries.LayoutKeys

/** Batch-18 invariants: Hilbert-curve bijection/adjacency, layout
  * locality dominance, encoding cost-model recompute, l-diversity
  * completeness, and the consistent-hashing movement law. */
class Curation24Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("hilbert key: bijective on the 64x64 grid with unit-step adjacency") {
    val grid = spark.range(4096)
      .select(expr("id % 64").as("gx"), expr("id div 64").as("gy"))
    val keyed = LayoutKeys.withHilbert(grid, col("gx"), col("gy"), "hkey")
      .select(col("hkey"), col("gx"), col("gy")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(keyed.map(_._1).toSeq === (0L until 4096L), "not a bijection")
    keyed.sliding(2).foreach { case Array((d1, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x2 - x1) + math.abs(y2 - y1) === 1,
        s"non-adjacent step after d=$d1: ($x1,$y1)->($x2,$y2)")
    }
  }

  test("layout_locality_audit: hilbert blocks dominate morton blocks") {
    val rows = byName("layout_locality_audit").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.keySet === Set("hilbert", "morton"))
    val (_, hSum, hMax) = rows("hilbert")
    val (_, mSum, mMax) = rows("morton")
    assert(hSum <= mSum, s"hilbert sum_area $hSum > morton $mSum")
    assert(hMax <= mMax, s"hilbert max_area $hMax > morton $mMax")
    // every block's bbox is within the grid
    assert(hMax <= 64L * 64L && mMax <= 64L * 64L)
  }

  test("encoding_size_estimate: exact recompute from the raw column data") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_chars").cast("string").as("n_chars"))
      .collect().sortBy(_.getLong(0))
    val cols = Map(
      "lang" -> docs.map(_.getString(1)),
      "source" -> docs.map(_.getString(2)),
      "n_chars" -> docs.map(_.getString(3)))
    val got = byName("encoding_size_estimate").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet === cols.keySet)
    cols.foreach { case (name, vs) =>
      val n = vs.length.toLong
      val distinct = vs.distinct
      val plainBits = vs.map(_.length.toLong * 8).sum
      val heads = vs.indices.filter(i => i == 0 || vs(i) != vs(i - 1))
      val rleBits = heads.map(i => vs(i).length.toLong * 8 + 16).sum
      val codeBits =
        if (distinct.length == 1) 0L
        else java.lang.Long.toBinaryString(distinct.length - 1L).length.toLong
      val dictBits = distinct.map(_.length.toLong).sum * 8 + n * codeBits
      val r = got(name)
      assert(r.getLong(1) === n, s"$name n_values")
      assert(r.getLong(2) === distinct.length.toLong, s"$name n_distinct")
      assert(r.getLong(3) === heads.length.toLong, s"$name n_runs")
      assert(r.getLong(4) === plainBits, s"$name plain_bits")
      assert(r.getLong(5) === dictBits, s"$name dict_bits")
      assert(r.getLong(6) === rleBits, s"$name rle_bits")
      val best = if (dictBits <= plainBits && dictBits <= rleBits) "dict"
        else if (rleBits <= plainBits) "rle" else "plain"
      assert(r.getString(7) === best, s"$name best_encoding")
    }
  }

  test("l_diversity_audit: exactly the classes with < 5 distinct sources") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("lang"), col("n_chars"), col("source")).collect()
      .map(r => ((r.getString(0), r.getLong(1) / 50), r.getString(2)))
    val expected = docs.groupBy(_._1).map { case (k, grp) =>
      k -> (grp.length.toLong, grp.map(_._2).distinct.length.toLong)
    }.filter(_._2._2 < 5)
    val got = byName("l_diversity_audit").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === expected)
    assert(got.nonEmpty, "audit found no sparse classes — tighten bucket")
  }

  test("shard_assign_consistent: only the new node captures moved keys") {
    val rows = byName("shard_assign_consistent").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.length.toLong === nDocs, "one row per doc")
    val old = (0 until 4).map(i => s"n$i").toSet
    rows.foreach { case (id, n4, n5, moved) =>
      assert(old.contains(n4), s"doc $id routed to unknown node $n4")
      assert((old + "n4").contains(n5), s"doc $id routed to unknown $n5")
      assert(moved === (if (n4 != n5) 1L else 0L), s"doc $id moved flag")
      if (n4 != n5)
        assert(n5 === "n4", s"doc $id moved to $n5, not the new node")
    }
    val frac = rows.count(_._4 == 1L).toDouble / rows.length
    assert(frac > 0.02 && frac < 0.45,
      f"moved fraction $frac%.3f outside the ~1/5 envelope")
  }
}
