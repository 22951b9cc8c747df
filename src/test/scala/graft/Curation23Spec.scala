package graft

import org.apache.spark.sql.functions._

/** Batch-17 invariants: Matryoshka overlap monotonicity, HITS
  * normalization laws, zone-map skipping soundness. */
class Curation23Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("matryoshka_dim_eval: overlaps bounded; corpus-level monotone in dim") {
    val rows = byName("matryoshka_dim_eval").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 10)
    rows.foreach { case (qid, o8, o16) =>
      assert(o8 >= 0L && o8 <= 3L, s"qid $qid overlap8 range")
      assert(o16 >= 0L && o16 <= 3L, s"qid $qid overlap16 range")
    }
    // more prefix dims cannot hurt aggregate agreement with full-dim
    assert(rows.map(_._3).sum >= rows.map(_._2).sum - 2,
      "16-dim agreement collapsed below 8-dim")
  }

  test("hits_hub_authority: e6 normalization, maxima attained, in-degree law") {
    val rows = byName("hits_hub_authority").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 300)
    rows.foreach { case (v, a, h) =>
      assert(a >= 0L && a <= 1000000L, s"node $v auth range")
      assert(h >= 0L && h <= 1000000L, s"node $v hub range")
    }
    assert(rows.map(_._2).max === 1000000L, "auth max not normalized")
    assert(rows.map(_._3).max === 1000000L, "hub max not normalized")
    // every node has out-degree 3, so every node has nonzero hub score
    assert(rows.forall(_._3 > 0L), "a k=3 out-degree node scored hub 0")
    // zero-in-degree nodes must have authority exactly 0
    val edges = graft.queries.GraphQueries.knnEdges(spark, sfDir)
      .select(col("dst")).collect().map(_.getLong(0)).toSet
    rows.filter(r => !edges.contains(r._1)).foreach { case (v, a, _) =>
      assert(a === 0L, s"unreferenced node $v has authority $a")
    }
  }

  test("zone_map_skipping: sound (no match lost), clustering strictly helps") {
    val rows = byName("zone_map_skipping").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val byLayout = rows.map(r => r._1 -> r).toMap
    assert(byLayout.keySet === Set("natural", "clustered"))
    rows.foreach { case (layout, blocks, skipped, total, scanned,
        matching, pm) =>
      assert(skipped <= blocks, s"$layout skipped > blocks")
      // soundness: every matching row is inside a scanned block
      assert(scanned >= matching, s"$layout lost matches to skipping")
      assert(pm === 1000L * scanned / total, s"$layout permille")
    }
    val nat = byLayout("natural")
    val clu = byLayout("clustered")
    assert(nat._4 === clu._4, "row totals differ between layouts")
    assert(nat._6 === clu._6, "match counts differ between layouts")
    assert(clu._5 < nat._5, "clustering did not reduce scanned rows")
    assert(clu._3 > nat._3, "clustering did not increase skipped blocks")
  }
}
