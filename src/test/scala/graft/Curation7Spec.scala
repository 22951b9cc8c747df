package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-4 continuation batch (curation7):
  * each law recomputes the operator's defining property directly in
  * Scala — properties a hash-parity check can't express. */
class Curation7Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  // ---------------------------------------------------------- winnowing

  /** Driver-side replica of the query's fingerprint definition. */
  private def winnowLocal(text: String, k: Int = 8, w: Int = 4): Set[Long] = {
    val p = 2147483647L
    val md = java.security.MessageDigest.getInstance("MD5")
    def h31(g: String): Long = {
      val hex = md.digest(g.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % p
    }
    val hs = (0 to text.length - k).map(i => h31(text.substring(i, i + k)))
    hs.sliding(w).map(_.min).toSet
  }

  test("winnow_fingerprints matches a sequential recompute per doc") {
    val got = byName("winnow_fingerprints")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
    var checked = 0
    docs.take(25).foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      if (text.length >= 11) {
        val fps = winnowLocal(text)
        val (n, lo, hi) = got(id)
        assert(n === fps.size.toLong, s"doc $id n_fps")
        assert(lo === fps.min, s"doc $id fp_min")
        assert(hi === fps.max, s"doc $id fp_max")
        checked += 1
      }
    }
    assert(checked > 0)
  }

  test("winnowing guarantee: a shared >= k+w-1 span shares a fingerprint") {
    // any two strings sharing an 11-char window must share >= 1 fp
    val a = "xqzv shared-span-alpha-beta tail one"
    val b = "completely other prefix shared-span-alpha-beta"
    assert(winnowLocal(a).intersect(winnowLocal(b)).nonEmpty)
  }

  // ---------------------------------------------------------- MAP@20

  test("map_at_20 equals AP recomputed from the ranked relevance rows") {
    val ranked = graft.queries.VectorQueries.rankedRelevant(spark, sfDir)
      .filter(col("rank") <= 20)
      .select(col("qid"), col("rank"), col("relevant"))
      .collect().groupBy(_.getLong(0))
    val got = byName("map_at_20").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.size === 20)
    ranked.foreach { case (qid, rows) =>
      val byRank = rows.sortBy(_.getLong(1))
      var cum = 0L
      var psum = 0L
      var nrel = 0L
      byRank.foreach { r =>
        val rel = r.getBoolean(2)
        if (rel) {
          cum += 1; nrel += 1
          psum += (cum * 1000000L) / r.getLong(1)
        }
      }
      val ap = if (nrel == 0) 0L else psum / nrel
      assert(got(qid) === ((nrel, ap)), s"qid $qid")
    }
  }

  // ---------------------------------------------------------- PMI

  test("collocation_pmi scores recompute from raw token counts") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("text")).collect().map(_.getString(0))
    val toks = docs.map(_.split(" ").toSeq)
    val nu = toks.map(_.size).sum.toLong
    val bigrams = toks.flatMap(t => t.zip(t.drop(1)))
    val nb = bigrams.size.toLong
    val cu = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cb = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = byName("collocation_pmi").collect()
    assert(got.length <= 20 && got.nonEmpty)
    got.foreach { r =>
      val (x, y, cxy, score) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
      assert(cb((x, y)) === cxy, s"count($x,$y)")
      val expected = (cxy * nu * nu * 1000L) / (nb * cu(x) * cu(y))
      assert(score === expected, s"score($x,$y)")
      assert(cxy >= 3)
    }
    // top-20 really is the max: no unreturned pair scores above the cut
    val cut = got.map(_.getLong(3)).min
    val better = cb.iterator.filter { case ((x, y), c) =>
      c >= 3 && (c * nu * nu * 1000L) / (nb * cu(x) * cu(y)) > cut
    }.size
    assert(better <= got.count(_.getLong(3) > cut) + 20 - got.length)
  }

  // ---------------------------------------------------------- overlap graph

  test("overlap_graph_edges recovers every intra-doc chunk adjacency") {
    val ch = graft.queries.VectorQueries.chunks(spark, sfDir)
      .select(col("doc_id"), col("chunk_idx"), length(col("chunk")).as("l"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val edges = byName("overlap_graph_edges").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // completeness: full chunk i with an existing successor -> edge (i,i+1)
    var expected = 0
    ch.foreach { case ((doc, idx), len) =>
      if (len == 256 && ch.contains((doc, idx + 1))) {
        assert(edges.contains((doc, idx, doc, idx + 1)),
          s"missing adjacency $doc:$idx -> ${idx + 1}")
        expected += 1
      }
    }
    assert(expected > 0, "fixture produced no multi-chunk docs")
    // soundness spot-check: sampled edges really overlap in text
    val texts = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    edges.take(20).foreach { case (sd, si, dd, di) =>
      val suffix = texts(sd).substring((si * 156 + 156).toInt,
        (si * 156 + 256).toInt)
      val prefix = texts(dd).substring((di * 156).toInt,
        math.min((di * 156 + 100).toInt, texts(dd).length))
      assert(suffix === prefix, s"edge $sd:$si -> $dd:$di")
    }
  }

  // ---------------------------------------------------------- Gopher chars

  test("gopher_repetition_chars recomputes per doc") {
    val got = byName("gopher_repetition_chars").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
    docs.take(25).foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val t = text.split(" ").toSeq
      if (t.size >= 2) {
        val grams = t.zip(t.drop(1)).map { case (a, b) => s"$a $b" }
        val counts = grams.groupBy(identity).view.mapValues(_.size.toLong)
        val dup = counts.collect {
          case (g, c) if c >= 2 => c * g.length
        }.sum
        val top = counts.map { case (g, c) => c * g.length }.max
        val tlen = text.length.toLong
        assert(got(id) === ((dup * 1000 / tlen, top * 1000 / tlen)),
          s"doc $id")
      }
    }
  }
}
