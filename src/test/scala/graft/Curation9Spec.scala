package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the curation9 batch. */
class Curation9Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("mmr_rerank_top3 replays the greedy argmax loop exactly") {
    // rebuild candidate pools + sims from raw embeddings
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def e6(x: Double): Long = math.floor(x * 1000000).toLong
    val got = byName("mmr_rerank_top3").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    (0L until 5L).foreach { qid =>
      val rel = emb.keys.filter(_ != qid).toSeq
        .map(cid => cid -> e6(cos(emb(qid), emb(cid))))
      val pool = rel.sortBy { case (cid, r) => (-r, cid) }.take(10).toMap
      def pick(scores: Map[Long, Long]): Long =
        scores.toSeq.sortBy { case (cid, sc) => (-sc, cid) }.head._1
      val p1 = pick(pool)
      val rest2 = (pool - p1).map { case (cid, r) =>
        cid -> (r - e6(cos(emb(cid), emb(p1))))
      }
      val p2 = pick(rest2)
      val rest3 = (pool - p1 - p2).map { case (cid, r) =>
        cid -> (r - math.max(e6(cos(emb(cid), emb(p1))),
          e6(cos(emb(cid), emb(p2)))))
      }
      val p3 = pick(rest3)
      assert(got((qid, 1L)) === p1, s"qid $qid round 1")
      assert(got((qid, 2L)) === p2, s"qid $qid round 2")
      assert(got((qid, 3L)) === p3, s"qid $qid round 3")
    }
    // all selections distinct within a query
    val sel = byName("mmr_rerank_top3").collect()
      .groupBy(_.getLong(0)).values
    sel.foreach(rows =>
      assert(rows.map(_.getLong(2)).distinct.length === rows.length))
  }

  test("k_anonymity_violations flags exactly the small classes") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("lang"), col("source"),
        expr("(size(split(text, ' ')) div 25)").cast("long").as("b"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val classes = docs.groupBy(identity).view.mapValues(_.length.toLong)
    val got = byName("k_anonymity_violations").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        r.getLong(3)).toMap
    classes.foreach { case (key, n) =>
      if (n < 5) assert(got.get(key).contains(n), s"missing $key")
      else assert(!got.contains(key), s"spurious $key")
    }
  }

  test("unigram_sampling_weights: exact c^0.75 and ranked shares") {
    val got = byName("unigram_sampling_weights").collect()
    assert(got.length === 30)
    val counts = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def w(c: Long): Long =
      math.floor(math.sqrt(c.toDouble * math.sqrt(c.toDouble)) * 1000).toLong
    val tw = counts.values.map(w).sum
    got.foreach { r =>
      val (tok, c, we3, ppm) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(c === counts(tok))
      assert(we3 === w(c), s"tok $tok weight")
      assert(ppm === we3 * 1000000L / tw, s"tok $tok share")
    }
    // descending share order with tok tiebreak was applied
    val shares = got.map(_.getLong(3)).toSeq
    assert(shares === shares.sorted.reverse)
    // the 3/4 power flattens: top-token share under plain-count share
    val topTok = counts.maxBy { case (t, c) => (c, t) }
    val plainShare = topTok._2 * 1000000L / counts.values.sum
    assert(got.head.getLong(3) <= plainShare)
  }

  test("heaps_vocab_growth is monotone and exact at the full cut") {
    val rows = byName("heaps_vocab_growth").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1L to 10L))
    // monotone nondecreasing in both coordinates
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3)
    }
    // k=10 cut covers every doc: equals global token count and vocab
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("t"))
    assert(rows.last._2 === toks.count())
    assert(rows.last._3 === toks.distinct().count())
    // sublinearity (Heaps): vocab grows slower than tokens
    val (k1, kLast) = (rows.head, rows.last)
    assert(kLast._3.toDouble / k1._3 < kLast._2.toDouble / k1._2)
  }
}
