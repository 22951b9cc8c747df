package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the Curation4 operators — properties the
  * driver's oracle hash-parity can't express (losslessness against an
  * independent brute-force, dominance soundness/completeness,
  * conservation laws). */
class Curation4Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("jaccard_prefix_filter_join equals the brute-force pair join") {
    // Independent Spark-side brute force over the same subset: every
    // ordered pair, exact jaccard, threshold 0.7. Prefix filtering is
    // an optimization, never a semantics change.
    val sub = Corpus.withDups(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(col("doc_id"),
        array_distinct(split(col("text"), " ")).as("toks"))
    val brute = sub.as("a").join(sub.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter",
        size(array_intersect(col("a.toks"), col("b.toks"))).cast("bigint"))
      .withColumn("uni",
        (size(col("a.toks")) + size(col("b.toks"))).cast("bigint") - col("inter"))
      .filter(col("inter") * 10 >= col("uni") * 7)
      .select(col("a.doc_id").as("a"), col("b.doc_id").as("b"),
        expr("(inter * 1000) div uni").as("jacc_permille"))
    val fast = byName("jaccard_prefix_filter_join")
    assert(fast.exceptAll(brute).count() === 0)
    assert(brute.exceptAll(fast).count() === 0)
    assert(fast.count() > 0) // the fixture's injected dups must surface
  }

  test("skyline_pareto is sound and complete w.r.t. dominance") {
    val sky = byName("skyline_pareto").select(col("n_chars"), col("quality_e3"))
    val all = Tables.documents(spark, sfDir)
      .withColumn("quality_e3", expr(
        "(aggregate(transform(split(text, ' '), t -> CAST(length(t) AS BIGINT)), 0L, (a, x) -> a + x) * 1000)" +
          " div CAST(size(split(text, ' ')) AS BIGINT)"))
      .select(col("n_chars"), col("quality_e3")).distinct()
    // dominated(p) iff exists q with q >= p componentwise and q != p
    def dominated = all.as("p").join(all.as("q"),
        col("q.n_chars") >= col("p.n_chars") &&
          col("q.quality_e3") >= col("p.quality_e3") &&
          (col("q.n_chars") > col("p.n_chars") ||
            col("q.quality_e3") > col("p.quality_e3")))
      .select(col("p.n_chars").as("n_chars"),
        col("p.quality_e3").as("quality_e3")).distinct()
    // soundness: no skyline point is dominated
    assert(sky.intersect(dominated).count() === 0)
    // completeness: every non-dominated point is on the skyline
    assert(all.exceptAll(dominated).exceptAll(sky).count() === 0)
  }

  test("cdc_chunk_boundaries conserves tokens and fingerprints per doc") {
    val chunks = byName("cdc_chunk_boundaries")
    val fromChunks = chunks.groupBy(col("doc_id"))
      .agg(sum(col("n_toks")).as("n"), sum(col("fp")).as("fp"))
    val direct = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", pmod(
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"),
        lit(2147483647L)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), sum(col("h")).as("fp"))
    assert(fromChunks.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(fromChunks).count() === 0)
  }

  test("hamming_topk_binary distances are valid and ranks dense per query") {
    val hk = byName("hamming_topk_binary")
    assert(hk.filter(col("hd") < 0 || col("hd") > 60).count() === 0)
    val perQ = hk.groupBy(col("qid"))
      .agg(count(lit(1)).as("n"), sum(col("rn")).as("rnsum"))
    // exactly 5 neighbors per query, ranks 1..5
    assert(perQ.filter(col("n") =!= 5 || col("rnsum") =!= 15L).count() === 0)
  }

  test("bm25_topk scores are positive and ranks strictly ordered") {
    val r = byName("bm25_topk").orderBy(col("rk")).collect()
    assert(r.nonEmpty)
    val scores = r.map(_.getAs[Long]("score_e6"))
    assert(scores.forall(_ > 0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("domain_temperature_sample flattens the mixture toward the tail") {
    val w = byName("domain_temperature_sample").collect()
    val total = w.map(_.getAs[Long]("cnt")).sum.toDouble
    // sqrt temperature: every domain's sampling share must sit between
    // its raw share and the uniform share (the defining property)
    w.foreach { row =>
      val raw = row.getAs[Long]("cnt") / total
      val samp = row.getAs[Long]("permille") / 1000.0
      val uniform = 1.0 / w.length
      val lo = math.min(raw, uniform) - 0.002
      val hi = math.max(raw, uniform) + 0.002
      assert(samp >= lo && samp <= hi,
        s"${row.getAs[String]("source")}: raw=$raw samp=$samp uniform=$uniform")
    }
  }

  test("decayed_user_activity never exceeds the undecayed bound") {
    val r = byName("decayed_user_activity")
    assert(r.filter(col("decay_score") > col("n_events") * 2147483648L)
      .count() === 0)
    assert(r.filter(col("decay_score") <= 0).count() === 0)
  }
}
