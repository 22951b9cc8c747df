package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-4 operators (oracle hash-parity is
  * the driver's job; these pin the properties the hashes can't express). */
class Round4Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("c4_line_filter keeps a subset of lines and rejoins only survivors") {
    val c = byName("c4_line_filter")
    assert(c.filter(col("n_kept") > col("n_lines")).count() === 0)
    // cleaned text has exactly n_kept newline-separated lines (or empty)
    val bad = c.filter(col("n_kept") > 0 &&
      size(split(col("cleaned_text"), "\n")) =!= col("n_kept"))
    assert(bad.count() === 0)
    assert(c.filter(col("n_kept") === 0 &&
      col("cleaned_text") =!= "").count() === 0)
    // every kept line satisfies the predicates it was filtered by
    val lines = c.filter(col("n_kept") > 0)
      .select(explode(split(col("cleaned_text"), "\n")).as("l"))
      .select(size(split(col("l"), " ")).as("nt"),
        size(array_distinct(split(col("l"), " "))).as("nd"))
    assert(lines.filter(col("nt") < 5 || col("nd") < 3).count() === 0)
  }

  test("dedup_incremental survivors carry no fingerprint seen in history") {
    val surv = byName("dedup_incremental")
    // survivors are unique doc ids, and none is an even base id (history)
    assert(surv.count() === surv.select(col("doc_id")).distinct().count())
    assert(surv.filter(col("doc_id") < 1000000L &&
      pmod(col("doc_id"), lit(2)) === 0).count() === 0)
    // exact-dup injections whose base text sits in history (even base id,
    // doc_id % 50 = 0 for the near-dup set is irrelevant: exact ids are
    // base % 25 = 0) must NOT survive when the base id is even
    val evenBaseExactDups = surv.filter(col("doc_id") >= 2000000L &&
      pmod(col("doc_id") - 2000000L, lit(2)) === 0)
    assert(evenBaseExactDups.count() === 0)
  }

  test("length_outlier_filter keeps ~90% inside an ordered band") {
    val r = byName("length_outlier_filter")
    val t = r.agg(sum(col("n_kept")), sum(col("n_dropped")),
      min(col("lo_toks")), max(col("hi_toks"))).head()
    val (kept, dropped) = (t.getLong(0), t.getLong(1))
    assert(t.getLong(2) <= t.getLong(3)) // lo <= hi
    val frac = kept.toDouble / (kept + dropped)
    assert(frac > 0.85 && frac <= 1.0, s"kept fraction $frac")
  }

  test("vocab_oov_rate bounds: oov <= total, permille in [0, 1000]") {
    val v = byName("vocab_oov_rate")
    assert(v.filter(col("n_oov") > col("n_toks")).count() === 0)
    assert(v.filter(col("oov_permille") < 0 ||
      col("oov_permille") > 1000).count() === 0)
    // top-16 of a 31-token vocabulary must leave some OOV mass somewhere
    assert(v.agg(sum(col("n_oov"))).head().getLong(0) > 0)
  }

  test("kmeans assigns every vector to its nearest centroid's cluster") {
    val a = byName("kmeans_cluster_assign")
    assert(a.count() === Tables.embeddings(spark, sfDir).count())
    // 8 clusters max, distances non-negative
    assert(a.select(col("cluster")).distinct().count() <= 8)
    assert(a.filter(col("dist") < 0).count() === 0)
    // init members (vec 0..7) have dist 0 in pass 1; after the update
    // pass distances stay finite and clusters stay in [0, 8)
    assert(a.filter(col("cluster") < 0 || col("cluster") > 7).count() === 0)
  }

  test("semdedup_prune drops only injected copies, each blamed on an earlier twin") {
    val p = byName("semdedup_prune")
    // every pruned vector is one of the injected exact copies, whose
    // earlier twin (vec_id - 10000) exists in the same cluster
    assert(p.filter(col("vec_id") < 10000).count() === 0)
    assert(p.filter(col("dup_of") > col("vec_id")).count() === 0)
    assert(p.filter(col("cos_e6") < 999000).count() === 0)
    val n = Tables.embeddings(spark, sfDir)
      .filter(pmod(col("vec_id"), lit(25)) === 0).count()
    assert(p.count() === n, s"expected all $n injected copies pruned")
  }

  test("pagerank_knn conserves bounded rank mass and covers all nodes") {
    val pr = byName("pagerank_knn")
    assert(pr.count() === 300)
    // rank stays within [0.15, teleport + full damping share] scaled 1e6
    assert(pr.filter(col("pr_e6") < 150000).count() === 0)
    // total mass stays near n * 1e6 (integer floors only lose mass)
    val total = pr.agg(sum(col("pr_e6"))).head().getLong(0)
    assert(total <= 300L * 1000000 && total > 250L * 1000000,
      s"total rank mass $total out of band")
  }

  test("bigram_lm_score is a permille-style bounded mean over real bigrams") {
    val b = byName("bigram_lm_score")
    // every scored doc has >= 1 bigram; score in (0, 1e6]
    assert(b.filter(col("n_bigrams") < 1).count() === 0)
    assert(b.filter(col("lm_score_e6") <= 0 ||
      col("lm_score_e6") > 1000000).count() === 0)
  }

  test("domain_mixture_rebalance never upsamples and hits the target cap") {
    val m = byName("domain_mixture_rebalance")
    assert(m.filter(col("sample_rate_permille") > 1000).count() === 0)
    assert(m.filter(col("sampled_tokens") > col("n_tokens")).count() === 0)
    // post-sampling, every domain is at or under the uniform target
    val t = m.agg(sum(col("n_tokens"))).head().getLong(0)
    val target = t / m.count()
    assert(m.filter(col("sampled_tokens") > target).count() === 0)
  }

  test("random_projection_reduce is linear: proj(v) stable across runs") {
    val p1 = byName("random_projection_reduce").collect().map(_.toSeq).toSet
    val p2 = byName("random_projection_reduce").collect().map(_.toSeq).toSet
    assert(p1 == p2) // deterministic fixed hyperplanes, no RNG state
  }
}
