package graft

import org.apache.spark.sql.functions._

/** Semantic laws of the trained bigram LM family (curation59) — the
  * oracle pins hash parity; these pin the probability-model facts the
  * hashes can't express. */
class Curation59Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("bigram_lm_probs: probabilities are well-formed conditionals") {
    val m = byName("bigram_lm_probs")
    // c(w1 w2) <= c(w1): a context occurrence can open at most one bigram
    assert(m.filter(col("cb") > col("c_ctx")).count() === 0)
    // e6 probability in (0, 1e6]
    assert(m.filter(col("p_e6") <= 0 || col("p_e6") > 1000000).count() === 0)
    // exact fixed-point identity
    assert(m.filter(col("p_e6") =!=
      expr("(cb * 1000000L) div c_ctx")).count() === 0)
  }

  test("bigram_backoff_score: scores only held-out docs, bounded terms") {
    val sc = byName("bigram_backoff_score")
    assert(sc.count() > 0)
    // id-keyed split honored: no train doc is ever scored
    assert(sc.filter(pmod(col("doc_id"), lit(10)) < 8).count() === 0)
    // backoff count bounded by bigram count; mean prob in [0, 1e6]
    assert(sc.filter(col("n_backoff") > col("n_bigrams")).count() === 0)
    assert(sc.filter(col("avg_p_e6") < 0 ||
      col("avg_p_e6") > 1000000).count() === 0)
    // every scored doc has at least one bigram (the scoring unit)
    assert(sc.filter(col("n_bigrams") < 1).count() === 0)
  }

  test("bigram_backoff_score: n_bigrams equals token count - 1 per doc") {
    val sc = byName("bigram_backoff_score")
    val truth = Tables.documents(spark, sfDir)
      .where(pmod(col("doc_id"), lit(10)) >= 8)
      .select(col("doc_id"),
        (expr("size(filter(split(text, ' '), w -> length(w) > 0))") - 1)
          .cast("bigint").as("expect"))
    assert(sc.join(truth, Seq("doc_id"))
      .filter(col("n_bigrams") =!= col("expect")).count() === 0)
  }

  test("lm_score_quality_gate: flags are a subset and sources partition") {
    val g = byName("lm_score_quality_gate")
    assert(g.filter(col("n_flagged") > col("n_docs")).count() === 0)
    // gate doc counts tie back to the score table exactly
    val perSrc = byName("bigram_backoff_score")
      .join(Tables.documents(spark, sfDir).select("doc_id", "source"),
        Seq("doc_id"))
      .groupBy(col("source")).agg(count(lit(1)).as("expect"))
    assert(g.join(perSrc, Seq("source"))
      .filter(col("n_docs") =!= col("expect")).count() === 0)
  }
}
