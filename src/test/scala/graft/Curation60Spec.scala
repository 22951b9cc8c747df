package graft

import org.apache.spark.sql.functions._

/** Semantic laws of the exact-substring (duplicated k-gram span) family
  * (curation60): span geometry, maximality, and conservation facts the
  * oracle's hash parity can't state. */
class Curation60Spec extends SparkSpec {

  private val K = 8

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("dup_kgram_spans: spans are well-formed and inside their document") {
    val sp = byName("dup_kgram_spans")
    // a span covers at least one whole k-gram
    assert(sp.filter(col("span_len") < K).count() === 0)
    assert(sp.filter(col("span_len") =!=
      col("span_end") - col("span_start") + 1).count() === 0)
    assert(sp.filter(col("span_start") < 1).count() === 0)
    val docLen = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        expr("size(filter(split(text, ' '), w -> length(w) > 0))")
          .cast("bigint").as("n_toks"))
    assert(sp.join(docLen, Seq("doc_id"))
      .filter(col("span_end") > col("n_toks")).count() === 0)
  }

  test("dup_kgram_spans: spans are maximal (disjoint with real gaps)") {
    // consecutive spans in one doc are separated by >= 1 non-duplicated
    // token, else the island merge would have fused them
    val sp = byName("dup_kgram_spans")
    val gaps = sp.withColumn("prev_end", expr(
      "lag(span_end) over (partition by doc_id order by span_start)"))
      .filter(col("prev_end").isNotNull)
    assert(gaps.filter(col("span_start") <= col("prev_end") + 1).count() === 0)
  }

  test("dup_kgram_spans: every reported span's first gram really duplicates") {
    // recompute gram hashes independently and check the gram starting at
    // span_start occurs >= 2 times corpus-wide
    val occ = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), w -> length(w) > 0)").as("toks"))
      .where(size(col("toks")) >= K)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(toks) - ${K - 1}), " +
          s"i -> struct(i as pos, md5(array_join(slice(toks, i, $K), ' ')) as g))"))
        .as("x"))
      .select(col("doc_id"), col("x.pos").as("pos"), col("x.g").as("g"))
    val counts = occ.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val spans = byName("dup_kgram_spans")
    val spanHead = spans
      .join(occ, spans("doc_id") === occ("doc_id") &&
        spans("span_start") === occ("pos"))
      .join(counts, Seq("g"))
    assert(spanHead.count() > 0)
    assert(spanHead.filter(col("n") < 2).count() === 0)
  }

  test("dup_span_removal_stats: conservation against the span table") {
    val st = byName("dup_span_removal_stats")
    assert(st.filter(col("dup_tokens") > col("total_tokens")).count() === 0)
    assert(st.filter(col("dup_permille") < 0 ||
      col("dup_permille") > 1000).count() === 0)
    assert(st.filter(col("n_docs_hit") > col("n_docs")).count() === 0)
    // total duplicated tokens tie back to the span table
    val sumSpans = byName("dup_kgram_spans")
      .agg(coalesce(sum(col("span_len")), lit(0L))).head().getLong(0)
    val sumStats = st.agg(coalesce(sum(col("dup_tokens")), lit(0L)))
      .head().getLong(0)
    assert(sumSpans === sumStats)
  }

  test("dup_gram_multiplicity: histogram mass equals total gram count") {
    val hist = byName("dup_gram_multiplicity")
    val mass = hist.agg(sum(col("n_occ") * col("n_grams"))).head().getLong(0)
    val totalGrams = Tables.documents(spark, sfDir)
      .select(expr("size(filter(split(text, ' '), w -> length(w) > 0))")
        .as("n"))
      .where(col("n") >= K)
      .agg(sum(col("n") - (K - 1))).head().getLong(0)
    assert(mass === totalGrams)
  }
}
