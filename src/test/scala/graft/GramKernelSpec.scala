package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GramKernel

/** Native word-n-gram kernels (GramHashes.scala): byte parity against
  * the declarative transform/slice/array_join/md5 formulations they
  * replaced in curation.scala, curation48, curation50 and curation60 —
  * on the fixture corpus AND on handcrafted edge cases (empty text,
  * repeated/leading/trailing spaces, multi-byte UTF-8, docs shorter
  * than the gram width). */
class GramKernelSpec extends SparkSpec {

  import spark.implicits._

  private val P = 2147483647L

  /** Edge-case docs exercising tokenizer corners: Spark split(text,' ')
    * keeps empty tokens (consecutive/leading/trailing spaces), the
    * filtered variant drops them, and UTF-8 multi-byte chars must
    * never split. */
  private def edgeDocs: DataFrame = Seq(
    (1L, "a"),
    (2L, "a b"),
    (3L, "a b c d e f g h i j"),
    (4L, "a  b   c d e f g h i j"), // empty tokens between words
    (5L, " leading and trailing spaces padded out to ten tokens "),
    (6L, "héllo wörld ünïcode tokens ß æ ø å 漢字 ελληνικά with more"),
    (7L, ""),
    (8L, "exactly eight tokens here to hit the boundary"),
    (9L, "a a a a a a a a a a") // all-identical grams (distinct collapse)
  ).toDF("doc_id", "text")

  private def corpusDocs: DataFrame =
    Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))

  private def both: DataFrame = corpusDocs.unionByName(edgeDocs
    .withColumn("doc_id", col("doc_id") + 1000000L))

  // ------------------------------------------------ posGramHashes60

  test("pos_gram_hashes60 equals the declarative filtered-token md5 form") {
    val K = 8
    val decl = both
      .select(col("doc_id"),
        expr("filter(split(text, ' '), w -> length(w) > 0)").as("toks"))
      .where(size(col("toks")) >= K)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(toks) - ${K - 1}), " +
          s"i -> struct(i as pos, " +
          s"cast(conv(substring(md5(array_join(slice(toks, i, $K), ' ')), " +
          s"1, 15), 16, 10) as bigint) as h))")).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.h").as("h"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val native = both
      .select(col("doc_id"),
        GramKernel.posGramHashes60(col("text"), K).as(Seq("pos", "h")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(native == decl)
    assert(native.nonEmpty)
  }

  // -------------------------------------------------- ngramHashSet

  test("ngram_hash_set equals the declarative raw-token md5-mod-P form") {
    val n = 8
    val toks = split(col("text"), " ")
    val cnt = size(toks)
    val win = cnt - (n - 1)
    val joined = (1 until n).foldLeft(slice(toks, lit(1), win)) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), win),
        (a, b) => concat(a, lit(" "), b))
    }
    val hashes = transform(joined, g =>
      pmod(conv(substring(md5(g), 1, 8), 16, 10).cast("long"), lit(P)))
    val decl = both.filter(cnt >= n)
      .select(col("doc_id"), array_distinct(hashes).as("ghs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = both
      .select(col("doc_id"), GramKernel.ngramHashSet(col("text"), n, P).as("ghs"))
      .filter(size(col("ghs")) > 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native == decl) // same arrays INCLUDING first-occurrence order
    assert(native.nonEmpty)
  }

  // ------------------------------------------------- distinctGrams

  test("distinct_grams equals the declarative array_distinct/transform form") {
    val decl = both
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 4)
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(0, size(toks) - 4), " +
          "i -> array_join(slice(toks, i + 1, 4), ' '))")).as("grams"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val native = both
      .select(col("doc_id"), GramKernel.distinctGrams(col("text"), 4).as("grams"))
      .filter(size(col("grams")) > 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native == decl)
    assert(native.nonEmpty)
  }

  test("distinct_grams keeps empty tokens from repeated spaces") {
    // "a  b   c ..." -> raw tokens include empties; grams join them
    // with single spaces, so gram strings differ from text substrings
    val grams = edgeDocs.filter(col("doc_id") === 4L)
      .select(explode(GramKernel.distinctGrams(col("text"), 4)).as("g"))
      .collect().map(_.getString(0))
    assert(grams.contains("a  b ")) // tokens: a, "", b, ""
  }

  // ----------------------------------------------------- posGrams

  test("pos_grams equals the declarative posexplode/transform form") {
    val k = 5
    val decl = both
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(toks) - $k), " +
          s"i -> array_join(slice(toks, i + 1, $k), ' '))"))
        .as(Seq("pos", "gram")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val native = both
      .select(col("doc_id"),
        GramKernel.posGrams(col("text"), k).as(Seq("pos", "gram")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(native == decl)
    assert(native.nonEmpty)
  }

  // -------------------------------------------- gramDistinctStats

  test("gram_distinct_stats equals the declarative explode/countDistinct form") {
    val toks = split(col("text"), " ")
    val n = size(toks)
    val t1 = slice(toks, lit(1), n - 2)
    val t2 = slice(toks, lit(2), n - 2)
    val t3 = slice(toks, lit(3), n - 2)
    val decl = both.filter(n >= 3)
      .select(col("doc_id"),
        explode(zip_with(zip_with(t1, t2, (a, b) => concat(a, lit(" "), b)),
          t3, (ab, cc) => concat(ab, lit(" "), cc))).as("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), countDistinct(col("g")).as("n_distinct"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val native = both
      .select(col("doc_id"), GramKernel.gramDistinctStats(col("text"), 3).as("r"))
      .filter(col("r").isNotNull)
      .select(col("doc_id"), col("r.n_grams"), col("r.n_distinct"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(native == decl)
    assert(native.nonEmpty)
  }

  // ----------------------------------------------- bigramRepStats

  test("bigram_rep_stats equals the declarative two-groupBy form") {
    val toks = split(col("text"), " ")
    val n = size(toks)
    val decl = both.filter(n >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
        (a, b) => concat(a, lit(" "), b))).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(coalesce(sum(when(col("c") >= 2, col("c") * length(col("g")))),
        lit(0L)).as("dup_chars"),
        max(col("c") * length(col("g"))).as("top_chars"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val native = both
      .select(col("doc_id"), GramKernel.bigramRepStats(col("text")).as("r"))
      .filter(col("r").isNotNull)
      .select(col("doc_id"), col("r.dup_chars"), col("r.top_chars"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(native == decl)
    assert(native.nonEmpty)
    // unicode doc: top_chars counts CODEPOINTS, not bytes
    assert(native.contains(1000006L))
  }

  // ------------------------------------------------- plan shape

  test("kernel gram passes stay scan-local (no generated exchange)") {
    // the contamination train-side shape: scan -> kernel -> explode ->
    // partial agg; no exchange may appear below the aggregate
    val plan = both
      .select(col("doc_id"),
        explode(GramKernel.ngramHashSet(col("text"), 8, P)).as("gh"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
