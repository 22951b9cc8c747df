package graft

import org.apache.spark.sql.functions._

/** Dedup-family invariants on the injected-duplicate corpus. */
class DedupSpec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("exact dedup finds every injected exact duplicate") {
    val dups = byName("dedup_exact").filter(col("n_copies") >= 2)
    // every doc_id % 25 == 0 original got an exact copy at +2,000,000
    val expected = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(25)) === 0).count()
    assert(dups.count() >= expected)
    // keep_id is always the smallest id of its content group
    val keeps = byName("dedup_exact")
      .filter(col("keep_id") >= 2000000L && col("n_copies") >= 2).count()
    assert(keeps === 0, "kept a shifted copy instead of the original")
  }

  test("minhash-lsh catches the exact duplicates (jaccard = 1)") {
    val pairs = byName("dedup_minhash_lsh")
    val exact = pairs.filter(col("jaccard_e3") === 1000)
    val expected = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(25)) === 0).count()
    assert(exact.count() >= expected,
      s"expected >= $expected jaccard-1.0 pairs")
    // candidate verification never emits a below-threshold pair
    assert(pairs.filter(col("jaccard_e3") < 500).count() === 0)
  }

  test("simhash hamming 0 for exact copies") {
    val pairs = byName("dedup_simhash")
    val exactPairs = pairs.filter(
      col("b") - col("a") === 2000000L && col("hamming") === 0)
    val expected = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(25)) === 0).count()
    assert(exactPairs.count() === expected)
  }

  test("ngram jaccard of 90%-prefix near-dups is high but below 1") {
    val rows = byName("dedup_ngram_jaccard").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getAs[Long]("jaccard_e3")
      assert(j >= 500 && j <= 1000, s"pair ${r.get(0)}->${r.get(1)}: $j")
    }
  }

  test("embedding cosine near-dup finds every injected copy pair") {
    val pairs = byName("dedup_embedding_cosine")
    val copies = pairs.filter(col("b") - col("a") === 10000L)
    val expected = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 200)
      .filter(pmod(col("vec_id"), lit(25)) === 0).count()
    assert(copies.count() === expected)
  }
}
