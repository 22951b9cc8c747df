package graft

import org.apache.spark.sql.functions._

/** Dedup-family invariants on the injected-duplicate corpus. */
class DedupSpec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("minhash estimator: exact dups score 1000, deviation bounded") {
    val rows = byName("minhash_jaccard_estimate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // an exact copy shares every shingle: estimator and truth both 1000
    rows.filter(r => r._2 == r._1 + 2000000L).foreach { r =>
      assert(r._3 == 1000L && r._4 == 1000L, s"pair (${r._1},${r._2})")
    }
    // 16-hash estimator: per-pair deviation within ~5 sigma of the
    // binomial sd at J~0.9 (sd ~ 75e-3), and small in aggregate
    rows.foreach { r =>
      assert(math.abs(r._3 - r._4) <= 400, s"pair (${r._1},${r._2})")
    }
    val meanAbs = rows.map(r => math.abs(r._3 - r._4)).sum / rows.length
    assert(meanAbs <= 150, s"mean |est - exact| = $meanAbs")
  }

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

  test("oracle generator caps hold on the correctness-gate fixture") {
    // The DuckDB oracles enumerate bounded ranges where Spark has true
    // generators: shinglesSql range(0,4096) token positions, chunksSql
    // range(0,64) chunks, media_frame_sample range(0,64) frames. A
    // fixture document exceeding a bound would silently diverge the
    // oracle, so pin the bounds at sf0.01 (the driver's gate scale).
    val d01 = "/root/testdata/sf0.01"
    val c = Corpus.withDups(spark, d01)
    val maxTok = c.select(max(size(split(col("text"), " ")))).head.getInt(0)
    assert(maxTok - 3 < 4096, s"shingle oracle cap: $maxTok tokens")
    val docs = Tables.documents(spark, d01)
    val maxChunks = docs.select(max(
      lit(1) + greatest(lit(0),
        ceil((length(col("text")) - 256) / 156.0).cast("int")))).head.getInt(0)
    assert(maxChunks <= 64, s"chunk oracle cap: $maxChunks chunks")
    val maxFrames = docs.select(max(expr("(n_chars * 40) div 1000")))
      .head.getLong(0)
    assert(maxFrames < 64, s"frame oracle cap: $maxFrames frames")
    // media f0..f2 index the first 3 codepoints without the oracle's
    // wrap-around; guaranteed meaningful only for texts >= 3 chars
    val minLen = docs.select(min(length(col("text")))).head.getInt(0)
    assert(minLen >= 3, s"shortest doc: $minLen chars")
  }

  test("embedding cosine near-dup finds every injected copy pair") {
    val pairs = byName("dedup_embedding_cosine")
    val copies = pairs.filter(col("b") - col("a") === 10000L)
    // full-table corpus now: every injected copy must collide with its
    // source in the same LSH bucket (identical embedding -> identical
    // signature) and survive the cosine verify
    val expected = Tables.embeddings(spark, sfDir)
      .filter(pmod(col("vec_id"), lit(25)) === 0).count()
    assert(copies.count() === expected)
  }

  test("embedding cosine near-dup plans a bucket equi-join, " +
    "never an all-pairs product") {
    val plan = SparkEntry.registry.find(_.name == "dedup_embedding_cosine")
      .get.fn(spark, sfDir).queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
