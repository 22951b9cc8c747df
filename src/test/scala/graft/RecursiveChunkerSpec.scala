package graft

import org.apache.spark.sql.functions._
import graft.functions.{RecursiveChunker, RecursiveChunks}

/** Golden-case semantics of the separator-aware recursive chunker —
  * each expected list is HAND-TRACED through the published
  * RecursiveCharacterTextSplitter algorithm (keep_separator fragments,
  * greedy merge, overlap pops), so a regression in any branch
  * (separator choice, recursion, merge, strip) breaks a literal. */
class RecursiveChunkerSpec extends SparkSpec {

  test("word-level merge with overlap carry (hand-traced)") {
    // sep " ": fragments ["abc", " def", " ghi"]; size 7 overlap 3.
    // "abc"+" def" fills 7 exactly; " ghi" overflows -> emit "abc def",
    // pop until total<=3 (pops both), then "ghi" alone.
    assert(RecursiveChunker.split("abc def ghi", 7, 3) ===
      Vector("abc def", "ghi"))
  }

  test("paragraph then word fallback (hand-traced)") {
    // "\n\n" chosen; fragments "aaa bbb" (len 7, not < 7 -> recurse on
    // [" ", ""]) and "\n\nccc ddd" (len 9 -> recurse on ["\n", " ", ""]).
    // The second recursion splits on "\n" into ["\n", "\nccc ddd"]; the
    // long tail recurses on " " giving "ccc" / "ddd" after strip.
    assert(RecursiveChunker.split("aaa bbb\n\nccc ddd", 7, 3) ===
      Vector("aaa bbb", "ccc", "ddd"))
  }

  test("single-paragraph text under chunk_size is one stripped chunk") {
    assert(RecursiveChunker.split("  hello world  ", 64, 10) ===
      Vector("hello world"))
    assert(RecursiveChunker.split("", 64, 10) === Vector.empty)
  }

  test("character fallback splits an unbroken run") {
    // no separator occurs -> "" chosen: per-char fragments; emit "abcd"
    // at 'e', pop to overlap 2 ("cd"), then "ef" tops the window up to
    // exactly 4 so the final emit is "cdef"
    assert(RecursiveChunker.split("abcdef", 4, 2) ===
      Vector("abcd", "cdef"))
  }

  test("zero-overlap merge empties the window at every emit") {
    // " cc"+" dd" is 6 > 5, so after "aa bb" the remaining words cannot
    // pair: each overflow pops everything (overlap 0) and emits alone
    assert(RecursiveChunker.split("aa bb cc dd", 5, 0) ===
      Vector("aa bb", "cc", "dd"))
  }

  test("generator expression matches the Scala splitter row for row") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val viaExpr = docs.select(col("doc_id"),
        RecursiveChunks.recursiveChunks(col("text"), 256, 100))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val viaScala = docs.select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        RecursiveChunker.split(r.getString(1), 256, 100).zipWithIndex
          .map { case (c, i) => (r.getLong(0), i.toLong, c) }
      }
    assert(viaExpr.sorted.toSeq === viaScala.sorted.toSeq)
  }

  test("every chunk respects chunk_size unless a single fragment exceeds it") {
    val chunks = Tables.documents(spark, sfDir)
      .select(RecursiveChunks.recursiveChunks(col("text"), 256, 100))
      .select(length(col("chunk")).as("l"))
    assert(chunks.filter(col("l") > 256).count() === 0)
    assert(chunks.count() > 0)
  }
}
