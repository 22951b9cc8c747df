package graft

import org.apache.spark.sql.functions._

/** Pins the fixture preconditions that the DuckDB oracle SQL relies on.
  *
  * Several oracle CTEs substitute a bounded integer range for an
  * unsupported lateral generate_series (DuckDB 1.0), and one stub hashes
  * UTF-8 bytes while its oracle sums Unicode codepoints — both are exact
  * only while the fixture stays inside the bounds asserted here:
  *
  *  - shingle/token generators join `range(0, 4096)`
  *    (DedupQueries.shinglesSql, TextQueries bigram CTE): any document
  *    with >= 4096 whitespace tokens would silently lose shingles on the
  *    oracle side only.
  *  - chunk/frame generators join `range(0, 64)`
  *    (chunk_text_overlap, media_frame_sample): bound breached when a
  *    document needs >= 64 chunks (chunk stride 156 chars) or a video
  *    stub needs >= 64 frames (n_chars/25).
  *  - media_feature_extract's stub now folds Unicode codepoints on both
  *    engines (MediaCodec.decodeStub / oracle `unicode(c)`), but the
  *    ASCII pin below stays as a tripwire for any future byte-indexed
  *    stub arithmetic (byte == codepoint only holds for ASCII).
  *
  * If the driver regenerates fixtures and any assertion here fails, the
  * oracle caps (not the Spark plans) must be raised to match.
  */
class FixtureBoundsSpec extends SparkSpec {

  private def stats(dir: String) = {
    val d = Tables.documents(spark, dir)
      .select(
        size(split(col("text"), " ")).as("ntok"),
        length(col("text")).as("nlen"),
        col("text").rlike("^[ -~]*$").as("ascii"))
      .agg(max(col("ntok")), max(col("nlen")), min(col("ascii")))
      .head()
    (d.getInt(0), d.getInt(1), d.getBoolean(2))
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    val dir = s"/root/testdata/$sf"

    test(s"$sf: token count stays far under the range(0,4096) oracle cap") {
      val (maxTok, _, _) = stats(dir)
      assert(maxTok < 2048, s"max tokens $maxTok approaches oracle cap 4096")
    }

    test(s"$sf: chunk and frame counts stay under the range(0,64) caps") {
      val (_, maxLen, _) = stats(dir)
      // chunk_text_overlap: ceil(maxLen / 156) chunks; frame stub: n_chars/25
      assert(maxLen / 156 + 1 < 64, s"doc of $maxLen chars needs >= 64 chunks")
      assert(maxLen / 25 < 64, s"doc of $maxLen chars yields >= 64 stub frames")
    }

    test(s"$sf: char-symbol counts stay under bpe_train_merges' " +
      "range(0,8192) oracle cap") {
      val (_, maxLen, _) = stats(dir)
      // one symbol per char after charification; winnowing's 4096 cap
      // on positions is implied by the same bound
      assert(maxLen < 4096, s"doc of $maxLen chars breaches the " +
        "winnow/bpe oracle position caps")
    }

    test(s"$sf: document text is printable ASCII (byte == codepoint)") {
      val (_, _, ascii) = stats(dir)
      assert(ascii, "non-ASCII text breaks media_feature_extract oracle parity")
    }

    test(s"$sf: documents are >= 3 chars (media stub f0..f2 vs substr)") {
      // MediaCodec.decodeStub wraps the index (cps(i % len)) while the
      // oracle's substr(text, i, 1) returns '' past the end — identical
      // only while every document has at least 3 codepoints.
      val minLen = Tables.documents(spark, dir)
        .agg(min(length(col("text")))).head().getInt(0)
      assert(minLen >= 3, s"doc of $minLen chars diverges stub vs substr")
    }

    test(s"$sf: line and bigram counts stay under the round-4 oracle caps") {
      val (maxTok, _, _) = stats(dir)
      // c4_line_filter: (maxTok-1) div 10 + 1 lines vs range(0, 16);
      // bigram_lm_score: maxTok - 1 bigrams vs range(0, 128)
      assert((maxTok - 1) / 10 + 1 < 16,
        s"doc of $maxTok tokens needs >= 16 lines (c4_line_filter cap)")
      assert(maxTok - 1 < 128,
        s"doc of $maxTok tokens yields >= 128 bigrams (bigram_lm_score cap)")
    }

    test(s"$sf: per-term document frequency stays under the " +
      "postings_delta_encode range(2,8192) cap") {
      val maxDf = Tables.documents(spark, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) >= 4).distinct()
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .agg(max(col("df"))).head().getLong(0)
      assert(maxDf < 8191,
        s"df $maxDf reaches the oracle's gap-position cap")
    }

    test(s"$sf: word length stays under the bpe_merge_step range(0,16) cap") {
      val maxWlen = Tables.documents(spark, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .agg(max(length(col("tok")))).head().getInt(0)
      assert(maxWlen < 16,
        s"word of $maxWlen chars exceeds the oracle's position cap")
    }
  }
}
