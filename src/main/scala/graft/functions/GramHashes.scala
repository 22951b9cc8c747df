package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram kernels: the scan-local form of the gram
  * pipelines in curation.scala (contamination), curation50
  * (cross-source novelty), curation48 (exact-substring spans) and
  * curation60 (duplicated k-gram spans).
  *
  * The declarative formulations build each gram inside a higher-order
  * `transform` lambda — `array_join(slice(toks, i, k), ' ')`, often
  * followed by md5/conv/substring — and HOF lambdas evaluate
  * INTERPRETED, outside whole-stage codegen: per gram that is an array
  * slice copy, a joined-string allocation, a hex-string md5, a
  * substring and a base-16 parse.  These kernels compute the same
  * values in one pass over the document's UTF-8 bytes: tokens are byte
  * ranges split on 0x20 (UTF-8 multi-byte sequences never contain
  * 0x20, so byte splitting equals Spark's split(text, ' ')), grams of
  * RAW tokens are a contiguous byte range fed to MD5 in a single
  * update, and the hex-prefix reductions read the digest bytes
  * directly — no intermediate strings at all.
  *
  * Byte-exactness contracts (pinned by GramKernelSpec):
  *  - raw tokenization = Java split(" ", -1), i.e. Spark split(text,
  *    ' '): consecutive spaces yield empty tokens, trailing empties
  *    kept;
  *  - filtered tokenization additionally drops empty tokens — Spark's
  *    `filter(split(text, ' '), w -> length(w) > 0)`;
  *  - 8-hex reduction = `conv(substring(md5(g), 1, 8), 16, 10)`: the
  *    first 4 digest bytes as an unsigned 32-bit value;
  *  - 15-hex reduction = `conv(substring(md5(g), 1, 15), 16, 10)`:
  *    the first 60 digest bits as a non-negative int64.
  */
object GramKernel {

  /** Byte offsets of token boundaries in `b`, split on 0x20.
    * Returns an array of 2*(nTokens) ints: (start, end) pairs,
    * end exclusive.  Raw mode: every segment, including empties. */
  private def rawTokenBounds(b: Array[Byte]): Array[Int] = {
    var nSep = 0
    var i = 0
    while (i < b.length) { if (b(i) == 0x20) nSep += 1; i += 1 }
    val bounds = new Array[Int](2 * (nSep + 1))
    var t = 0
    var start = 0
    i = 0
    while (i < b.length) {
      if (b(i) == 0x20) {
        bounds(2 * t) = start; bounds(2 * t + 1) = i
        t += 1; start = i + 1
      }
      i += 1
    }
    bounds(2 * t) = start; bounds(2 * t + 1) = b.length
    bounds
  }

  /** Like [[rawTokenBounds]] but with empty tokens dropped (the
    * `filter(split(text,' '), w -> length(w) > 0)` tokenization).
    * Returns (bounds, nTokens). */
  private def filteredTokenBounds(b: Array[Byte]): (Array[Int], Int) = {
    val raw = rawTokenBounds(b)
    val nRaw = raw.length / 2
    var n = 0
    var t = 0
    while (t < nRaw) {
      if (raw(2 * t + 1) > raw(2 * t)) {
        raw(2 * n) = raw(2 * t); raw(2 * n + 1) = raw(2 * t + 1)
        n += 1
      }
      t += 1
    }
    (raw, n)
  }

  private val SPACE = Array[Byte](0x20)

  /** First 15 hex chars of the digest as a 60-bit non-negative long. */
  private def hex15(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
      ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
      ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
      ((d(6) & 0xffL) << 4) | ((d(7) & 0xffL) >>> 4)

  /** First 8 hex chars of the digest as an unsigned 32-bit long. */
  private def hex8(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)

  /** curation60.gramOccurrences: k-grams of EMPTY-FILTERED tokens,
    * 60-bit md5 hash, one row per occurrence with its 1-based gram
    * index.  Docs with fewer than k tokens yield no rows (the
    * declarative `where(size(toks) >= k)`). */
  def posGramHashes60(s: UTF8String, k: Int): IterableOnce[InternalRow] = {
    val b = s.getBytes
    val (bounds, nTok) = filteredTokenBounds(b)
    val n = nTok - k + 1
    if (n <= 0) return Nil
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[InternalRow](n)
    var i = 0
    while (i < n) {
      // gram = tokens i..i+k-1 joined by ' '; filtered tokens are not
      // contiguous in b when the text has repeated spaces, so feed the
      // digest per token with explicit separators
      var t = 0
      while (t < k) {
        if (t > 0) md.update(SPACE, 0, 1)
        md.update(b, bounds(2 * (i + t)), bounds(2 * (i + t) + 1) - bounds(2 * (i + t)))
        t += 1
      }
      out(i) = InternalRow(i + 1, hex15(md.digest()))
      i += 1
    }
    out
  }

  /** curation.ngramHashes: n-grams of RAW tokens, 32-bit md5 hash mod
    * `p`, per-doc DISTINCT in first-occurrence order.  Docs with fewer
    * than n tokens yield an empty array. */
  def ngramHashSet(s: UTF8String, n: Int, p: Long): ArrayData = {
    val b = s.getBytes
    val bounds = rawTokenBounds(b)
    val nGram = bounds.length / 2 - n + 1
    if (nGram <= 0) return new GenericArrayData(Array.empty[Long])
    val md = java.security.MessageDigest.getInstance("MD5")
    val set = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < nGram) {
      // raw tokens joined by ' ' reconstruct the original byte range
      val from = bounds(2 * i)
      val until = bounds(2 * (i + n - 1) + 1)
      md.update(b, from, until - from)
      set.add(hex8(md.digest()) % p)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** curation50.cross_source_novelty: n-gram STRINGS of RAW tokens,
    * per-doc distinct in first-occurrence order. */
  def distinctGrams(s: UTF8String, n: Int): ArrayData = {
    val b = s.getBytes
    val bounds = rawTokenBounds(b)
    val nGram = bounds.length / 2 - n + 1
    if (nGram <= 0) return new GenericArrayData(Array.empty[UTF8String])
    val set = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < nGram) {
      val from = bounds(2 * i)
      val until = bounds(2 * (i + n - 1) + 1)
      set.add(UTF8String.fromBytes(b, from, until - from))
      i += 1
    }
    new GenericArrayData(set.toArray(Array.empty[AnyRef]))
  }

  /** curation48 gram stream: k-gram STRINGS of RAW tokens with their
    * 0-based gram index (the posexplode convention), one row per
    * occurrence.  Docs with fewer than k tokens yield no rows. */
  def posGrams(s: UTF8String, k: Int): IterableOnce[InternalRow] = {
    val b = s.getBytes
    val bounds = rawTokenBounds(b)
    val n = bounds.length / 2 - k + 1
    if (n <= 0) return Nil
    val out = new Array[InternalRow](n)
    var i = 0
    while (i < n) {
      val from = bounds(2 * i)
      val until = bounds(2 * (i + k - 1) + 1)
      out(i) = InternalRow(i, UTF8String.fromBytes(b, from, until - from))
      i += 1
    }
    out
  }

  /** text.scala text_repetition_ratio: (n_grams, n_distinct) of the
    * raw-token n-grams of one document — the per-doc values the
    * explode + groupBy(doc_id).agg(count, countDistinct) pipeline
    * shuffled the whole gram stream to compute.  Null when the doc has
    * fewer than n tokens (the declarative filter(size >= n)). */
  def gramDistinctStats(s: UTF8String, n: Int): InternalRow = {
    val b = s.getBytes
    val bounds = rawTokenBounds(b)
    val nGram = bounds.length / 2 - n + 1
    if (nGram <= 0) return null
    val set = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < nGram) {
      val from = bounds(2 * i)
      val until = bounds(2 * (i + n - 1) + 1)
      set.add(UTF8String.fromBytes(b, from, until - from))
      i += 1
    }
    InternalRow(nGram.toLong, set.size.toLong)
  }

  /** curation7 gopher_repetition_chars: per-doc duplicated-bigram char
    * mass — dup_chars = sum over bigrams occurring >= 2 times of
    * count * CHARACTER length(gram), top_chars = max over all bigrams
    * of count * length(gram).  Null when the doc has fewer than 2
    * tokens.  Bigrams are raw tokens joined by ' ' (= the contiguous
    * byte range), lengths in codepoints to match Spark's length(). */
  def bigramRepStats(s: UTF8String): InternalRow = {
    val b = s.getBytes
    val bounds = rawTokenBounds(b)
    val nGram = bounds.length / 2 - 1
    if (nGram <= 0) return null
    val counts = new java.util.HashMap[UTF8String, Array[Int]]()
    var i = 0
    while (i < nGram) {
      val from = bounds(2 * i)
      val until = bounds(2 * (i + 1) + 1)
      val g = UTF8String.fromBytes(b, from, until - from)
      val c = counts.get(g)
      if (c == null) counts.put(g, Array(1)) else c(0) += 1
      i += 1
    }
    var dup = 0L
    var top = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0).toLong
      val mass = c * e.getKey.numChars()
      if (c >= 2) dup += mass
      if (mass > top) top = mass
    }
    InternalRow(dup, top)
  }

  // ------------------------------------------------- Column wrappers
  def posGramHashes60(text: Column, k: Int): Column =
    Bridge.column(PosGramHashes60(Bridge.expression(text), k))
  def ngramHashSet(text: Column, n: Int, p: Long): Column =
    Bridge.column(NGramHashSet(Bridge.expression(text), n, p))
  def distinctGrams(text: Column, n: Int): Column =
    Bridge.column(DistinctGrams(Bridge.expression(text), n))
  def posGrams(text: Column, k: Int): Column =
    Bridge.column(PosGrams(Bridge.expression(text), k))
  def gramDistinctStats(text: Column, n: Int): Column =
    Bridge.column(GramDistinctStats(Bridge.expression(text), n))
  def bigramRepStats(text: Column): Column =
    Bridge.column(BigramRepStats(Bridge.expression(text)))
}

private[functions] trait StringArgCheck { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.catalogString)
}

/** text -> one row (pos, h) per k-gram of the empty-filtered tokens:
  * 1-based gram index and 60-bit md5-prefix hash (see
  * [[GramKernel.posGramHashes60]]). */
case class PosGramHashes60(child: Expression, k: Int)
    extends UnaryExpression with Generator with CodegenFallback
    with StringArgCheck {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false)))

  override def prettyName: String = "pos_gram_hashes60"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input).asInstanceOf[UTF8String]
    if (t == null) Nil else GramKernel.posGramHashes60(t, k)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text -> per-doc distinct n-gram 31-bit hash array (see
  * [[GramKernel.ngramHashSet]]). */
case class NGramHashSet(child: Expression, n: Int, p: Long)
    extends UnaryExpression with StringArgCheck {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ngram_hash_set"

  override def nullSafeEval(input: Any): Any =
    GramKernel.ngramHashSet(input.asInstanceOf[UTF8String], n, p)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramKernel.ngramHashSet($c, $n, ${p}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text -> per-doc distinct n-gram string array (see
  * [[GramKernel.distinctGrams]]). */
case class DistinctGrams(child: Expression, n: Int)
    extends UnaryExpression with StringArgCheck {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "distinct_grams"

  override def nullSafeEval(input: Any): Any =
    GramKernel.distinctGrams(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramKernel.distinctGrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text -> struct(n_grams, n_distinct) of the raw-token n-grams (see
  * [[GramKernel.gramDistinctStats]]); null below n tokens. */
case class GramDistinctStats(child: Expression, n: Int)
    extends UnaryExpression with StringArgCheck {

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "gram_distinct_stats"

  override def nullSafeEval(input: Any): Any =
    GramKernel.gramDistinctStats(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.GramKernel.gramDistinctStats($c, $n);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text -> struct(dup_chars, top_chars) of the raw-token bigrams (see
  * [[GramKernel.bigramRepStats]]); null below 2 tokens. */
case class BigramRepStats(child: Expression)
    extends UnaryExpression with StringArgCheck {

  override def dataType: DataType = StructType(Seq(
    StructField("dup_chars", LongType, nullable = false),
    StructField("top_chars", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "bigram_rep_stats"

  override def nullSafeEval(input: Any): Any =
    GramKernel.bigramRepStats(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.GramKernel.bigramRepStats($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text -> one row (pos, gram) per k-gram of the raw tokens, 0-based
  * gram index (see [[GramKernel.posGrams]]). */
case class PosGrams(child: Expression, k: Int)
    extends UnaryExpression with Generator with CodegenFallback
    with StringArgCheck {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def prettyName: String = "pos_grams"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input).asInstanceOf[UTF8String]
    if (t == null) Nil else GramKernel.posGrams(t, k)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
