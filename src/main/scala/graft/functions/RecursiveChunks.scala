package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Separator-aware recursive text chunker with the EXACT semantics of
  * LangChain's `RecursiveCharacterTextSplitter(chunk_size, chunk_overlap)`
  * — the splitter the reference builds its RAG chunks with
  * (rag_evaluation/RAG-eval-test_model.py:239-240,
  * train_adapters/RAG-eval-create_model.py:7), re-implemented from the
  * published algorithm (not translated code):
  *
  *  1. Pick the first separator from ["\n\n", "\n", " ", ""] that occurs
  *     in the text ("" always matches: per-character split).
  *  2. Split keeping each separator attached to the FRONT of the
  *     following fragment (keep_separator=True, the class default).
  *  3. Fragments shorter than chunk_size accumulate; a fragment at or
  *     over chunk_size first flushes the accumulated run through the
  *     greedy merge, then recurses on itself with the REMAINING
  *     separators (paragraph -> sentence-ish line -> word -> char).
  *  4. Greedy merge packs consecutive fragments while the running total
  *     stays <= chunk_size, emits the joined chunk stripped of
  *     surrounding whitespace, then pops fragments from the front until
  *     the retained tail is <= chunk_overlap AND the incoming fragment
  *     fits — the tail becomes the next chunk's overlap.
  *
  * Lengths count java chars (fixture text is ASCII; LangChain counts
  * codepoints — identical here and documented as the deviation bound).
  */
object RecursiveChunker {

  val DefaultSeparators: Seq[String] = Seq("\n\n", "\n", " ", "")

  def split(text: String, chunkSize: Int, overlap: Int,
      separators: Seq[String] = DefaultSeparators): Vector[String] =
    splitRec(text, separators, chunkSize, overlap)

  /** Fragment boundaries at each separator occurrence, separator kept at
    * the head of the following fragment; empty fragments dropped (a
    * leading separator yields an empty first fragment, dropped too). */
  private[functions] def splitKeepSep(text: String, sep: String): Vector[String] = {
    if (sep.isEmpty) return text.map(_.toString).toVector
    val parts = Vector.newBuilder[String]
    var prev = 0
    var i = text.indexOf(sep)
    while (i >= 0) {
      parts += text.substring(prev, i)
      prev = i
      i = text.indexOf(sep, i + sep.length)
    }
    parts += text.substring(prev)
    parts.result().filter(_.nonEmpty)
  }

  private def splitRec(text: String, seps: Seq[String], size: Int,
      overlap: Int): Vector[String] = {
    // first matching separator; the tail list drives the recursion
    var separator = seps.last
    var newSeps: Seq[String] = Nil
    var k = 0
    var found = false
    while (k < seps.length && !found) {
      val s = seps(k)
      if (s.isEmpty || text.contains(s)) {
        separator = s
        if (s.nonEmpty) newSeps = seps.drop(k + 1)
        found = true
      }
      k += 1
    }
    val splits = splitKeepSep(text, separator)
    val out = Vector.newBuilder[String]
    var good = Vector.empty[String]
    for (s <- splits) {
      if (s.length < size) good :+= s
      else {
        if (good.nonEmpty) { out ++= mergeSplits(good, size, overlap); good = Vector.empty }
        if (newSeps.isEmpty) out += s
        else out ++= splitRec(s, newSeps, size, overlap)
      }
    }
    if (good.nonEmpty) out ++= mergeSplits(good, size, overlap)
    out.result()
  }

  /** Greedy merge with overlap carry-over. The join separator is ""
    * because keep_separator retains separators inside the fragments. */
  private def mergeSplits(splits: Seq[String], size: Int,
      overlap: Int): Vector[String] = {
    val docs = Vector.newBuilder[String]
    var current = Vector.empty[String]
    var total = 0
    def emit(): Unit = {
      val t = current.mkString.trim
      if (t.nonEmpty) docs += t
    }
    for (d <- splits) {
      val len = d.length
      if (total + len > size && current.nonEmpty) {
        emit()
        while (total > overlap || (total + len > size && total > 0)) {
          total -= current.head.length
          current = current.tail
        }
      }
      current :+= d
      total += len
    }
    emit()
    docs.result()
  }
}

/** Catalyst Generator over [[RecursiveChunker]]: one document row ->
  * (chunk_idx, chunk) per recursive chunk. Same Generate-node shape as
  * [[ChunkSpans]] — narrow, no shuffle, partition-parallel; the
  * recursion is per-row driver-free logic at the codec boundary, so
  * CodegenFallback is the honest tier (the surrounding projection stays
  * codegen'd).
  */
case class RecursiveChunks(child: Expression, size: Int, overlap: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(size > 0 && overlap >= 0 && overlap < size,
    "need 0 <= overlap < size")

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got " +
          child.dataType.catalogString)

  override def prettyName: String = "recursive_chunks"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input).asInstanceOf[UTF8String]
    if (t == null) Nil
    else RecursiveChunker.split(t.toString, size, overlap)
      .zipWithIndex.map { case (c, i) =>
        InternalRow(i.toLong, UTF8String.fromString(c))
      }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RecursiveChunks {
  /** Column wrapper; use in select() like explode. */
  def recursiveChunks(text: Column, size: Int, overlap: Int): Column =
    Bridge.column(RecursiveChunks(Bridge.expression(text), size, overlap))
}
