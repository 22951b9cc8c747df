package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst Generator (UDTF): one input document -> a row per
  * overlapping chunk span — the engine's demonstration of the
  * whole-operator extension surface below `explode` (SURVEY.md §2.10,
  * §4.3).  Semantics are IDENTICAL to the declarative chunker
  * (VectorQueries.chunks: explode(sequence) + substring, stride windows
  * of `size` chars): chunk i covers characters [1 + i*stride,
  * 1 + i*stride + size), 1 + max(0, ceil((len-size)/stride)) chunks per
  * document.  Character arithmetic uses UTF8String.substringSQL /
  * numChars so it matches Spark's substring() codepoint semantics, not
  * Java UTF-16 units.
  *
  * The declarative formulation stays the production path (it is
  * codegen'd end to end); this Generator exists so a chunker variant
  * with non-expressible logic (sentence-boundary snapping, tokenizer
  * alignment) has a ready slot that still plans as a Generate node —
  * narrow, no shuffle, partition-parallel.
  *
  * Reference: RecursiveCharacterTextSplitter(chunk_size=256,
  * chunk_overlap=100), rag_evaluation/RAG-eval-test_model.py:239-240.
  */
case class ChunkSpans(child: Expression, size: Int, stride: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(size > 0 && stride > 0, "size and stride must be positive")

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

  override def prettyName: String = "chunk_spans"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input).asInstanceOf[UTF8String]
    if (t == null) Nil
    else {
      val len = t.numChars()
      val nChunks =
        1 + math.max(0, math.ceil((len - size).toDouble / stride).toInt)
      (0 until nChunks).map { i =>
        InternalRow(i.toLong, t.substringSQL(1 + i * stride, size))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ChunkSpans {
  /** Column wrapper; use in select() like explode —
    * `df.select(col("doc_id"), chunkSpans(col("text"), 256, 156))`. */
  def chunkSpans(text: Column, size: Int, stride: Int): Column =
    Bridge.column(ChunkSpans(Bridge.expression(text), size, stride))
}
