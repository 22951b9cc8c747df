package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Smith-Waterman local-alignment score
  * over whitespace tokens (match +2, mismatch -1, gap -1) — the
  * local-similarity kernel of sequence bioinformatics (the reference's
  * domain: genome records, data_generation/generate_narratives_from_
  * data.py:79-85), here aligning token sequences the way an aligner
  * scores subsequence homology: the best-scoring LOCAL region, robust
  * to unrelated flanks, where LCS/ROUGE measure global overlap.
  *
  * Same two-row O(la*lb) DP shape as [[LcsTokens]], with the SW
  * zero-floor and a running maximum. Callers bound token counts
  * (quadratic row-local cost, no shuffle, no state).
  */
case class SmithWatermanTokens(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "smith_waterman"

  override def nullSafeEval(l: Any, r: Any): Any =
    SwKernel.compute(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SwKernel.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SwKernel {
  val Match = 2L
  val Mismatch = -1L
  val Gap = 1L // subtracted

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(l: UTF8String, r: UTF8String): Long = {
    val a = l.toString.split(" ", -1)
    val b = r.toString.split(" ", -1)
    val lb = b.length
    var prev = new Array[Long](lb + 1)
    var cur = new Array[Long](lb + 1)
    var best = 0L
    var i = 1
    while (i <= a.length) {
      var j = 1
      while (j <= lb) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) Match else Mismatch)
        var v = if (sub > 0) sub else 0L
        if (prev(j) - Gap > v) v = prev(j) - Gap
        if (cur(j - 1) - Gap > v) v = cur(j - 1) - Gap
        cur(j) = v
        if (v > best) best = v
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0L)
      i += 1
    }
    best
  }

  /** Column wrapper. */
  def smithWaterman(a: Column, b: Column): Column =
    Bridge.column(SmithWatermanTokens(
      Bridge.expression(a), Bridge.expression(b)))
}
