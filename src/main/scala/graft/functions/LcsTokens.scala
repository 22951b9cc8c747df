package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: token-level longest-common-subsequence
  * length of two strings (whitespace tokens) — the core of ROUGE-L
  * (Lin 2004), the reference-vs-candidate overlap metric of LLM eval
  * harnesses (the reference's harness scores generated answers against
  * references, llm_harness_evaluation/testmodel_llm_harness_sophia
  * .sh:77-79; ROUGE-L is the standard sequence-overlap member of that
  * metric family).
  *
  * ROUGE-L F1 assembles from this in pure integer arithmetic:
  * f1_e6 = (2*lcs*1e6) div (la+lb) — see the rouge_l_pairs query.
  *
  * O(la*lb) two-row DP; token arrays split on a single space with
  * trailing empties preserved (String.split(" ", -1)), matching
  * DuckDB's string_split exactly. Quadratic cost means callers bound
  * token counts (FixtureBoundsSpec pins the fixture; at 100 TB the
  * metric runs on eval sets, not the corpus).
  */
case class LcsTokens(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "lcs_tokens"

  override def nullSafeEval(l: Any, r: Any): Any =
    LcsKernel.compute(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LcsKernel.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LcsKernel {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(l: UTF8String, r: UTF8String): Long = {
    val a = l.toString.split(" ", -1)
    val b = r.toString.split(" ", -1)
    val la = a.length
    val lb = b.length
    var prev = new Array[Long](lb + 1)
    var cur = new Array[Long](lb + 1)
    var i = 1
    while (i <= la) {
      var j = 1
      while (j <= lb) {
        cur(j) =
          if (a(i - 1) == b(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0L)
      i += 1
    }
    prev(lb)
  }

  /** Column wrapper. */
  def lcsTokens(a: Column, b: Column): Column =
    Bridge.column(LcsTokens(Bridge.expression(a), Bridge.expression(b)))
}
