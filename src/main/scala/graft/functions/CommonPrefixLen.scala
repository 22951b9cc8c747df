package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: longest-common-prefix length (in
  * CHARACTERS) of two strings, with whole-stage codegen — the scalar
  * kernel behind the KV-cache prefix-sharing planner
  * (`prefix_cache_sharing`, queries/curation54.scala).
  *
  * Versus the HOF formulation (`size(filter(sequence(1, k), i ->
  * substring(a,1,i) = substring(b,1,i)))`): that evaluates k substring
  * pairs of growing length — O(k^2) copied bytes and bounded by a
  * literal cap — where this is one forward pass that stops at the
  * first divergence, O(LCP) bytes and uncapped.  Callers that want the
  * cap compose `least(common_prefix_len(a, b), k)`, which is exactly
  * the capped HOF count (prefix equality is monotone, so the count
  * equals min(LCP, k)).
  *
  * Character semantics match `substring`: the walk advances one UTF-8
  * code point at a time (UTF8String.numBytesForFirstByte), so a
  * multi-byte code point only counts when ALL its bytes agree —
  * byte-wise LCP would overcount a partially-matching code point.
  */
case class CommonPrefixLen(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "common_prefix_len"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String]
    val b = r.asInstanceOf[UTF8String]
    val la = a.numBytes(); val lb = b.numBytes()
    var i = 0; var cnt = 0L
    var diverged = false
    while (!diverged && i < la && i < lb) {
      val nb = UTF8String.numBytesForFirstByte(a.getByte(i))
      if (i + nb > la || i + nb > lb) diverged = true
      else {
        var k = 0
        while (k < nb && a.getByte(i + k) == b.getByte(i + k)) k += 1
        if (k < nb) diverged = true
        else { cnt += 1L; i += nb }
      }
    }
    cnt
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val la = ctx.freshName("la"); val lb = ctx.freshName("lb")
      val i = ctx.freshName("i"); val nb = ctx.freshName("nb")
      val k = ctx.freshName("k"); val cnt = ctx.freshName("cnt")
      val utf8 = classOf[UTF8String].getName
      s"""
         |int $la = $a.numBytes();
         |int $lb = $b.numBytes();
         |int $i = 0;
         |long $cnt = 0L;
         |while ($i < $la && $i < $lb) {
         |  int $nb = $utf8.numBytesForFirstByte($a.getByte($i));
         |  if ($i + $nb > $la || $i + $nb > $lb) break;
         |  int $k = 0;
         |  while ($k < $nb && $a.getByte($i + $k) == $b.getByte($i + $k)) $k++;
         |  if ($k < $nb) break;
         |  $cnt++; $i += $nb;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CommonPrefixLen {
  /** Column wrapper for the native kernel. */
  def commonPrefixLen(a: Column, b: Column): Column =
    Bridge.column(CommonPrefixLen(Bridge.expression(a), Bridge.expression(b)))
}
