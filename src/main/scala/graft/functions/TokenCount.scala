package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: whitespace token count of a string —
  * `size(split(text, ' '))` without materializing the array.
  *
  * `split` allocates one UTF8String per token plus the array shell just
  * so `size` can read its length; for a corpus-wide token-count pass
  * (the tokenizer-budget accounting the reference's fine-tune stage
  * needs, train_adapters/RAG-eval-create_model.py:152 max_seq_length)
  * that is pure garbage-collector pressure. This kernel counts
  * separator BYTES in one pass over the UTF-8 buffer (a 0x20 byte never
  * occurs inside a multi-byte UTF-8 sequence, so byte-counting is
  * codepoint-exact) and returns separators + 1 — bit-identical to
  * Spark's split-with-limit=-1 segment count, including empty-string
  * and trailing-separator semantics.
  *
  * [[RewriteTokenCount]] applies the substitution engine-wide.
  */
case class TokenCountWs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "token_count"

  override def nullSafeEval(input: Any): Any =
    TokenCountKernel.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenCountKernel.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCountKernel {
  /** separators + 1 over the raw UTF-8 bytes; matches
    * size(split(s, " ")) for every input including "" (-> 1). */
  def compute(s: UTF8String): Int = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var count = 1
    var i = 0L
    while (i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20)
        count += 1
      i += 1
    }
    count
  }

  /** Column wrapper. */
  def tokenCount(text: Column): Column =
    Bridge.column(TokenCountWs(Bridge.expression(text)))
}

/** Library-level optimizer rule: rewrite `size(split(text, ' '))` (the
  * single-space literal form — a regex with no metacharacters) to the
  * array-free [[TokenCountWs]] kernel. Conservative match: only the
  * exact one-space separator with default limit, where segment-count
  * semantics are provably identical; any other pattern is left alone.
  * Registered via [[GraftExtensions]]; TokenCountSpec pins parity and
  * the negative cases. */
object RewriteTokenCount extends Rule[LogicalPlan] {

  private val SpaceSep = UTF8String.fromString(" ")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      case Size(StringSplit(text, Literal(sep: UTF8String, StringType),
          Literal(-1, IntegerType)), _) if sep == SpaceSep =>
        TokenCountWs(text)
    }
}
