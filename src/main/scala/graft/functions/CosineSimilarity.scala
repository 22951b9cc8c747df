package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two array<float>
  * embedding columns, fused into one loop with whole-stage codegen
  * (doGenCode) — the hot inner kernel of every similarity join in the
  * engine.
  *
  * Versus the HOF formulation (zip_with + aggregate, VectorOps.cosine):
  * no intermediate array allocation, one pass over both vectors, plain
  * JIT-friendly primitive loop.  Accumulation order per accumulator is
  * identical to the HOF fold (sequential over index), so results are
  * bit-identical — the DuckDB oracle parity argument (see VectorOps)
  * carries over unchanged.
  *
  * Reference semantics: the full-corpus cosine ranking of
  * rag_evaluation/RAG-eval-test_model.py:130,242-248.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  /** NULL on null input and on length-mismatched arrays (matching the
    * HOF formulation: zip_with null-pads the shorter side and the
    * product lambda propagates the null through the fold). */
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_similarity"

  /** Zero-norm vectors yield NULL (cosine is undefined): matches the
    * HOF formulation's x/0 -> NULL division semantics, so the
    * RewriteCosineHof bit-parity claim holds on the full input domain —
    * degenerate vectors included — not just well-formed embeddings. */
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    if (aa == 0.0 || bb == 0.0) null
    else ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $ab = 0.0, $aa = 0.0, $bb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = (double) $a.getFloat($i);
         |    double $y = (double) $b.getFloat($i);
         |    $ab += $x * $y; $aa += $x * $x; $bb += $y * $y;
         |  }
         |  if ($aa == 0.0 || $bb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $ab / (Math.sqrt($aa) * Math.sqrt($bb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column wrapper for the native kernel. */
  def cosineNative(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
}
