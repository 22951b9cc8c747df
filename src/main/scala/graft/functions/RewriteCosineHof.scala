package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Library-level optimizer rule: rewrite the declarative HOF cosine
  * formulation (VectorOps.cosineHof — `aggregate(zip_with(...))` dot and
  * norms combined into a divide) to the fused native
  * [[CosineSimilarity]] kernel.
  *
  * Users writing plain public-API higher-order functions get the
  * codegen'd single-loop kernel automatically — the substitution is
  * semantics-preserving bit-for-bit because the native kernel folds each
  * accumulator in the same sequential index order as the HOF aggregate
  * (CosineNativeSpec pins that parity; the NULL-on-length-mismatch
  * behavior also matches zip_with's null-padding, see CosineSimilarity).
  *
  * Registered through [[GraftExtensions]] (injectOptimizerRule), the
  * standard `spark.sql.extensions` deploy hook; the rule runs in the
  * user-provided batch after core optimization, so it sees the
  * post-CollapseProject tree and matches structurally.
  */
object RewriteCosineHof extends Rule[LogicalPlan] {

  /** transform(v, x -> cast(x as double)) over an array<float>. */
  private object DoubledArray {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayTransform(arr,
          LambdaFunction(Cast(_: NamedLambdaVariable, DoubleType, _, _), _, _)) =>
        Some(arr)
      case _ => None
    }
  }

  /** aggregate(zip_with(asDouble(a), asDouble(b), (x,y) -> x*y),
    *           0.0, (acc,x) -> acc+x)  — VectorOps.dot's exact shape. */
  private object HofDot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(DoubledArray(a), DoubledArray(b),
            LambdaFunction(
              Multiply(_: NamedLambdaVariable, _: NamedLambdaVariable, _),
              _, _)),
          Literal(0.0, DoubleType),
          LambdaFunction(
            Add(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _),
          LambdaFunction(_: NamedLambdaVariable, _, _)) =>
        Some((a, b))
      case _ => None
    }
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(
          HofDot(a, b),
          Multiply(Sqrt(HofDot(a2, a3)), Sqrt(HofDot(b2, b3)), _), _)
          if a.semanticEquals(a2) && a.semanticEquals(a3) &&
            b.semanticEquals(b2) && b.semanticEquals(b3) &&
            isFloatArray(a) && isFloatArray(b) =>
        CosineSimilarity(a, b)
    }
}
