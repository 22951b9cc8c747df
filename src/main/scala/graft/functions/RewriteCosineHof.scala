package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
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
  * (CosineNativeSpec pins that parity; the NULL-on-length-mismatch and
  * NULL-on-zero-norm behaviors also match, see CosineSimilarity).
  *
  * Two denominator shapes are recognized:
  *  - the bare norms product `sqrt(norm2(a)) * sqrt(norm2(b))`;
  *  - the zero-norm-guarded form `nullif(norms, 0.0)`, which the
  *    analyzer replaces with `If(norms = 0.0, null, norms)` and the
  *    optimizer's with-expression rewrite may extract into a child
  *    Project as a common-expression attribute — so the guarded match
  *    resolves attributes through the child Project's aliases.
  *
  * Registered through [[GraftExtensions]] (injectOptimizerRule), the
  * standard `spark.sql.extensions` deploy hook; the rule runs inside the
  * fixed-point operator-optimization batch, so the orphaned
  * common-expression alias left behind by a guarded-form rewrite is
  * column-pruned in the same loop.
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

  /** sqrt(norm2(x)) * sqrt(norm2(y)) — VectorOps.cosineHof's divisor. */
  private object NormsProduct {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Multiply(Sqrt(HofDot(a2, a3)), Sqrt(HofDot(b2, b3)), _)
          if a2.semanticEquals(a3) && b2.semanticEquals(b3) =>
        Some((a2, b2))
      case _ => None
    }
  }

  /** If(x = 0.0, null, x) — what nullif(x, 0.0) analyzes to. Yields the
    * compared/returned expression when both sides are the same. */
  private object ZeroGuard {
    def unapply(e: Expression): Option[Expression] = e match {
      case If(EqualTo(x, Literal(0.0, DoubleType)), Literal(null, _), x2)
          if x.semanticEquals(x2) => Some(x)
      case If(EqualTo(Literal(0.0, DoubleType), x), Literal(null, _), x2)
          if x.semanticEquals(x2) => Some(x)
      case _ => None
    }
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Divisor -> (a, b) of its norms product, resolving extracted
    * common-expression attributes through `resolve`. */
  private def divisorNorms(denom: Expression,
      resolve: Attribute => Option[Expression]): Option[(Expression, Expression)] =
    denom match {
      case NormsProduct(x, y) => Some((x, y))
      case ZeroGuard(inner) => inner match {
        case NormsProduct(x, y) => Some((x, y))
        case attr: Attribute => resolve(attr).collect {
          case NormsProduct(x, y) => (x, y)
        }
        case _ => None
      }
      case _ => None
    }

  private def rewrite(e: Expression,
      resolve: Attribute => Option[Expression]): Expression =
    e.transformUp {
      case d @ Divide(HofDot(a, b), denom, _)
          if isFloatArray(a) && isFloatArray(b) =>
        divisorNorms(denom, resolve) match {
          case Some((x, y))
              if a.semanticEquals(x) && b.semanticEquals(y) =>
            CosineSimilarity(a, b)
          case _ => d
        }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case proj: Project =>
      // resolve common-expression attributes one Project down — the
      // shape RewriteWithExpression leaves for the nullif guard
      val resolve: Attribute => Option[Expression] = proj.child match {
        case pc: Project =>
          val m = pc.projectList.collect {
            case al: Alias => al.exprId -> al.child
          }.toMap
          a => m.get(a.exprId)
        case _ => _ => None
      }
      val newList = proj.projectList
        .map(ne => rewrite(ne, resolve).asInstanceOf[NamedExpression])
      if (newList.zip(proj.projectList).forall { case (n, o) => n.eq(o) }) proj
      else proj.copy(projectList = newList)
    case other if other.expressions.exists(_.exists {
        case Divide(HofDot(_, _), _, _) => true; case _ => false
      }) =>
      // non-Project operators (filters, aggregates): inline forms only
      other.mapExpressions(e => rewrite(e, _ => None))
  }
}
