package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Library-level optimizer rule #2: rewrite the declarative grouped
  * top-k idiom
  *
  *   slice(sort_array(collect_list(x), asc), 1, k)
  *
  * into the bounded native aggregate [[TopKLongsAgg]] (largest = !asc).
  * The declarative form buffers EVERY group member in the collect_list
  * before sorting and slicing — per-group state proportional to group
  * size, the thing that OOMs on a 100 TB skewed key.  The native
  * aggregate keeps exactly k values per group from the first partial
  * on, so the rewrite changes memory complexity, not just constant
  * factors — while producing value-identical output (sorted head of k,
  * same direction; duplicates interchangeable).
  *
  * Conservative match: bigint element type, literal ascending flag,
  * literal slice start == 1, literal k in [1, 1024], plain collect_list
  * (no DISTINCT, no FILTER).  Anything else is left untouched.
  * Registered through [[GraftExtensions]] alongside [[RewriteCosineHof]].
  */
object RewriteBoundedTopK extends Rule[LogicalPlan] {

  private object BoundedTopK {
    def unapply(e: Expression): Option[(Expression, Boolean, Int)] = e match {
      case Slice(
          SortArray(
            ae @ AggregateExpression(CollectList(child, _, _), _, false, None, _),
            Literal(asc: Boolean, _)),
          Literal(1, IntegerType),
          Literal(k: Int, IntegerType))
          if child.dataType == LongType && k >= 1 && k <= 1024 =>
        Some((child, asc, k))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      agg.transformExpressions {
        case BoundedTopK(child, asc, k) =>
          TopKLongsAgg(child, k, largest = !asc).toAggregateExpression()
      }
  }
}
