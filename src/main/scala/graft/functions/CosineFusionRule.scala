package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, FloatType, ArrayType}

/** Optimizer rule: recognizes the canonical higher-order-function
  * cosine-similarity shape
  *
  *   aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, +)
  *     / sqrt(aggregate(transform(a, x -> x*x), 0.0, +)
  *            * aggregate(transform(b, x -> x*x), 0.0, +))
  *
  * and fuses it into the codegen'd CosineSim expression. Users writing
  * the declarative HOF form (graft.functions.VectorOps.cosine) get the
  * fused loop automatically; results are bit-identical because both
  * sides accumulate each term sequentially in element order.
  * Injected by GraftExtensions as an operator-optimization rule.
  */
object CosineFusionRule extends Rule[LogicalPlan] {

  /** matches aggregate(<arr>, 0.0, (acc, v) -> acc + v) and returns arr. */
  private object SeqSum {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayAggregate(arr, Literal(0.0, DoubleType),
          LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _), _, _), _) =>
        Some(arr)
      case _ => None
    }
  }

  /** matches zip_with(a, b, (x, y) -> cast(x)*cast(y)) (either cast
    * placement) and returns (a, b). */
  private object DotArray {
    private def stripCast(e: Expression): Expression = e match {
      case Cast(c, DoubleType, _, _) => stripCast(c)
      case other => other
    }
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ZipWith(a, b, LambdaFunction(m: Multiply, _, _))
          if stripCast(m.left).isInstanceOf[NamedLambdaVariable] &&
             stripCast(m.right).isInstanceOf[NamedLambdaVariable] =>
        Some((a, b))
      case _ => None
    }
  }

  /** matches transform(a, x -> cast(x)*cast(x)) and returns a. */
  private object NormSqArray {
    private def stripCast(e: Expression): Expression = e match {
      case Cast(c, DoubleType, _, _) => stripCast(c)
      case other => other
    }
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayTransform(a, LambdaFunction(m: Multiply, _, _))
          if stripCast(m.left).isInstanceOf[NamedLambdaVariable] &&
             stripCast(m.right).isInstanceOf[NamedLambdaVariable] &&
             stripCast(m.left).semanticEquals(stripCast(m.right)) =>
        Some(a)
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
            SeqSum(DotArray(a, b)),
            Sqrt(Multiply(SeqSum(NormSqArray(a2)), SeqSum(NormSqArray(b2)), _)), _)
          if isFloatArray(a) && isFloatArray(b) &&
             a.semanticEquals(a2) && b.semanticEquals(b2) =>
        CosineSim(a, b)
    }
}
