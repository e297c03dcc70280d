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
  * sides accumulate each term sequentially in element order, and both
  * yield NULL on array-length mismatch (zip_with null-pads → null dot;
  * CosineSim returns null by definition).
  *
  * Every pattern binds the matched sub-expressions to the lambda's OWN
  * argument variables by exprId (ADVICE r1: a bare NamedLambdaVariable
  * check also matched e.g. zip_with(a, b, (x,y) -> x*x) or
  * aggregate(arr, 0.0, (acc,v) -> acc+acc), silently rewriting a
  * user's non-cosine expression of similar shape — this rule is
  * injected session-wide, so a false match is a wrong-results bug).
  */
object CosineFusionRule extends Rule[LogicalPlan] {

  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, DoubleType, _, _) => stripCast(c)
    case other => other
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    stripCast(e) match {
      case n: NamedLambdaVariable => n.exprId == v.exprId
      case _ => false
    }

  /** matches aggregate(<arr>, 0.0, (acc, v) -> acc + v) — with acc and
    * v being exactly the lambda's two arguments AND an identity finish
    * lambda (a non-identity finish, e.g. acc -> -acc, transforms the
    * sum and must block the rewrite) — and returns arr. */
  private object SeqSum {
    private def isIdentity(finish: Expression): Boolean = finish match {
      case LambdaFunction(body, Seq(a: NamedLambdaVariable), _) => isVar(body, a)
      case _ => false
    }
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayAggregate(arr, Literal(0.0, DoubleType),
          LambdaFunction(Add(l, r, _),
            Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _), finish)
          if isVar(l, acc) && isVar(r, v) && isIdentity(finish) =>
        Some(arr)
      case _ => None
    }
  }

  /** matches zip_with(a, b, (x, y) -> cast(x)*cast(y)) (either cast
    * placement; x must be the first lambda arg, y the second) and
    * returns (a, b). */
  private object DotArray {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ZipWith(a, b, LambdaFunction(m: Multiply,
          Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _))
          if isVar(m.left, x) && isVar(m.right, y) =>
        Some((a, b))
      case _ => None
    }
  }

  /** matches transform(a, x -> cast(x)*cast(x)) with both operands the
    * single lambda argument, and returns a. */
  private object NormSqArray {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayTransform(a, LambdaFunction(m: Multiply,
          Seq(x: NamedLambdaVariable), _))
          if isVar(m.left, x) && isVar(m.right, x) =>
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
