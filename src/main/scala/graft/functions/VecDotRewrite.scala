package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the canonical higher-order-function dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * into the codegen'd `vec_dot(a, b)` kernel. HOF lambdas evaluate
  * interpreted (measured ~9× slower on this shape); the rewrite is exact —
  * same sequential left-to-right summation — so user-written SQL/DataFrame
  * code gets the fast path without knowing the custom expression exists.
  * Installed by GraftExtensions (injectOptimizerRule).
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  /** (x, y) -> x * y over the two lambda args, either order. */
  private def isPairwiseMult(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(l, r, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (isVar(l, x) && isVar(r, y)) || (isVar(l, y) && isVar(r, x))
    case _ => false
  }

  private def isPairwiseAdd(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l, r, _), Seq(a: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      (isVar(l, a) && isVar(r, v)) || (isVar(l, v) && isVar(r, a))
    case _ => false
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(a: NamedLambdaVariable), _) => isVar(body, a)
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(zw: ZipWith, Literal(0.0, DoubleType), merge, finish)
        if isPairwiseMult(zw.function) && isPairwiseAdd(merge) && isIdentity(finish) &&
          isDoubleArray(zw.left) && isDoubleArray(zw.right) =>
      VecDot(zw.left, zw.right)
  }
}
