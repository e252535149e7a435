/** Optimizer rule that fuses the composable cosine-similarity pattern
  * (`when(sqrt(dot(a,a)) * sqrt(dot(b,b)) > 0, dot(a,b) / ...)`, with
  * `dot` = `aggregate(zip_with(_ * _), 0.0, _ + _)`) into the native
  * [[CosineSimilarity]] expression — one codegen'd loop instead of three
  * array materializations and six higher-order-function evaluations per
  * row.
  *
  * Registered through [[GraftExtensions]] (`injectOptimizerRule`) or at
  * runtime via [[CosineFusionRule.register]]. Semantics are unchanged in
  * every branch: null arrays, length mismatch and zero norms all yield
  * null in both forms (SimilaritySpec asserts bit-equality).
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, CaseWhen, Divide, Expression, GreaterThan, LambdaFunction, Literal, Multiply, NamedLambdaVariable, Sqrt, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

object CosineFusionRule extends Rule[LogicalPlan] {

  /** `e` IS the specific bound variable `v` (possibly double-widened) — not
    * merely "some lambda variable": shape-only matching would fuse
    * `(x, y) -> x * x` (a squared-norm, not a dot) or a captured OUTER
    * lambda's variable into a cosine and silently change results. */
  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case Cast(nv: NamedLambdaVariable, DoubleType, _, _) => nv.exprId == v.exprId
    case _ => false
  }

  /** Matches `aggregate(zip_with(x, y, (p, q) => p * q), 0.0,
    * (acc, el) -> acc + el)` with an identity finish — the composed dot
    * product — yielding (x, y). Each lambda body must use exactly ITS OWN
    * two bound variables (in either order; * and + commute). */
  private object DotProduct {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(x, y, LambdaFunction(Multiply(mx, my, _),
            Seq(p: NamedLambdaVariable, q: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(ax, ay, _),
            Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(finArg: NamedLambdaVariable), _))
        if ((isVar(mx, p) && isVar(my, q)) || (isVar(mx, q) && isVar(my, p))) &&
          ((isVar(ax, acc) && isVar(ay, el)) || (isVar(ax, el) && isVar(ay, acc))) &&
          fin.exprId == finArg.exprId =>
        Some((x, y))
      case _ => None
    }
  }

  private def zeroLit(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case Cast(Literal(v, _), DoubleType, _, _) => v == 0
    case _ => false
  }

  private def supported(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CaseWhen(Seq((
            GreaterThan(Multiply(Sqrt(DotProduct(ga1, ga2)), Sqrt(DotProduct(gb1, gb2)), _), z),
            Divide(DotProduct(da, db), Multiply(Sqrt(DotProduct(na1, na2)), Sqrt(DotProduct(nb1, nb2)), _), _))),
          None)
        if zeroLit(z) &&
          // guard norms, body norms and the dot all reference the same
          // two arrays: ||a||·||b|| > 0 gating a·b / (||a||·||b||)
          ga1.semanticEquals(ga2) && gb1.semanticEquals(gb2) &&
          na1.semanticEquals(na2) && nb1.semanticEquals(nb2) &&
          ga1.semanticEquals(na1) && gb1.semanticEquals(nb1) &&
          da.semanticEquals(ga1) && db.semanticEquals(gb1) &&
          supported(da) && supported(db) =>
        CosineSimilarity(da, db)
    }

  /** Idempotent runtime registration on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val exp = spark.asInstanceOf[ClassicSession].experimental
    if (!exp.extraOptimizations.contains(CosineFusionRule))
      exp.extraOptimizations = exp.extraOptimizations :+ CosineFusionRule
  }
}
