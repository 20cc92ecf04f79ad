package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the idiomatic higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v) }}}
  *
  * into the codegen'd [[DotProduct]] (`graft_dot`). The HOF form is the
  * natural way to write a dot product in Spark SQL (SURVEY.md §2.8 F7
  * maps the reference's cosine exactly this way), but `ArrayAggregate`/
  * `ZipWith` are CodegenFallback: every row allocates the zipped array
  * and interprets two lambdas. On an ANN scoring pass over 10^8 pairs
  * that interpretation overhead dominates; the fused loop is ~10×
  * faster and keeps the enclosing operator inside whole-stage codegen.
  *
  * The rewrite is exactly value-preserving, including edge cases,
  * because [[DotProduct]] is deliberately strict the way the HOF chain
  * is: `zip_with` pads the shorter array with nulls, `null * y = null`,
  * `acc + null = null` — so unequal lengths or a null element give a
  * null result in both forms; summation order (left-to-right IEEE) and
  * the +0.0 seed are identical. The zero-literal guard matches raw bits
  * so a `-0.0` seed (different bit pattern under parquet hashing) is
  * left alone. Conservative by construction: any shape that is not
  * bit-for-bit the dot-product fold passes through untouched.
  *
  * Injected by [[graft.GraftExtensions]]; user-provided rules run after
  * the main optimizer batches, so constant folding has already
  * normalized `CAST(0 AS DOUBLE)` seeds to `Literal(0.0)` by the time
  * this matches.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  /** `f(l, r)` uses exactly the two lambda variables, in either order
    * (both + and * are IEEE-commutative). */
  private def usesBoth(l: Expression, r: Expression,
                       a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
    (isVar(l, a) && isVar(r, b)) || (isVar(l, b) && isVar(r, a))

  private def doubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(mx, my, _),
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(zero: Double, DoubleType),
          LambdaFunction(Add(al, ar, _),
            Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
        if java.lang.Double.doubleToRawLongBits(zero) == 0L &&
           usesBoth(mx, my, x, y) && usesBoth(al, ar, acc, el) &&
           isVar(fin, fv) && doubleArray(a) && doubleArray(b) =>
      DotProduct(a, b)
  }
}
