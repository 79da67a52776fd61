package graft.plans

import graft.expressions.ArrayDot
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Optimizer rule: rewrite the higher-order-function dot-product
  * pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (s, v) -> s + v)
  *
  * into the codegen'd [[ArrayDot]] expression. Higher-order
  * functions interpret their lambda once per ELEMENT (variable
  * binding + boxing each step) and zip_with materializes an
  * intermediate array — on an embedding column scored against
  * millions of candidates that interpreter overhead is the query.
  * The rewrite is a pure win because the semantics are pinned equal:
  * ArrayDot accumulates left-to-right in doubles (bit-identical sum)
  * and returns null on null input, length-mismatched input, AND any
  * null element — exactly the zip_with null-pad + poisoned-sum
  * behavior — so it is safe on containsNull=true element types (the
  * default schema from from_json and plain parquet reads), not just
  * the containsNull=false case.
  *
  * Fires only when every piece matches: float/double array inputs,
  * multiply of exactly the two zip_with lambda variables (either
  * order — IEEE multiply commutes bitwise; casts to double are
  * allowed since that is ArrayDot's own widening), literal 0.0 zero,
  * merge = Add of the two merge variables, identity finish. Anything
  * else is left alone.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isFloatingArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** The lambda-variable reference under optional double-widening. */
  private def stripCast(e: Expression): Expression = e match {
    case Cast(child, DoubleType, _, _) => stripCast(child)
    case other => other
  }

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean =
    stripCast(e) match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

  private def isZeroD(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(mult: Multiply, Seq(
            x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          zero,
          LambdaFunction(add: Add, Seq(
            s: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(f: NamedLambdaVariable), _))
        if isFloatingArray(a.dataType) && isFloatingArray(b.dataType) &&
          isZeroD(zero) &&
          // the multiply must run in DOUBLE: a float*float lambda
          // rounds each product to float first, which ArrayDot's
          // widened-double multiply would not reproduce bit-exactly
          mult.dataType == DoubleType &&
          ((sameVar(mult.left, x) && sameVar(mult.right, y)) ||
            (sameVar(mult.left, y) && sameVar(mult.right, x))) &&
          ((sameVar(add.left, s) && sameVar(add.right, v)) ||
            (sameVar(add.left, v) && sameVar(add.right, s))) &&
          sameVar(fin, f) =>
        ArrayDot(a, b)
    }
}
