package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two `array<float>` columns — a custom
  * Catalyst `BinaryExpression` with whole-stage codegen.
  *
  * Why not `aggregate(zip_with(...))`: higher-order functions
  * evaluate their lambda through the interpreter once PER ELEMENT
  * (variable binding + boxing each step), and zip_with materializes
  * an intermediate array. For a 64-dim embedding scored against
  * millions of candidates that interpreter overhead IS the query.
  * This expression compiles to a tight primitive loop inside the
  * generated code (doGenCode), or a primitive while-loop under
  * interpreted eval — no intermediate array, no boxing.
  *
  * Accumulation order is the same left-to-right sequential sum as
  * the HOF formulation and DuckDB's list_sum, so results are
  * bit-identical to both (determinism contract of SURVEY §5).
  *
  * Null semantics: null if either array is null, null on MISMATCHED
  * lengths, and null when ANY element is null — exactly what the HOF
  * formulation produces (zip_with pads the shorter side with nulls,
  * and a null element makes a null product that poisons the sum), so
  * [[graft.plans.DotProductRewrite]] can swap the HOF pattern for
  * this expression without changing any result even on
  * containsNull=true element types (the default from from_json and
  * plain parquet reads), and a silently-truncated dot can never
  * masquerade as a score. The per-element null branch is emitted
  * only when the input type admits null elements, so
  * containsNull=false columns keep the branch-free loop.
  */
case class ArrayDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullable: Boolean = true

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def elemNullable(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull
  @transient private lazy val leftFloat = elemIsFloat(left)
  @transient private lazy val rightFloat = elemIsFloat(right)
  @transient private lazy val leftMayNull = elemNullable(left)
  @transient private lazy val rightMayNull = elemNullable(right)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null // zip_with null-pad parity
    var acc = 0.0
    var i = 0
    while (i < n) {
      // a null element poisons the HOF sum -> whole result null
      if ((leftMayNull && x.isNullAt(i)) || (rightMayNull && y.isNullAt(i)))
        return null
      val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def get(arr: String, isFloat: Boolean) =
        if (isFloat) s"((double) $arr.getFloat($i))" else s"$arr.getDouble($i)"
      val nullChecks =
        (if (leftMayNull) Seq(s"$x.isNullAt($i)") else Nil) ++
          (if (rightMayNull) Seq(s"$y.isNullAt($i)") else Nil)
      val elemGuard =
        if (nullChecks.isEmpty) ""
        else s"""if (${nullChecks.mkString(" || ")}) { ${ev.isNull} = true; break; }"""
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemGuard
         |    $acc += ${get(x, leftFloat)} * ${get(y, rightFloat)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "array_dot"
}

object ArrayDot {
  /** Column API entry: codegen'd float-array dot product. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(ArrayDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
