package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Horner-scheme polynomial evaluation — the K2 `np.poly1d` analog
  * (`calculations/polytrend.py:224-226`) as a native Catalyst expression
  * with codegen, so fit-overlay evaluation stays inside whole-stage
  * codegen instead of boxing through a UDF.
  *
  * coeffs(i) multiplies x^i; evaluation is
  * `((c_n·x + c_{n-1})·x + …)·x + c_0` — fixed operation order, so
  * results are bit-reproducible across engines implementing the same
  * scheme.
  */
case class PolyEval(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"poly_eval needs (array<double>, double), got ($l, $r)")
    }

  override protected def nullSafeEval(coeffs: Any, x: Any): Any = {
    val arr = coeffs.asInstanceOf[ArrayData]
    val xv = x.asInstanceOf[Double]
    var acc = 0.0
    var i = arr.numElements() - 1
    while (i >= 0) {
      acc = acc * xv + arr.getDouble(i)
      i -= 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, x) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |double $acc = 0.0;
         |for (int $i = $c.numElements() - 1; $i >= 0; $i--) {
         |  $acc = $acc * $x + $c.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PolyEval =
    copy(left = newLeft, right = newRight)
}

object PolyEval {
  /** `poly_eval(coeffs, x)` as a Column. */
  def poly_eval(coeffs: Column, x: Column): Column =
    ColumnBridge.toColumn(PolyEval(
      ColumnBridge.toExpression(coeffs), ColumnBridge.toExpression(x)))
}
