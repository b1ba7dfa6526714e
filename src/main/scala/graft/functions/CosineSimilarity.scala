package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused cosine similarity over two numeric arrays as a native codegen
  * expression. The composed form
  * (`aggregate(zip_with(a,b,*)) / (sqrt(..)·sqrt(..))`) materializes
  * THREE intermediate arrays per pair — on an O(n·k) similarity probe
  * that's the allocation hot path. This expression makes one pass, zero
  * allocations, three accumulators.
  *
  * Bit-compatibility: each accumulator is a sequential left fold from
  * 0.0 in element order — exactly the `aggregate(zip_with(...))` result
  * and exactly DuckDB's `list_cosine_similarity(CAST(x AS DOUBLE[]))`
  * (verified by the dd_cosine_neardup / sim_cosine_topk oracles).
  * Float elements widen to double per element, which equals
  * `transform(a, _.cast("double"))` exactly (float→double is lossless).
  *
  * Nulls: null array → null. Length mismatch or zero-norm input →
  * null (the composed form would return NaN on zero norms; callers
  * filter on a threshold, where null and NaN behave alike).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity needs two array<float|double> inputs, got " +
        s"(${left.dataType}, ${right.dataType})")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val n = xa.numElements()
    if (n != xb.numElements()) return null
    val fa = isFloat(left)
    val fb = isFloat(right)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val va = if (fa) xa.getFloat(i).toDouble else xa.getDouble(i)
      val vb = if (fb) xb.getFloat(i).toDouble else xb.getDouble(i)
      dot += va * vb
      na += va * va
      nb += vb * vb
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (isFloat(left)) "getFloat" else "getDouble"
    val getB = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $va = (double) $a.$getA($i);
         |    double $vb = (double) $b.$getB($i);
         |    $dot += $va * $vb;
         |    $na += $va * $va;
         |    $nb += $vb * $vb;
         |  }
         |  if ($na == 0.0 || $nb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** `cosine_similarity(a, b)` as a Column. */
  def cosine_similarity(a: Column, b: Column): Column =
    ColumnBridge.toColumn(CosineSimilarity(
      ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
}
