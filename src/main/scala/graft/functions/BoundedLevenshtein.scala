package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Banded (threshold-bounded) Levenshtein distance as a native codegen
  * expression: returns the exact edit distance when it is ≤ `bound`,
  * and `bound + 1` otherwise. The DP evaluates only the 2·bound+1
  * diagonal band — O(bound·min(n,m)) instead of the full O(n·m)
  * table — and exits as soon as a whole row's minimum exceeds the
  * bound, which is the common case in blocked fuzzy joins where most
  * candidate pairs miss. Equal to Spark's `levenshtein(a, b)` whenever
  * that distance is ≤ bound, so a `bounded_levenshtein(a,b,k) <= k`
  * filter selects exactly the `levenshtein(a,b) <= k` rows.
  */
case class BoundedLevenshtein(left: Expression, right: Expression,
    bound: Int) extends BinaryExpression {

  require(bound >= 0 && bound <= 1000, s"bound out of range: $bound")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bounded_levenshtein needs (string, string), got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BoundedLevenshtein.banded(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], bound)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BoundedLevenshtein.banded(" +
        s"$a, $b, $bound);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedLevenshtein =
    copy(left = newLeft, right = newRight)
}

object BoundedLevenshtein {

  /** Banded DP over UTF-16 chars; static so generated code can call it
    * directly (no boxing, no UDF serialization).
    */
  def banded(ua: UTF8String, ub: UTF8String, k: Int): Int = {
    val a = ua.toString
    val b = ub.toString
    val n = a.length
    val m = b.length
    if (math.abs(n - m) > k) return k + 1
    if (n == 0) return m // <= k by the length check
    if (m == 0) return n
    val big = k + 1
    // prev(j)/cur(j) hold D(i, j); only |i - j| <= k is reachable
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    java.util.Arrays.fill(prev, big)
    var j = 0
    while (j <= math.min(m, k)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, big)
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      if (i - k <= 0) cur(0) = i
      var rowMin = cur(0)
      j = lo
      while (j <= hi) {
        val sub = prev(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0
                                 else 1)
        val del = if (prev(j) < big) prev(j) + 1 else big
        val ins = if (cur(j - 1) < big) cur(j - 1) + 1 else big
        val d = math.min(sub, math.min(del, ins))
        cur(j) = if (d > big) big else d
        if (cur(j) < rowMin) rowMin = cur(j)
        j += 1
      }
      if (rowMin > k) return k + 1 // the whole band overflowed: done
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    math.min(prev(m), big)
  }

  /** `bounded_levenshtein(a, b, k)` as a Column. */
  def bounded_levenshtein(a: Column, b: Column, k: Int): Column =
    ColumnBridge.toColumn(BoundedLevenshtein(
      ColumnBridge.toExpression(a), ColumnBridge.toExpression(b), k))
}
