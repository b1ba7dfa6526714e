package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 moved these conversions behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so libraries
  * defining native expressions need this one-file shim inside the sql
  * package namespace — the only place we step outside our own packages.
  */
object ColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a custom Catalyst expression under a SQL function name for
    * the session (`SELECT name(...)` in `spark.sql`).
    */
  def registerExpression(spark: org.apache.spark.sql.SparkSession,
      name: String, builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
