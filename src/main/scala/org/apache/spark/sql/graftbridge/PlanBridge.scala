package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** DataFrame ⇄ LogicalPlan bridge for custom logical operators.
  *
  * Spark 4 keeps `Dataset.ofRows` and the analyzed-plan accessor behind
  * `private[sql]` (`org.apache.spark.sql.classic.Dataset`), so a library
  * that introduces its own `LogicalPlan` nodes (planned via an injected
  * `SparkStrategy`) needs this one-file shim inside the sql package
  * namespace — same rationale as [[ColumnBridge]].
  */
object PlanBridge {

  /** The analyzed logical plan backing a DataFrame. */
  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Wrap a logical plan back into a DataFrame on the given session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
