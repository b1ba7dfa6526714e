package graft.rel

import graft.plans.{AsOfFilterPushdown, AsOfJoinPlan, AsOfJoinStrategy}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graftbridge.PlanBridge

/** As-of (point-in-time) join: each left row picks the latest right row
  * with the same key and right time ≤ left time — the standard
  * event-to-state join in log analytics.
  *
  * Composed from built-ins per the extension preference order
  * (SURVEY §7.3 / build prompt (a)): tag → union → per-key time-ordered
  * window → last non-null state → keep left rows. One shuffle on the
  * key, window fill is partition-local, no custom physical operator
  * needed — Catalyst can plan and AQE can re-plan it like any other
  * exchange.
  *
  * Cross-checked against DuckDB's native `ASOF JOIN` in the oracle
  * harness (`asof_join` query).
  */
object AsOf {

  /** @param left      probe side
    * @param right     state side (its non-key columns are filled as-of)
    * @param keys      equi-join keys present on both sides
    * @param leftTime  ordering column on `left` (numeric or timestamp)
    * @param rightTime ordering column on `right` (same type)
    * @param stateCols columns of `right` to carry (renamed as given)
    */
  /** Both entry points require state-column names disjoint from the
    * left schema: the output is `left.* ++ stateCols`, and a collision
    * would produce duplicate column names that break select-by-name
    * downstream. Rename on the right (`withColumnRenamed`) before
    * joining instead.
    */
  private def requireDisjointState(
      left: DataFrame, stateCols: Seq[String]): Unit = {
    val clash = stateCols.filter(left.columns.contains)
    require(clash.isEmpty,
      s"state columns ${clash.mkString(", ")} collide with left columns; " +
        "rename them on the right side first")
  }

  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      stateCols: Seq[String]): DataFrame = {
    requireDisjointState(left, stateCols)
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
    val lAligned = stateCols.foldLeft(l)((df, c) =>
      df.withColumn(s"__state_$c", lit(null).cast(
        right.schema(c).dataType)))
    // capture state columns BEFORE null-padding left-named columns: a
    // stateCol sharing a name with a left non-key column must not be
    // overwritten with nulls before capture
    val r0 = stateCols.foldLeft(
        right
          .withColumn("__t", col(rightTime))
          .withColumn("__is_left", lit(0)))((df, c) =>
        df.withColumn(s"__state_$c", col(c)))
    val rFinal = leftCols.filterNot(keys.contains)
      .foldLeft(r0)((df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select((keys ++ leftCols.filterNot(keys.contains) ++
        Seq("__t", "__is_left") ++ stateCols.map(c => s"__state_$c"))
        .map(col): _*)
    val lFinal = lAligned.select((keys ++ leftCols.filterNot(keys.contains) ++
      Seq("__t", "__is_left") ++ stateCols.map(c => s"__state_$c"))
      .map(col): _*)

    // right rows sort before left rows at equal time → `right.t <= left.t`
    // inclusive semantics, matching DuckDB ASOF
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = stateCols.foldLeft(lFinal.unionByName(rFinal))((df, c) =>
      df.withColumn(s"__filled_$c",
        last(col(s"__state_$c"), ignoreNulls = true).over(w)))
    filled.filter(col("__is_left") === 1)
      .select((leftCols.map(col) ++
        stateCols.map(c => col(s"__filled_$c").as(c))): _*)
  }

  /** Native as-of join via the custom operator
    * ([[graft.plans.AsOfJoinPlan]] / [[graft.plans.AsOfJoinExec]]) —
    * same semantics as [[join]], but executed as a single-pass
    * sort-merge: one shuffle per side (vs the composed variant's
    * union-then-window, which shuffles the union of both tables), O(1)
    * held state per partition, no window buffer.
    *
    * The strategy is injected into the session's experimental
    * strategies on first use (idempotent); deployment-grade wiring goes
    * through `spark.sql.extensions=graft.api.GraftExtensions`.
    */
  def joinNative(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      stateCols: Seq[String]): DataFrame = {
    requireDisjointState(left, stateCols)
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(AsOfFilterPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsOfFilterPushdown

    // manual pruning + re-aliasing: generic optimizer rules don't prune
    // through an unknown node, and fresh exprIds on the right make the
    // operator safe under self-joins (shared lineage)
    val rightCols = (keys ++ Seq(rightTime) ++ stateCols).distinct
    val rightPruned = right.select(rightCols.map(c => col(c).as(c)): _*)

    val lPlan = PlanBridge.logicalPlan(left)
    val rPlan = PlanBridge.logicalPlan(rightPruned)
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(throw
        new IllegalArgumentException(s"$side side has no column '$name'"))
    PlanBridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(attr(lPlan, _, "left")), keys.map(attr(rPlan, _, "right")),
      attr(lPlan, leftTime, "left"), attr(rPlan, rightTime, "right"),
      stateCols.map(attr(rPlan, _, "right"))))
  }
}
