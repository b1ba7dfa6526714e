package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      stateCols: Seq[String]): DataFrame = {
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
}
