package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Native as-of (point-in-time) join — whole-operator extension per the
  * preference order (c): a custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan` registered via `SparkSessionExtensions`
  * ([[graft.api.GraftExtensions]]) or `spark.experimental.extraStrategies`.
  *
  * Semantics (matches DuckDB `ASOF JOIN ... ON l.k = r.k AND r.t <= l.t`,
  * left-outer flavor): each left row is paired with the LATEST right row
  * of the same key whose time is ≤ the left time; null keys/times never
  * match.
  *
  * Physical execution is a single-pass sort-merge: both sides are
  * hash-clustered on the full key (one shuffle each, AQE-replannable)
  * and sorted by (key, time); the merge walks the left partition while
  * holding the most recent eligible right row — O(|L|+|R|) per
  * partition, no window buffering, no union-and-fill double scan like
  * the composed variant in [[graft.rel.AsOf]]. At 100 TB that removes
  * the unioned-shuffle of both tables that the window formulation pays
  * and keeps peak memory at one row per side.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    stateCols: Seq[Attribute])
  extends BinaryNode {

  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs at least one equi-key on both sides")

  override def output: Seq[Attribute] =
    left.output ++ stateCols.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, sc) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, sc) :: Nil
    case _ => Nil
  }
}

/** Optimizer extension for the custom node: Catalyst's generic
  * PushDownPredicates cannot see through an unknown LogicalPlan, so
  * without this rule every `filter` written above an as-of join runs
  * AFTER the join — scanning and shuffling rows the predicate would
  * have discarded at the source. Each output row derives from exactly
  * one left row (the join only APPENDS right-side state), so any
  * predicate that references only left-side columns commutes with the
  * join and is pushed into the left child, where the normal rules
  * continue down to the parquet scan (`PushedFilters`).
  *
  * Predicates touching the appended state columns (or mixing sides)
  * stay above — a null-producing outer-style join does not admit
  * right-side pushdown without changing semantics.
  */
object AsOfFilterPushdown
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{And, Expression}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val leftOut = j.left.outputSet
      val (pushable, kept) = splitConjuncts(cond).partition(c =>
        c.deterministic && c.references.subsetOf(leftOut))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left =
          Filter(pushable.reduce(And), j.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    stateCols: Seq[Attribute])
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ stateCols.map(_.withNullability(true))

  // full-key clustering on both sides: requireAllClusterKeys guarantees
  // the two shuffles use identical key positions, so equal keys land in
  // the same zipped partition
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(leftKeys, requireAllClusterKeys = true),
    ClusteredDistribution(rightKeys, requireAllClusterKeys = true))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // left rows pass through in their (key, time) order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "matched rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    // widen nullability to match `output`: a non-nullable state column
    // bound without the null check would read 0/false (or NPE for
    // strings) off the all-null row on unmatched left keys. The widening
    // must be on the BINDING schema (rightOut) — BindReferences takes
    // nullability from the input attribute, not the projected expression.
    val outExprs: Seq[Expression] =
      leftOut ++ stateCols.map(_.withNullability(true))
    val bindSchema: Seq[Attribute] =
      leftOut ++ rightOut.map(_.withNullability(true))
    val stateArity = rightOut.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
      val heldKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val outProj = UnsafeProjection.create(outExprs, bindSchema)
      val nullRight = new GenericInternalRow(stateArity)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rNext: InternalRow = _
        private var rNextKey: UnsafeRow = _          // valid until advance
        private var rHeld: InternalRow = _           // owned copy
        private var rHeldKey: UnsafeRow = _          // valid until next hold
        advanceRight()

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rNext = rIter.next()
            rNextKey = rKeyProj(rNext)
          } else rNext = null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          var matched = false
          if (!lKey.anyNull) {
            // discard right rows strictly before this key (or unmatchable)
            while (rNext != null &&
                (rNextKey.anyNull || keyOrd.compare(rNextKey, lKey) < 0))
              advanceRight()
            // consume same-key right rows with time <= left time, holding
            // the latest; null-time right rows (sorted first) never match
            // anyone and are skipped outright. lTimeProj/rTimeProj are
            // distinct projection instances, so their buffers don't clash.
            var consuming = true
            val lTime = lTimeProj(lRow)
            val lTimeNull = lTime.isNullAt(0)
            while (consuming && rNext != null &&
                keyOrd.compare(rNextKey, lKey) == 0) {
              val rTime = rTimeProj(rNext)
              if (rTime.isNullAt(0)) advanceRight()
              else if (!lTimeNull && timeOrd.compare(rTime, lTime) <= 0) {
                rHeld = rNext.copy()
                rHeldKey = heldKeyProj(rHeld)
                advanceRight()
              } else consuming = false
            }
            matched = rHeld != null && !lTimeNull &&
              keyOrd.compare(rHeldKey, lKey) == 0
          }
          numOutputRows += 1
          if (matched) {
            numMatched += 1
            outProj(joined(lRow, rHeld))
          } else outProj(joined(lRow, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
