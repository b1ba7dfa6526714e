package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded distinct-min-set aggregate: the `limit` SMALLEST distinct
  * Long values of the group, returned sorted ascending — semantically
  * `slice(sort_array(collect_set(x)), 1, limit)`, but with O(limit)
  * aggregation state instead of O(distinct values).
  *
  * Why this exists: `collect_set` materializes the ENTIRE distinct set
  * per key before any downstream slice can cap it — for an inverted
  * index over 100 TB, a stopword's posting buffer is O(corpus docs) on
  * one reducer, which is exactly the state blowup that kills wide
  * aggregations at scale. This buffer never exceeds `limit` entries,
  * every map-side partial is already capped before the exchange, and
  * merge is a capped set-union — so the shuffle moves at most
  * `limit × 8` bytes per (partition, key).
  */
case class BoundedMinSetAgg(
    child: Expression,
    limit: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(limit > 0, s"limit must be positive: $limit")

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bounded_min_set"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(b: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val l = v.asInstanceOf[Long]
      // skip values that cannot enter a full buffer — no churn on the
      // common path once the cap is reached
      if (b.size < limit || l < b.last()) {
        b.add(l)
        if (b.size > limit) b.pollLast()
      }
    }
    b
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator() // ascending
    var continue = true
    while (continue && it.hasNext) {
      val l = it.next()
      if (b1.size < limit || l < b1.last()) {
        b1.add(l)
        if (b1.size > limit) b1.pollLast()
      } else continue = false // b2 is ascending: nothing later can enter
    }
    b1
  }

  override def eval(b: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](b.size)
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.size)
    bb.putInt(b.size)
    val it = b.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { b.add(bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): BoundedMinSetAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedMinSetAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(
      newChild: Expression): BoundedMinSetAgg = copy(child = newChild)
}

object BoundedMinSet {
  /** DataFrame form: the `limit` smallest distinct values of `c`
    * (LongType), sorted ascending, with O(limit) aggregation state.
    */
  def bounded_min_set(c: Column, limit: Int): Column =
    ColumnBridge.toColumn(
      BoundedMinSetAgg(ColumnBridge.toExpression(c), limit)
        .toAggregateExpression())
}
