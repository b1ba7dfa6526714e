package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-histogram triage summary as a bounded-state aggregate — the
  * production-scale twin of [[graft.multimodal.Multimodal.byteTriage]]
  * (r12 verdict #4): the explode form emits ONE internal row per
  * payload byte before its partial aggregate collapses them, which is
  * 10⁶ rows per document at MB-scale media payloads; this aggregate
  * folds each payload's characters directly into a 256-slot count
  * array (plus a lazily-allocated overflow map for code points > 255,
  * so non-ASCII input keeps the explode form's exact semantics), so
  * row traffic is one row per payload chunk and state is ≤ 256 longs —
  * the [[MisraGriesAgg]] bounded-state pattern applied to histograms.
  *
  * Semantics contract: identical OUTPUT to `byteTriage` row for row
  * (same stats, same lower-byte tiebreak, same printable window and
  * verdict threshold) — `ByteTriageAggSpec` asserts frame equality and
  * the driver twin `mm_byte_triage_agg` shares `mm_byte_triage`'s
  * DuckDB oracle verbatim. "Byte" here is the character code point,
  * matching the explode form's `ascii(substring(t, i, 1))` convention
  * (identical on ASCII payloads; a raw-binary corpus would feed
  * `get_byte` values to both forms the same way).
  */
case class ByteTriageAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ByteTriageAgg.Hist]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  // null for an all-empty group (the caller filters empties out to
  // match the oracle's row-drop, but the aggregate must not lie about
  // its domain)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_distinct_bytes", LongType, nullable = false),
    StructField("top_byte", IntegerType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("printable_ppm", LongType, nullable = false),
    StructField("simpson_u", LongType, nullable = false),
    StructField("verdict", StringType, nullable = false)))
  override def prettyName: String = "byte_triage"

  override def createAggregationBuffer(): ByteTriageAgg.Hist =
    new ByteTriageAgg.Hist()

  override def update(b: ByteTriageAgg.Hist,
      input: InternalRow): ByteTriageAgg.Hist = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        b.add(cp, 1L)
        i += Character.charCount(cp)
      }
    }
    b
  }

  override def merge(b1: ByteTriageAgg.Hist,
      b2: ByteTriageAgg.Hist): ByteTriageAgg.Hist = {
    var i = 0
    while (i < 256) { b1.counts(i) += b2.counts(i); i += 1 }
    if (b2.overflow != null) {
      val it = b2.overflow.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        b1.add(e.getKey, e.getValue)
      }
    }
    b1
  }

  override def eval(b: ByteTriageAgg.Hist): Any = {
    var nBytes = 0L
    var nDistinct = 0L
    var topByte = -1
    var topCount = 0L
    var printable = 0L
    var simpson = 0L
    // ascending byte order, so strict > keeps the LOWEST byte on count
    // ties — the explode form's max(struct(c, -b)) tiebreak
    def visit(cp: Int, c: Long): Unit = {
      nBytes += c
      nDistinct += 1
      if (c > topCount) { topCount = c; topByte = cp }
      if (cp >= 32 && cp <= 126) printable += c
      simpson += c * c
    }
    var i = 0
    while (i < 256) {
      if (b.counts(i) > 0) visit(i, b.counts(i))
      i += 1
    }
    if (b.overflow != null) {
      // ascending over the overflow code points too (all > 255, so
      // they sort after the dense slots — visit order stays global
      // ascending and the strict-> tiebreak stays exact)
      val sorted = new java.util.TreeMap[Integer, java.lang.Long](b.overflow)
      val it2 = sorted.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        visit(e.getKey, e.getValue)
      }
    }
    if (nBytes == 0) null // empty payload: no histogram row, both forms
    else {
      val ppm = printable * 1000000L / nBytes
      new GenericInternalRow(Array[Any](nBytes, nDistinct, topByte,
        topCount, ppm, simpson,
        UTF8String.fromString(if (ppm >= 950000L) "text" else "binary")))
    }
  }

  override def serialize(b: ByteTriageAgg.Hist): Array[Byte] = {
    var n = 0
    var i = 0
    while (i < 256) { if (b.counts(i) != 0) n += 1; i += 1 }
    val ovN = if (b.overflow == null) 0 else b.overflow.size()
    val bb = ByteBuffer.allocate(4 + (n + ovN) * 12)
    bb.putInt(n + ovN)
    i = 0
    while (i < 256) {
      if (b.counts(i) != 0) { bb.putInt(i); bb.putLong(b.counts(i)) }
      i += 1
    }
    if (b.overflow != null) {
      val it = b.overflow.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        bb.putInt(e.getKey); bb.putLong(e.getValue)
      }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ByteTriageAgg.Hist = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new ByteTriageAgg.Hist()
    val n = bb.getInt
    var i = 0
    while (i < n) {
      b.add(bb.getInt, bb.getLong)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): ByteTriageAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ByteTriageAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(
      newChild: Expression): ByteTriageAgg = copy(child = newChild)
}

object ByteTriageAgg {
  /** 256 dense slots for the byte range + a lazily-allocated map for
    * code points above 255 (non-ASCII text payloads), so state stays
    * ≤ 256 longs on byte-like input yet never drops data.
    */
  final class Hist {
    val counts = new Array[Long](256)
    var overflow: java.util.HashMap[Integer, java.lang.Long] = null
    def add(cp: Int, c: Long): Unit =
      if (cp < 256) counts(cp) += c
      else {
        if (overflow == null)
          overflow = new java.util.HashMap[Integer, java.lang.Long]()
        val cur = overflow.get(Integer.valueOf(cp))
        overflow.put(Integer.valueOf(cp),
          java.lang.Long.valueOf((if (cur == null) 0L else cur.longValue()) + c))
      }
  }

  /** DataFrame form: the full byteTriage summary struct of `c`'s
    * character code points in bounded aggregation state.
    */
  def byte_triage(c: Column): Column =
    ColumnBridge.toColumn(
      ByteTriageAgg(ColumnBridge.toExpression(c)).toAggregateExpression())
}
