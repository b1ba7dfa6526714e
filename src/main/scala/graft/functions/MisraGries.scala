package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter summary as a bounded-state aggregate: at
  * most `k` counters regardless of input size, with the classic
  * guarantee that every item of true frequency > N/(k+1) is present in
  * the summary (its counter may undercount by at most N/(k+1)).
  *
  * Why this exists: exact heavy hitters (`groupBy(gram).count` +
  * HAVING) shuffles EVERY distinct item once per partition — at 100 TB
  * the distinct-trigram set is billions of entries, and the exchange,
  * not the counting, becomes the bottleneck. This aggregate's map-side
  * partials are capped at `k` entries each, so the shuffle moves
  * O(k × partitions) rows however large the vocabulary. Downstream,
  * an exact recount of ONLY the returned candidates (a broadcast semi
  * join) restores exactness — see
  * [[graft.text.TextAnalysis.guaranteedHeavyHitters]].
  *
  * Merge follows Agarwal et al., "Mergeable Summaries" (PODS '12):
  * sum counters, then subtract the (k+1)-th largest count from all and
  * drop the non-positive — the result keeps the MG error bound, so
  * partial aggregation and tree reduction are sound.
  *
  * The candidate SET this summary returns is order-dependent at the
  * margins (non-heavy survivors vary with partitioning); every
  * GUARANTEED heavy item is always present, which is the property the
  * exact-recount composition relies on. Returned sorted for display
  * determinism.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k > 0, s"k must be positive: $k")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(b: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      val cur = b.get(s)
      if (cur != 0L || b.containsKey(s)) b.put(s, cur + 1L)
      else if (b.size < k) b.put(s, 1L)
      else {
        // decrement-all: amortized O(1) per stream element — each pass
        // cancels k+1 arrivals (k counters + this one)
        val it = b.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    b
  }

  override def merge(b1: java.util.HashMap[String, Long],
      b2: java.util.HashMap[String, Long])
      : java.util.HashMap[String, Long] = {
    val it2 = b2.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      val cur = b1.get(e.getKey)
      b1.put(e.getKey, cur + e.getValue)
    }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count, drop non-positive
      val counts = new Array[Long](b1.size)
      var i = 0
      val vit = b1.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (k + 1)) // (k+1)-th largest
      val it = b1.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= sub) it.remove() else e.setValue(e.getValue - sub)
      }
    }
    b1
  }

  override def eval(b: java.util.HashMap[String, Long]): Any = {
    val keys = b.keySet().toArray(new Array[String](b.size))
    java.util.Arrays.sort(keys.asInstanceOf[Array[Object]])
    new GenericArrayData(keys.map(UTF8String.fromString(_: String)))
  }

  override def serialize(b: java.util.HashMap[String, Long]): Array[Byte] = {
    var bytes = 4
    val entries = new Array[(Array[Byte], Long)](b.size)
    var i = 0
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(StandardCharsets.UTF_8)
      entries(i) = (kb, e.getValue)
      bytes += 4 + kb.length + 8
      i += 1
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(entries.length)
    entries.foreach { case (kb, c) =>
      bb.putInt(kb.length).put(kb).putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      b.put(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(
      newChild: Expression): MisraGriesAgg = copy(child = newChild)
}

object MisraGries {
  /** DataFrame form: candidate heavy hitters of `c` (StringType) with
    * at most `k` counters of aggregation state; guaranteed to contain
    * every item of frequency > N/(k+1).
    */
  def misra_gries(c: Column, k: Int): Column =
    ColumnBridge.toColumn(
      MisraGriesAgg(ColumnBridge.toExpression(c), k)
        .toAggregateExpression())
}
