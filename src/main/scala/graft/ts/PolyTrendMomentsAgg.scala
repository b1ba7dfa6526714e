package graft.ts

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Mutable sufficient-statistics buffer for [[PolyTrendMomentsAgg]]:
  * power sums of u = t − ref (ref = first t this buffer saw) up to u⁶,
  * cross-moments u^k·y up to k = 3, Σy², and the (min, max, n) needed to
  * recenter at eval time. 15 numbers total, independent of series
  * length.
  */
final class PtMoments(
    var ref: Double,
    var tmin: Double,
    var tmax: Double,
    var n: Long,
    val su: Array[Double], // Σu^k, k = 1..6 at indices 0..5
    val suy: Array[Double], // Σu^k·y, k = 0..3
    var sy2: Double) extends Serializable

/** K1 PolyTrend as a `TypedImperativeAggregate` over CONSTANT-SIZE
  * sufficient statistics — the scale-path variant of [[PolyTrendAgg]]
  * (which buffers the whole series per key through Kryo).
  *
  * Why this matters at 100 TB: the buffer is 15 doubles regardless of
  * series length, so partial aggregation (map-side combine) applies —
  * each input partition reduces its rows to one tiny buffer per key
  * BEFORE the shuffle, and the exchange moves O(keys) bytes instead of
  * O(rows). The collect-the-series variant ships every point.
  *
  * Numerical design (SURVEY §7.4.4): raw power sums of large t (epoch
  * buckets ~5e5) in u⁶ would overflow the 53-bit mantissa, so each
  * buffer centers at the first t it sees (u spans at most the series
  * extent). Merging rebases one buffer's sums onto the other's origin
  * with the binomial shift identity Σ(u+δ)^k = Σ_j C(k,j) δ^(k-j) Σu^j;
  * δ is again bounded by the series extent, so no catastrophic
  * cancellation. At eval the sums are rebased once more onto the
  * centered rank basis x = (t − tmin + 1) − (n+1)/2 — identical to
  * [[Ols.fit]]'s design matrix when buckets are consecutive — and the
  * classification runs off [[PolyTrend.classifyMoments]].
  *
  * Semantics note: x is derived from t-VALUES, so for series with gaps
  * the design is true time spacing (the sort-based variant uses rank
  * spacing); on dense bucket series — what the composite step emits —
  * the two are identical.
  */
case class PolyTrendMomentsAgg(
    t: Expression,
    y: Expression,
    alpha: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PtMoments]
  with ImplicitCastInputTypes with BinaryLike[Expression] {

  override def left: Expression = t
  override def right: Expression = y
  // (Seq[DataType] <: Seq[AbstractDataType]; AbstractDataType itself is
  // private[sql] in Spark 4)
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("trend_type", IntegerType),
    StructField("slope", DoubleType),
    StructField("direction", IntegerType),
    StructField("significance", IntegerType),
    StructField("degree", IntegerType)))
  override def prettyName: String = "polytrend_moments"

  override def createAggregationBuffer(): PtMoments =
    new PtMoments(0.0, 0.0, 0.0, 0L, new Array[Double](6),
      new Array[Double](4), 0.0)

  override def update(b: PtMoments, input: InternalRow): PtMoments = {
    val tv = t.eval(input)
    val yv = y.eval(input)
    if (tv != null && yv != null) {
      val td = tv.asInstanceOf[Double]
      val yd = yv.asInstanceOf[Double]
      if (b.n == 0L) { b.ref = td; b.tmin = td; b.tmax = td }
      else {
        if (td < b.tmin) b.tmin = td
        if (td > b.tmax) b.tmax = td
      }
      val u = td - b.ref
      var uk = u
      var k = 0
      while (k < 6) { b.su(k) += uk; uk *= u; k += 1 }
      uk = 1.0
      k = 0
      while (k < 4) { b.suy(k) += uk * yd; uk *= u; k += 1 }
      b.sy2 += yd * yd
      b.n += 1
    }
    b
  }

  /** C(k, j) for k ≤ 6. */
  private val choose: Array[Array[Double]] = Array.tabulate(7, 7) { (k, j) =>
    if (j > k) 0.0
    else (1 to j).foldLeft(1.0)((acc, i) => acc * (k - i + 1) / i)
  }

  /** Power sums of (u + δ) from power sums of u: out(k) = Σ(u+δ)^k for
    * k = 1..kmax given in(k) = Σu^k (in(0) = n).
    */
  private def shiftSums(in: Array[Double], delta: Double,
      kmax: Int): Array[Double] = {
    val out = new Array[Double](kmax + 1)
    out(0) = in(0)
    var k = 1
    while (k <= kmax) {
      var acc = 0.0
      var dk = 1.0 // δ^(k-j) built downward: start at j = k
      var j = k
      while (j >= 0) {
        acc += choose(k)(j) * dk * in(j)
        dk *= delta
        j -= 1
      }
      out(k) = acc
      k += 1
    }
    out
  }

  override def merge(b1: PtMoments, b2: PtMoments): PtMoments = {
    if (b2.n == 0L) return b1
    if (b1.n == 0L) return b2
    // rebase b2's sums from origin b2.ref to b1.ref: u1 = u2 + δ
    val delta = b2.ref - b1.ref
    val in = new Array[Double](7)
    in(0) = b2.n.toDouble
    System.arraycopy(b2.su, 0, in, 1, 6)
    val shifted = shiftSums(in, delta, 6)
    var k = 0
    while (k < 6) { b1.su(k) += shifted(k + 1); k += 1 }
    // cross moments: Σ(u+δ)^k y = Σ_j C(k,j) δ^(k-j) Σu^j y
    val sy = new Array[Double](4)
    k = 0
    while (k < 4) {
      var acc = 0.0
      var dk = 1.0
      var j = k
      while (j >= 0) { acc += choose(k)(j) * dk * b2.suy(j); dk *= delta; j -= 1 }
      sy(k) = acc
      k += 1
    }
    k = 0
    while (k < 4) { b1.suy(k) += sy(k); k += 1 }
    b1.sy2 += b2.sy2
    b1.n += b2.n
    if (b2.tmin < b1.tmin) b1.tmin = b2.tmin
    if (b2.tmax > b1.tmax) b1.tmax = b2.tmax
    b1
  }

  override def eval(b: PtMoments): Any = {
    if (b.n < 6L) return null
    // final design basis x = u − δ with δ = (tmin − ref) + (n−1)/2,
    // i.e. x = (t − tmin + 1) − (n+1)/2 — Ols.fit's centered index
    val delta = (b.tmin - b.ref) + (b.n - 1) / 2.0
    val in = new Array[Double](7)
    in(0) = b.n.toDouble
    System.arraycopy(b.su, 0, in, 1, 6)
    val sx = shiftSums(in, -delta, 6)
    val sxy = new Array[Double](4)
    var k = 0
    while (k < 4) {
      var acc = 0.0
      var dk = 1.0
      var j = k
      while (j >= 0) {
        acc += choose(k)(j) * dk * b.suy(j)
        dk *= -delta
        j -= 1
      }
      sxy(k) = acc
      k += 1
    }
    PolyTrend.classifyMoments(sx, sxy, b.sy2, alpha) match {
      case Some(r) => new GenericInternalRow(Array[Any](
        r.trendType, r.slope, r.direction, r.significance, r.degree))
      case None => null
    }
  }

  override def serialize(b: PtMoments): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * 15)
    bb.putDouble(b.ref).putDouble(b.tmin).putDouble(b.tmax).putLong(b.n)
    var k = 0
    while (k < 6) { bb.putDouble(b.su(k)); k += 1 }
    k = 0
    while (k < 4) { bb.putDouble(b.suy(k)); k += 1 }
    bb.putDouble(b.sy2)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PtMoments = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new PtMoments(bb.getDouble, bb.getDouble, bb.getDouble,
      bb.getLong, new Array[Double](6), new Array[Double](4), 0.0)
    var k = 0
    while (k < 6) { b.su(k) = bb.getDouble; k += 1 }
    k = 0
    while (k < 4) { b.suy(k) = bb.getDouble; k += 1 }
    b.sy2 = bb.getDouble
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): PolyTrendMomentsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): PolyTrendMomentsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PolyTrendMomentsAgg =
    copy(t = newLeft, y = newRight)
}
