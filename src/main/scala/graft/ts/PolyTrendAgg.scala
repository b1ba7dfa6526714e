package graft.ts

import graft.model.TV
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/** Result struct surfaced to DataFrames by [[PolyTrendAgg]]. Fields are
  * Option-typed so a too-short/unclassifiable series yields a row of
  * nulls instead of crashing the encoder (a top-level null product
  * can't be encoded by Spark's udaf machinery; at corpus scale short
  * series WILL occur).
  */
final case class PTOut(
    trend_type: Option[Int],
    slope: Option[Double],
    direction: Option[Int],
    significance: Option[Int],
    degree: Option[Int])

/** PolyTrend as a typed Spark `Aggregator`: slots into
  * `groupBy(pixel).agg(...)`, replacing the reference's sequential
  * per-pixel R loop (`calculations/polytrend.py:282-309`) with a
  * data-parallel aggregation inside one shuffle.
  *
  * The buffer collects (bucket, value) pairs — bounded by the composite
  * step to one value per year/month, i.e. a few hundred points per key
  * even at 100 TB input (the composite reduces cardinality before this
  * aggregator runs; SURVEY §7.4.4 documents the bound). `finish` sorts by
  * time bucket and classifies.
  *
  * Returns a null row (all fields in a struct of nulls) for series too
  * short to classify — the reference crashes on these (Appendix A.5/A.6).
  */
class PolyTrendAgg(alpha: Double) extends Aggregator[TV, ArrayBuffer[TV], PTOut]
    with Serializable {

  override def zero: ArrayBuffer[TV] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[TV], a: TV): ArrayBuffer[TV] = { b += a; b }

  override def merge(b1: ArrayBuffer[TV], b2: ArrayBuffer[TV]): ArrayBuffer[TV] = {
    b1 ++= b2; b1
  }

  override def finish(buf: ArrayBuffer[TV]): PTOut = {
    val y = buf.sortBy(_.t).map(_.v).toArray
    PolyTrend.classify(y, alpha) match {
      case Some(r) =>
        PTOut(Some(r.trendType), Some(r.slope), Some(r.direction),
          Some(r.significance), Some(r.degree))
      case None => PTOut(None, None, None, None, None)
    }
  }

  override def bufferEncoder: Encoder[ArrayBuffer[TV]] =
    Encoders.kryo[ArrayBuffer[TV]]

  override def outputEncoder: Encoder[PTOut] = Encoders.product[PTOut]
}
