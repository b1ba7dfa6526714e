package graft.sources

import java.time.LocalDate
import java.util.{Map => JMap}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{
  Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan,
  ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters,
  SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset, ReadLimit, ReadMaxRows,
  SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{
  EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 implementation of the reference's parametric
  * image-collection scan (S1, `calculations/polytrend.py:456` /
  * `calculations/dbest.py:495`): a named collection + AOI + date range
  * materializes long-format observations. Where the reference issues one
  * remote `getRegion` call (whole-query abort past the transfer cap —
  * BASELINE.md), this source PLANS the collection: one `InputPartition`
  * per (date-slice × pixel-block), so a 1000-executor cluster reads a
  * planet-scale collection in parallel and a temporal predicate prunes
  * partitions BEFORE any row is generated.
  *
  * Connector surface exercised: `TableProvider` → `Table`/`SupportsRead`
  * → `ScanBuilder` with `SupportsPushDownFilters` (time bounds shrink
  * the planned date range; pushed filters show in `explain`) and
  * `SupportsPushDownRequiredColumns` (column pruning reaches row
  * generation). Registered as `observation-collection` via
  * `DataSourceRegister` (META-INF/services).
  *
  * Values are a deterministic function of (pixel, day, seed) — a
  * sinusoidal seasonal + linear trend + splitmix noise — so tests and
  * cross-run comparisons are exact, standing in for a real remote
  * catalog client the way Multimodal's decode stub stands in for a
  * codec.
  *
  * Options: `pixels` (side of the square grid), `start`/`end`
  * (ISO dates, end exclusive), `cadence_days`, `seed`,
  * `rows_per_partition_days` (date-slice width per partition).
  */
class ObservationCollectionProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "observation-collection"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ObservationCollection.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new ObservationCollectionTable(
      ObservationCollection.Params(properties.asScala.toMap))

  override def supportsExternalMetadata(): Boolean = false
}

object ObservationCollection {
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("longitude", DoubleType, nullable = false),
    StructField("latitude", DoubleType, nullable = false),
    StructField("time", TimestampType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  final case class Params(
      pixels: Int, startDay: Int, endDay: Int, cadenceDays: Int,
      seed: Long, sliceDays: Int) {
    require(pixels > 0 && cadenceDays > 0 && sliceDays > 0 &&
      endDay > startDay, "invalid collection parameters")
  }

  object Params {
    def apply(opts: Map[String, String]): Params = {
      def day(k: String, dflt: String) =
        LocalDate.parse(opts.getOrElse(k, dflt)).toEpochDay.toInt
      Params(
        pixels = opts.getOrElse("pixels", "4").toInt,
        startDay = day("start", "2020-01-01"),
        endDay = day("end", "2021-01-01"),
        cadenceDays = opts.getOrElse("cadence_days", "16").toInt,
        seed = opts.getOrElse("seed", "42").toLong,
        sliceDays = opts.getOrElse("rows_per_partition_days", "64").toInt)
    }
  }

  private def splitmix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Deterministic observation value for (pixel, epoch-day). */
  def value(px: Int, py: Int, day: Int, seed: Long): Double = {
    val season = 0.3 * math.sin(2 * math.Pi * (day % 365) / 365.0)
    val trend = 1e-4 * day * ((px + py) % 3 - 1)
    val noiseBits = splitmix(seed ^ (px.toLong << 40) ^
      (py.toLong << 20) ^ day.toLong)
    val noise = (noiseBits >>> 11).toDouble / (1L << 53).toDouble - 0.5
    0.5 + season + trend + 0.05 * noise
  }
}

final class ObservationCollectionTable(params: ObservationCollection.Params)
    extends Table with SupportsRead {
  override def name(): String = s"observation_collection(${params.pixels}px)"
  override def schema(): StructType = ObservationCollection.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ObservationCollectionScanBuilder(params)
}

final class ObservationCollectionScanBuilder(
    params: ObservationCollection.Params)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var lo: Int = params.startDay // inclusive epoch day
  private var hi: Int = params.endDay // exclusive epoch day
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = ObservationCollection.schema
  private var aggPushed: Option[Aggregation] = None

  private def toDay(v: Any, roundUp: Boolean): Option[Int] = v match {
    case t: java.sql.Timestamp =>
      val micros = t.getTime * 1000L + (t.getNanos / 1000) % 1000
      val d = Math.floorDiv(micros, 86400000000L)
      Some(if (roundUp && Math.floorMod(micros, 86400000000L) > 0)
        d.toInt + 1 else d.toInt)
    case i: java.time.Instant =>
      val micros = i.getEpochSecond * 1000000L + i.getNano / 1000
      val d = Math.floorDiv(micros, 86400000000L)
      Some(if (roundUp && Math.floorMod(micros, 86400000000L) > 0)
        d.toInt + 1 else d.toInt)
    case _ => None
  }

  /** Accept time-bound filters by narrowing the planned [lo, hi) day
    * range (conservatively: day granularity; the engine still applies
    * the exact residual). Everything else is left for Spark.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    filters.foreach {
      case GreaterThanOrEqual("time", v) =>
        toDay(v, roundUp = false).foreach(d => lo = math.max(lo, d))
      case GreaterThan("time", v) =>
        toDay(v, roundUp = false).foreach(d => lo = math.max(lo, d))
      case LessThan("time", v) =>
        toDay(v, roundUp = true).foreach(d => hi = math.min(hi, d))
      case LessThanOrEqual("time", v) =>
        toDay(v, roundUp = true).foreach(d => hi = math.min(hi, d + 1))
      case EqualTo("time", v) =>
        toDay(v, roundUp = false).foreach { d =>
          lo = math.max(lo, d); hi = math.min(hi, d + 1)
        }
      case _ => ()
    }
    pushed = filters.filter {
      case GreaterThanOrEqual("time", _) | GreaterThan("time", _) |
          LessThan("time", _) | LessThanOrEqual("time", _) |
          EqualTo("time", _) => true
      case _ => false
    }
    // day-granular pruning is not exact -> Spark must re-apply ALL
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COUNT(*) / MIN(time) / MAX(time) with no grouping answer
    * analytically from the collection geometry (aligned-day count x
    * pixel grid) — no partition ever runs. Spark only attempts
    * aggregate pushdown when every filter was FULLY pushed; this
    * source declares its day-granular time pushdown as inexact
    * (pushFilters returns all filters as residuals), so a filtered
    * query keeps a Filter node and is never offered here — the
    * lo == startDay && hi == endDay guard just pins that invariant.
    */
  private def canPushAgg(agg: Aggregation): Boolean =
    pushed.isEmpty && lo == params.startDay && hi == params.endDay &&
      agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => m.column.references.map(_.toString) sameElements
          Array("time")
        case m: Max => m.column.references.map(_.toString) sameElements
          Array("time")
        case _ => false
      }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    canPushAgg(agg)

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!canPushAgg(agg)) return false
    aggPushed = Some(agg)
    true
  }

  override def build(): Scan = aggPushed match {
    case Some(agg) => new ObservationAggScan(params, lo, hi, agg)
    case None => new ObservationCollectionScan(params, lo, hi, required)
  }
}

/** Complete-pushdown aggregate scan: one partition, one row, computed
  * from the collection geometry. Row counts follow the reader's
  * cadence alignment exactly (first aligned day >= lo, step
  * cadenceDays, strictly below hi; pixels^2 observations per day).
  */
final class ObservationAggScan(
    params: ObservationCollection.Params,
    lo: Int, hi: Int, agg: Aggregation) extends Scan with Batch {

  private def alignUp(d: Int): Int = {
    val off = Math.floorMod(d - params.startDay, params.cadenceDays)
    if (off == 0) d else d + (params.cadenceDays - off)
  }
  private val firstDay = alignUp(lo)
  private val nDays =
    if (hi <= firstDay) 0L
    else ((hi - firstDay - 1L) / params.cadenceDays) + 1L
  private val lastDay = firstDay + params.cadenceDays * (nDays - 1)

  override def readSchema(): StructType = StructType(
    agg.aggregateExpressions.zipWithIndex.map {
      case (_: CountStar, i) => StructField(s"agg_$i", LongType, false)
      case (_, i) => StructField(s"agg_$i", TimestampType, true)
    })

  override def toBatch: Batch = this
  override def description(): String =
    s"observation-collection AGG-PUSHDOWN days=[$lo,$hi) " +
      s"rows=${nDays * params.pixels * params.pixels}"

  override def planInputPartitions(): Array[InputPartition] =
    Array(ObservationSlice(0, 0, 0, 0))

  override def createReaderFactory(): PartitionReaderFactory = {
    val values: Array[Any] = agg.aggregateExpressions.map {
      case _: CountStar => nDays * params.pixels * params.pixels
      case m: Min =>
        if (nDays == 0L) null else firstDay * 86400000000L
      case _ => if (nDays == 0L) null else lastDay * 86400000000L
    }
    new ObservationAggReaderFactory(values)
  }
}

final class ObservationAggReaderFactory(values: Array[Any])
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = !emitted
      override def get(): InternalRow = {
        emitted = true
        new GenericInternalRow(values.clone())
      }
      override def close(): Unit = ()
    }
}

final case class ObservationSlice(
    startDay: Int, endDay: Int, px0: Int, px1: Int) extends InputPartition

final class ObservationCollectionScan(
    params: ObservationCollection.Params,
    lo: Int, hi: Int, required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"observation-collection days=[$lo,$hi) pixels=${params.pixels} " +
      s"pushedRange=${lo > params.startDay || hi < params.endDay}"

  /** One partition per (date slice × pixel-row block): temporal filters
    * already shrank [lo, hi), so pruned slices are never planned.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    if (hi <= lo) return Array.empty
    val slices = for {
      d0 <- lo until hi by params.sliceDays
      p0 <- 0 until params.pixels by 2
    } yield ObservationSlice(d0, math.min(d0 + params.sliceDays, hi),
      p0, math.min(p0 + 2, params.pixels))
    slices.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ObservationReaderFactory(params, required)

  /** Streaming form: the collection replayed as micro-batches of
    * acquisition days. Offsets are epoch-day indices into [lo, hi);
    * each trigger admits up to `rows_per_partition_days * 8` days —
    * the limit lives in the offset returned by
    * `latestOffset(start, limit)` (SupportsAdmissionControl), so the
    * committed offset never runs ahead of the planned partitions and
    * long replays advance batch by batch without losing days.
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ObservationMicroBatchStream(params, lo, hi, required)
}

final case class DayOffset(day: Int) extends Offset {
  override def json(): String = day.toString
}

/** Rate limiting is expressed through the offset, not the plan: Spark
  * commits whatever end offset `latestOffset(start, limit)` returns, so
  * the admitted range and the planned partitions are the same [s, e) by
  * construction — a multi-year replay advances `sliceDays * 8` days per
  * trigger and never skips data. `planInputPartitions` plans the FULL
  * requested range (no cap): under Trigger.AvailableNow Spark replays
  * to the prepared end across however many triggers that takes.
  */
final class ObservationMicroBatchStream(
    params: ObservationCollection.Params,
    lo: Int, hi: Int, required: StructType) extends MicroBatchStream
    with SupportsTriggerAvailableNow {

  private val daysPerBatch = params.sliceDays
  // days admitted per trigger at the default read limit
  private val admitDays = daysPerBatch.toLong * 8
  // rows per epoch day, amortized over the cadence (>= 1 to progress)
  private def rowsPerDay: Long = math.max(1L,
    params.pixels.toLong * params.pixels / params.cadenceDays)

  override def initialOffset(): Offset = DayOffset(lo)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used via SupportsAdmissionControl")
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = DayOffset(hi)
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[DayOffset].day
    val cap = limit match {
      case r: ReadMaxRows => math.max(1L, r.maxRows() / rowsPerDay)
      case _ => admitDays
    }
    DayOffset(math.min(hi.toLong, s.toLong + cap).toInt)
  }

  override def deserializeOffset(json: String): Offset =
    DayOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[DayOffset].day
    val e = math.min(end.asInstanceOf[DayOffset].day, hi)
    if (e <= s) return Array.empty
    (for {
      d0 <- s until e by daysPerBatch
      p0 <- 0 until params.pixels by 2
    } yield ObservationSlice(d0, math.min(d0 + daysPerBatch, e),
      p0, math.min(p0 + 2, params.pixels)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ObservationReaderFactory(params, required)
}

final class ObservationReaderFactory(
    params: ObservationCollection.Params,
    required: StructType) extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    new ObservationReader(params, partition.asInstanceOf[ObservationSlice],
      required)
}

/** Generates the slice's rows on demand — nothing materializes beyond
  * one row, and column pruning skips computing unprojected fields.
  */
final class ObservationReader(
    params: ObservationCollection.Params,
    slice: ObservationSlice,
    required: StructType) extends PartitionReader[InternalRow] {

  // first cadence-aligned day >= slice.startDay
  private def alignUp(d: Int): Int = {
    val off = Math.floorMod(d - params.startDay, params.cadenceDays)
    if (off == 0) d else d + (params.cadenceDays - off)
  }
  private var day = alignUp(slice.startDay)
  private var px = slice.px0
  private var py = 0
  private val fieldGen: Array[(Int, Int, Int) => Any] =
    required.fields.map { f =>
      f.name match {
        case "id" => (x: Int, y: Int, d: Int) =>
          UTF8String.fromString(s"img_${d}_${x}_$y")
        case "longitude" => (x: Int, _: Int, _: Int) => x.toDouble
        case "latitude" => (_: Int, y: Int, _: Int) => y.toDouble
        case "time" => (_: Int, _: Int, d: Int) => d.toLong * 86400000000L
        case "value" => (x: Int, y: Int, d: Int) =>
          ObservationCollection.value(x, y, d, params.seed)
        case other => throw new IllegalArgumentException(
          s"unknown column $other")
      }
    }

  override def next(): Boolean = day < slice.endDay

  override def get(): InternalRow = {
    val row = new GenericInternalRow(fieldGen.length)
    var i = 0
    while (i < fieldGen.length) { row(i) = fieldGen(i)(px, py, day); i += 1 }
    // advance (py fastest, then px within block, then day)
    py += 1
    if (py >= params.pixels) {
      py = 0; px += 1
      if (px >= slice.px1) { px = slice.px0; day += params.cadenceDays }
    }
    row
  }

  override def close(): Unit = ()
}
