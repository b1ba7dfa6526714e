package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 observation-collection source: deterministic content, temporal
  * partition pruning at planning time, filter + column pushdown.
  */
class ObservationCollectionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def collection = spark.read
    .format("observation-collection")
    .option("pixels", "4")
    .option("start", "2020-01-01")
    .option("end", "2021-01-01")
    .option("cadence_days", "16")
    .option("rows_per_partition_days", "64")
    .load()

  test("full scan is deterministic with the expected cardinality") {
    // 366-day year, cadence 16 -> 23 acquisition days x 16 pixels
    assert(collection.count() == 23L * 16)
    val a = collection.agg(sum("value")).collect()(0).getDouble(0)
    val b = collection.agg(sum("value")).collect()(0).getDouble(0)
    assert(a == b)
    // deterministic single value
    val v = collection
      .filter(col("longitude") === 1.0 && col("latitude") === 2.0)
      .orderBy("time").limit(1).select("value").collect()(0).getDouble(0)
    assert(v == ObservationCollection.value(1, 2,
      java.time.LocalDate.parse("2020-01-01").toEpochDay.toInt, 42L))
  }

  test("temporal filter prunes planned partitions") {
    val full = collection.rdd.getNumPartitions
    val narrow = collection
      .filter(col("time") >= lit("2020-01-01").cast("timestamp") &&
        col("time") < lit("2020-03-01").cast("timestamp"))
      .rdd.getNumPartitions
    assert(full > narrow, s"full=$full narrow=$narrow")
    // and the filter itself still applies exactly
    val n = collection
      .filter(col("time") >= lit("2020-01-01").cast("timestamp") &&
        col("time") < lit("2020-03-01").cast("timestamp"))
      .count()
    // acquisition days: Jan 1 + 16k < Mar 1 (60 days) -> k = 0..3 -> 4 days
    assert(n == 4L * 16)
  }

  test("pushed filters and pruned columns appear in the scan") {
    val df = collection
      .filter(col("time") >= lit("2020-06-01").cast("timestamp"))
      .select("longitude", "value")
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("pushedRange=true"), scanDesc)
    val out = df.collect()
    assert(out.nonEmpty && out.head.schema.fieldNames.toSeq ==
      Seq("longitude", "value"))
  }

  test("COUNT/MIN/MAX push down completely; filtered aggs do not") {
    val agg = collection.agg(count(lit(1)).as("n"),
      min(col("time")).as("t0"), max(col("time")).as("t1"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("AGG-PUSHDOWN"), plan)
    val row = agg.collect()(0)
    assert(row.getAs[Long]("n") == 23L * 16)
    assert(row.getAs[java.sql.Timestamp]("t0").toInstant ==
      java.time.Instant.parse("2020-01-01T00:00:00Z"))
    // last acquisition day: Jan 1 + 16*22 = day 352 = 2020-12-18
    assert(row.getAs[java.sql.Timestamp]("t1").toInstant ==
      java.time.Instant.parse("2020-12-18T00:00:00Z"))
    // a WHERE keeps a residual Filter -> Spark must NOT offer the agg;
    // result comes from the row scan and stays exact
    val filtered = collection
      .filter(col("time") >= lit("2020-06-01").cast("timestamp"))
      .agg(count(lit(1)).as("n"))
    val fplan = filtered.queryExecution.executedPlan.toString
    assert(!fplan.contains("AGG-PUSHDOWN"), fplan)
    // aligned days in [Jun 1, Jan 1): day 160 is the first aligned
    // acquisition >= 152 (2020-06-01); then every 16 -> 13 days
    assert(filtered.collect()(0).getAs[Long]("n") == 13L * 16)
  }

  test("micro-batch stream replays the collection with batch parity") {
    val stream = spark.readStream
      .format("observation-collection")
      .option("pixels", "4")
      .option("start", "2020-01-01")
      .option("end", "2020-07-01")
      .option("cadence_days", "16")
      .option("rows_per_partition_days", "64")
      .load()
    val q = stream.writeStream
      .outputMode("append")
      .format("memory").queryName("obs_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("obs_stream")
    val batch = spark.read.format("observation-collection")
      .option("pixels", "4").option("start", "2020-01-01")
      .option("end", "2020-07-01").option("cadence_days", "16")
      .load()
    assert(streamed.count() == batch.count())
    val sSum = streamed.agg(sum("value")).collect()(0).getDouble(0)
    val bSum = batch.agg(sum("value")).collect()(0).getDouble(0)
    assert(math.abs(sSum - bSum) < 1e-9)
  }

  test("long replay past the per-trigger admission cap loses no days") {
    // slice=4 days -> 32 days admitted per trigger; 2020-01-01..2021-01-01
    // spans 366 days -> 12 triggers. Before the SupportsAdmissionControl
    // fix, everything past day 32 was committed but never read.
    val stream = spark.readStream
      .format("observation-collection")
      .option("pixels", "2")
      .option("start", "2020-01-01")
      .option("end", "2021-01-01")
      .option("cadence_days", "16")
      .option("rows_per_partition_days", "4")
      .load()
    val q = stream.writeStream
      .outputMode("append")
      .format("memory").queryName("obs_stream_long")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("obs_stream_long")
    val batch = spark.read.format("observation-collection")
      .option("pixels", "2").option("start", "2020-01-01")
      .option("end", "2021-01-01").option("cadence_days", "16")
      .load()
    // 23 acquisition days x 4 pixels, well past one 32-day admission
    assert(batch.count() == 23L * 4)
    assert(streamed.count() == batch.count())
    val sSum = streamed.agg(sum("value")).collect()(0).getDouble(0)
    val bSum = batch.agg(sum("value")).collect()(0).getDouble(0)
    assert(math.abs(sSum - bSum) < 1e-9)
  }

  test("matches the reference-shaped lifecycle: composite + kernel run") {
    // the source feeds the standard pipeline unchanged
    val obs = collection
    val composite = obs
      .groupBy(col("longitude"), col("latitude"),
        date_trunc("month", col("time")).as("m"))
      .agg(avg("value").as("value"))
    assert(composite.count() == 12L * 16)
  }
}
