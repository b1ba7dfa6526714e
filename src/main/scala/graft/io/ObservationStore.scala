package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Observation dataset I/O (SURVEY §7.1 `io/`): fixed-schema readers for
  * the canonical long-format table (FIXTURES.md A1) and a
  * date-partitioned writer so temporal filters (F1) prune files at the
  * source — the 100 TB posture for `calculations/polytrend.py:458`-style
  * date ranges (SURVEY §4 O2).
  */
object ObservationStore {

  /** Canonical observation schema — schema-on-read with verification,
    * replacing the reference's header-row inference
    * (`calculations/utils.py:13,27`).
    */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("longitude", DoubleType),
    StructField("latitude", DoubleType),
    StructField("time", TimestampType),
    StructField("value", DoubleType)))

  def readParquet(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    verify(df)
    // normalize partition-derived columns away if present
    df.select("id", "longitude", "latitude", "time", "value")
  }

  /** CSV source with the fixed schema (S3 round-trip,
    * `calculations/polytrend.py:483`).
    */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** JSONL source with the fixed schema — the interchange format
    * training-data pipelines actually ship; explicit schema (no
    * inference pass over 100 TB) with PERMISSIVE nulls for corrupt
    * lines.
    */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .option("mode", "PERMISSIVE")
      .json(path)

  /** JSONL sink (one object per line, gzip-friendly). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.select("id", "longitude", "latitude", "time", "value")
      .write.mode("overwrite")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .json(path)

  /** Write date-partitioned (`obs_date=YYYY-MM-DD/`): temporal range
    * filters become `PartitionFilters` — pruned before any file is
    * opened.
    */
  def writePartitioned(df: DataFrame, path: String): Unit =
    df.withColumn("obs_date", to_date(col("time")))
      .write.mode("overwrite")
      .partitionBy("obs_date")
      .parquet(path)

  /** Read back a partitioned store; `time`-derived pruning happens via
    * the obs_date partition column.
    */
  def readPartitioned(spark: SparkSession, path: String,
      startDate: String, endDate: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("obs_date") >= lit(startDate) &&
        col("obs_date") < lit(endDate))
      .select("id", "longitude", "latitude", "time", "value")

  /** Stable integral pixel key for bucketing/joining. Floating-point
    * columns make BAD cluster keys: Spark wraps double join keys in
    * NaN/-0.0 normalization (`knownfloatingpointnormalized`), which can
    * never match a bucket hash over the raw values — the planner
    * disables the bucketed scan and shuffles anyway. An exact BIGINT
    * derived from the coordinate pair restores hash-compatible
    * clustering (xxhash64 over the raw 8-byte patterns; 1:1 per grid
    * pixel up to a 2^-64 collision).
    */
  def pixelId(lon: org.apache.spark.sql.Column,
      lat: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    xxhash64(lon, lat)

  /** Persist as a BUCKETED table: hash-bucketed on the derived
    * `pixel_id` key and sorted within buckets by (pixel_id, time).
    * Every per-pixel operation downstream — the composite groupBy, the
    * kernel aggregation, joins against per-pixel result/state tables
    * bucketed the same way — then reads pre-partitioned data and plans
    * WITHOUT an Exchange on this side. At 100 TB that converts the
    * per-query all-data shuffle into a one-time layout cost at ingest;
    * ScaleLayoutSpec shows the no-Exchange join and aggregation plans
    * on the round-tripped store.
    *
    * Bucket metadata lives in the session catalog (`saveAsTable`);
    * `path` makes it an external table so the files outlive the
    * catalog entry.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int = 32,
      path: Option[String] = None): Unit = {
    verify(df)
    val w = df.select("id", "longitude", "latitude", "time", "value")
      .withColumn("pixel_id", pixelId(col("longitude"), col("latitude")))
      .write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, "pixel_id")
      .sortBy("pixel_id", "time")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Scan of a bucketed store (bucket layout rides along from the
    * catalog — joins/aggs keyed on `pixel_id` skip their Exchange).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  private def verify(df: DataFrame): Unit = {
    val expected = Set("id", "longitude", "latitude", "time", "value")
    val got = df.columns.toSet
    require(expected.subsetOf(got),
      s"observation table missing columns: ${expected -- got}")
  }
}
