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

  private def verify(df: DataFrame): Unit = {
    val expected = Set("id", "longitude", "latitude", "time", "value")
    val got = df.columns.toSet
    require(expected.subsetOf(got),
      s"observation table missing columns: ${expected -- got}")
  }
}
