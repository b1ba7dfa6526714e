package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Dataset catalog over the driver testdata layout (`TESTDATA.md`):
  * one parquet per table under a scale-factor directory. Plays the role of
  * the reference's named-collection open
  * (`calculations/polytrend.py:456`, `calculations/dbest.py:495` — S1 in
  * SURVEY.md §2.1), with parquet scan + Catalyst pushdown instead of a
  * remote lazy collection.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Session config the catalog needs: nanos-typed parquet timestamps
    * read as long (events.ts), and a UTC session zone — the
    * TIMESTAMP_NTZ→timestamp cast in [[normalizeEvents]] is only exact
    * when the session zone is UTC, so a library caller constructing a
    * non-UTC session must not silently shift every event-time by the
    * zone offset (an r8 advisory). Both keys are runtime-settable.
    * Deployment-grade wiring sets these at session CONSTRUCTION
    * ([[graft.api.GraftEngine.session]], Verify, Bench); [[load]] only
    * falls back to setting them for ad-hoc sessions, and skips the
    * write when they already hold — repeated mutation of a shared
    * session was a review finding (racy under concurrent use).
    */
  val requiredConfs: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true",
      "spark.sql.session.timeZone" -> "UTC")

  /** Apply [[requiredConfs]] to a session builder (construction-time). */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    requiredConfs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  /** Lazy scan of one table; filters/projections push down to parquet.
    *
    * `events.ts` is SCHEMA-ADAPTIVE: upstream generators have shipped it
    * both as parquet TIMESTAMP(NANOS) (which Spark's vectorized reader
    * only accepts as nanos-since-epoch via
    * `spark.sql.legacy.parquet.nanosAsLong`) and as native
    * TIMESTAMP(MICROS) (which Spark reads as TIMESTAMP_NTZ when the file
    * carries isAdjustedToUTC=false). Rather than hard-coding one layout,
    * we dispatch on the OBSERVED `ts` dataType and normalize to the same
    * output contract either way:
    *   - `ts`    µs-precision TimestampType (session tz is pinned UTC at
    *             every entry point, so the NTZ→timestamp cast is exact);
    *   - `ts_ns` nanos-since-epoch BIGINT for full-precision ordering.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      requiredConfs.foreach { case (k, v) =>
        if (!spark.conf.getOption(k).contains(v)) spark.conf.set(k, v)
      }
      val raw = spark.read.parquet(path(dir, name))
      normalizeEvents(raw)
    } else if (name == "documents" || name == "embeddings") {
      normalizeIds(spark.read.parquet(path(dir, name)), name)
    } else spark.read.parquet(path(dir, name))
  }

  /** Canonical column types for the corpus tables, applied as LOSSLESS
    * widenings when the observed parquet type differs (an int32 id, a
    * double[] embedding) — the same drift-insurance contract
    * [[normalizeEvents]] established after the events.ts type change
    * broke ~77 queries: an upstream writer switching integer width or
    * float precision must not take the engine down. Casts that match
    * the observed type are identity and Catalyst elides them; every
    * cast here is map-only and codegen-friendly.
    */
  def normalizeIds(raw: DataFrame, name: String): DataFrame = name match {
    case "documents" =>
      raw.select(col("doc_id").cast("bigint").as("doc_id"),
        col("text").cast("string").as("text"),
        col("lang").cast("string").as("lang"),
        col("source").cast("string").as("source"),
        col("n_chars").cast("bigint").as("n_chars"))
    case "embeddings" =>
      raw.select(col("vec_id").cast("bigint").as("vec_id"),
        col("embedding").cast("array<float>").as("embedding"),
        col("label").cast("int").as("label"))
    case other => raw
  }

  /** Normalize an events(-schema) frame to the `(ts: timestamp, ts_ns:
    * bigint)` contract, dispatching on the observed `ts` type. Shared by
    * the batch catalog and the streaming source so both decode the same
    * way. Map-only — no shuffle, stays inside whole-stage codegen.
    */
  def normalizeEvents(raw: DataFrame): DataFrame = {
    val shaped = raw.schema("ts").dataType match {
      case LongType => // legacy layout: TIMESTAMP(NANOS) read as raw nanos
        raw
          .withColumnRenamed("ts", "ts_ns")
          // integer `div`, not `/`: epoch nanos (~1.7e18) exceed double's
          // 53-bit mantissa, so float division can mis-truncate by 1 µs
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case TimestampType | TimestampNTZType =>
        raw
          .withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
      case other: DataType =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected BIGINT (nanos) or TIMESTAMP")
    }
    shaped.select("event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props")
  }

  /** Register every table as a temp view so `spark.sql` works against the
    * same names the DuckDB oracle uses.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
