package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming composites (SURVEY §2.10): the A1 tumbling
  * mean composite as an event-time windowed aggregation with a
  * watermark — the streaming twin of the batch pipeline; late data past
  * the watermark is dropped, state is bounded by (keys × open windows).
  *
  * The reference is strictly batch (`calculations/routes.py:22-33`);
  * this is the additive scope the composite operator earns for free on
  * Spark.
  */
/** Mutable-state row for [[StreamingComposites.runningUserState]]. */
final case class UserRunning(user_id: Long, n: Long, total: Double)

object StreamingComposites {

  /** Schema of the canonical observation stream (FIXTURES.md A1). */
  val observationSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("longitude", DoubleType),
    StructField("latitude", DoubleType),
    StructField("time", TimestampType),
    StructField("value", DoubleType)))

  /** File-source observation stream over a parquet directory. */
  def readObservationStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(observationSchema).parquet(dir)

  /** Tumbling event-time mean composite with watermark: one output row
    * per (pixel, window) once the watermark passes the window end.
    */
  def tumblingComposite(obs: DataFrame, windowLength: String,
      watermarkDelay: String): DataFrame =
    obs
      .withWatermark("time", watermarkDelay)
      .groupBy(col("longitude"), col("latitude"),
        window(col("time"), windowLength).as("w"))
      .agg(avg(col("value")).as("value"), count(lit(1)).as("n_obs"))
      .select(col("longitude"), col("latitude"),
        col("w.start").as("bucket_start"), col("value"), col("n_obs"))

  /** Custom arbitrary state: running per-user counters via
    * `flatMapGroupsWithState` — the escape hatch when windowed
    * aggregation can't express the state machine. Emits one updated
    * row per user per micro-batch.
    */
  def runningUserState(spark: SparkSession, events: DataFrame)
      : org.apache.spark.sql.Dataset[UserRunning] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)],
            state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { case (_, v) => n += 1; total += v }
          val next = UserRunning(user, n, total)
          state.update(next)
          Iterator(next)
      }
  }

  /** Gap-based streaming sessionization via the native merging
    * `session_window` operator: a session extends while events arrive
    * within `gap` of the last one; in append mode a session row emits
    * once the watermark passes its (gap-extended) end, so state is
    * bounded by open sessions per user. The streaming twin of the batch
    * `la_session_window` query.
    */
  def sessionizeStream(events: DataFrame, gap: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("total_value"))

  /** Watermarked stream-stream join: attribute each `purchase` to the
    * `click` of the same user within the preceding hour. Both sides are
    * watermarked and the join condition bounds event time on both
    * sides, so state eviction is provable — Spark drops buffered rows
    * once the watermark passes their join window.
    */
  def attributeStream(clicks: DataFrame, purchases: DataFrame,
      watermarkDelay: String): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"),
      col("ts").as("c_ts"), col("event_id").as("click_id"))
      .withWatermark("c_ts", watermarkDelay)
    val p = purchases.select(col("user_id").as("p_user"),
      col("ts").as("p_ts"), col("event_id").as("purchase_id"),
      col("value"))
      .withWatermark("p_ts", watermarkDelay)
    p.join(c, expr(
      """c_user = p_user AND
        |p_ts >= c_ts AND p_ts <= c_ts + interval 1 hour""".stripMargin))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
        col("c_ts"), col("p_ts"), col("value"))
  }

  /** Streaming exact dedup with BOUNDED state: unlike `dropDuplicates`
    * (which must keep every key seen forever unless the event-time
    * column is part of the key), `dropDuplicatesWithinWatermark` evicts
    * a key's state once the watermark passes its first-seen event time
    * plus the delay — the form that survives unbounded streams.
    * Duplicates arriving within the watermark window are dropped;
    * exact-duplicate keys separated by more than the delay are treated
    * as new (the documented trade-off).
    */
  def dedupStream(events: DataFrame, idCols: Seq[String],
      watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Per-event-type running counters (the A4 stats block as a streaming
    * aggregation in update mode).
    */
  def runningTypeCounts(events: DataFrame, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"),
        col("total"))
}
