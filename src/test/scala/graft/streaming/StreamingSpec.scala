package graft.streaming

import graft.model.Observation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Streaming composite driven synchronously from a parquet directory
  * through the memory sink (batch parity check).
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming tumbling composite matches the batch composite") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("obs_stream").toString
    val rows = for {
      pixel <- Seq(0.0, 1.0)
      day <- 1 to 20
      sub <- Seq(0, 1)
    } yield Observation(s"img_${day}_$sub", pixel, 0.0,
      Timestamp.valueOf(f"2024-01-$day%02d ${8 + sub * 8}%02d:00:00"),
      pixel + day * 0.1 + sub * 0.01)
    rows.toDF().coalesce(2).write.mode("overwrite").parquet(dir)

    val stream = StreamingComposites.readObservationStream(spark, dir)
    val agg = StreamingComposites.tumblingComposite(stream, "1 day", "2 days")
    val q = agg.writeStream
      .outputMode("append")
      .format("memory").queryName("composites")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("composites")
    // append mode emits only windows sealed by the watermark: max event
    // time Jan 20 16:00 − 2 days = Jan 18 16:00, so day windows 1..17
    // (ends ≤ watermark) emit and days 18-20 stay open
    val n = got.count()
    assert(n == 2 * 17, s"expected 34 sealed windows, got $n")

    // value parity with the batch composite on a sealed window
    val streamed = got
      .filter($"longitude" === 0.0 &&
        $"bucket_start" === Timestamp.valueOf("2024-01-05 00:00:00"))
      .collect()(0).getAs[Double]("value")
    val batch = rows.toDF()
      .filter($"longitude" === 0.0 &&
        $"time" >= Timestamp.valueOf("2024-01-05 00:00:00") &&
        $"time" < Timestamp.valueOf("2024-01-06 00:00:00"))
      .agg(org.apache.spark.sql.functions.avg($"value"))
      .collect()(0).getDouble(0)
    assert(math.abs(streamed - batch) < 1e-12)
  }
}
