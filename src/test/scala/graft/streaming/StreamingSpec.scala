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

  test("flatMapGroupsWithState running counters match batch totals") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ev_stream").toString
    val rows = (1 to 500).map { i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 ${i % 24}%02d:00:00"),
        (i % 7).toLong, "click", i * 0.5, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(2).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(rows.toDF("event_id", "ts", "user_id", "event_type",
        "value", "props").schema)
      .parquet(dir)
    val q = StreamingComposites.runningUserState(spark, stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("running")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // last update per user == batch aggregate
    val got = spark.table("running")
      .groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.max($"n").as("n"),
        org.apache.spark.sql.functions.max($"total").as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val batch = rows.groupBy(_._3).map { case (u, rs) =>
      (u, rs.size.toLong, rs.map(_._5).sum)
    }.toSeq.sortBy(_._1)
    assert(got.length == batch.length)
    got.zip(batch).foreach { case ((u1, n1, t1), (u2, n2, t2)) =>
      assert(u1 == u2 && n1 == n2 && math.abs(t1 - t2) < 1e-9)
    }
  }

  test("streaming session_window sessions match batch sessionization") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, session_window, sum}
    val dir = java.nio.file.Files.createTempDirectory("sess_stream").toString
    // 3 users; bursts of events 5 min apart, separated by >30 min gaps,
    // then a late tail event that must stay in an OPEN session
    val rows = for {
      u <- Seq(1L, 2L, 3L)
      burst <- 0 to 3
      i <- 0 to 4
    } yield (u * 1000 + burst * 10 + i,
      Timestamp.valueOf(f"2024-01-01 ${8 + burst * 2}%02d:${i * 5}%02d:00"),
      u, "click", i * 1.0, "{}")
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    df.coalesce(2).write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(df.schema).parquet(dir)
    val q = StreamingComposites.sessionizeStream(stream, "30 minutes", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // batch twin over the same data
    val batch = df
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("total_value"))
    // watermark = max ts (14:20) - 1h = 13:20: sessions ending before it
    // seal; the 14:00-burst session (end 14:50) stays open
    val sealedSet = batch.filter(col("session_end") <= lit(Timestamp.valueOf("2024-01-01 13:20:00")))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    val streamed = spark.table("sessions")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(streamed == sealedSet, s"streamed=$streamed\nsealed=$sealedSet")
    assert(streamed.nonEmpty && streamed.size == 9) // 3 users x 3 sealed bursts
  }

  test("stream-stream join attributes purchases to clicks within the hour") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val cdir = java.nio.file.Files.createTempDirectory("click_stream").toString
    val pdir = java.nio.file.Files.createTempDirectory("buy_stream").toString
    // user 1: click 09:00 → purchases 09:30 (in window) and 11:00 (out)
    // user 2: click 10:00 → purchase 10:10 (in); user 3: purchase, no click
    val clicks = Seq(
      (101L, Timestamp.valueOf("2024-01-01 09:00:00"), 1L),
      (102L, Timestamp.valueOf("2024-01-01 10:00:00"), 2L),
      (103L, Timestamp.valueOf("2024-01-01 23:00:00"), 9L)) // watermark driver
      .toDF("event_id", "ts", "user_id")
    val buys = Seq(
      (201L, Timestamp.valueOf("2024-01-01 09:30:00"), 1L, 10.0),
      (202L, Timestamp.valueOf("2024-01-01 11:00:00"), 1L, 20.0),
      (203L, Timestamp.valueOf("2024-01-01 10:10:00"), 2L, 30.0),
      (204L, Timestamp.valueOf("2024-01-01 10:20:00"), 3L, 40.0),
      (205L, Timestamp.valueOf("2024-01-01 23:00:00"), 9L, 0.0))
      .toDF("event_id", "ts", "user_id", "value")
    clicks.coalesce(1).write.mode("overwrite").parquet(cdir)
    buys.coalesce(1).write.mode("overwrite").parquet(pdir)

    val cs = spark.readStream.schema(clicks.schema).parquet(cdir)
    val ps = spark.readStream.schema(buys.schema).parquet(pdir)
    val q = StreamingComposites.attributeStream(cs, ps, "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("attributed")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("attributed")
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((201L, 101L), (203L, 102L), (205L, 103L)),
      got.toString)
  }

  test("streaming exact dedup drops duplicate ids within the watermark") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dup_stream").toString
    // 300 rows over 100 distinct ids (each id appears 3x)
    val rows = (0 until 300).map { i =>
      ((i % 100).toLong,
        Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"),
        i * 1.0)
    }
    rows.toDF("id", "ts", "v").coalesce(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(rows.toDF("id", "ts", "v").schema).parquet(dir)
    val q = stream
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("id")
      .writeStream.outputMode("append")
      .format("memory").queryName("deduped")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val n = spark.table("deduped").select("id").distinct().count()
    assert(spark.table("deduped").count() == 100, "one row per id")
    assert(n == 100)
  }

  test("dropDuplicatesWithinWatermark dedups with bounded state") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dupw_stream").toString
    val rows = (0 until 300).map { i =>
      ((i % 100).toLong,
        Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"),
        i * 1.0)
    }
    rows.toDF("id", "ts", "v").coalesce(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(rows.toDF("id", "ts", "v").schema).parquet(dir)
    val q = StreamingComposites.dedupStream(stream, Seq("id"), "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedupedw")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // all duplicates of an id land within 5 minutes -> one row per id
    assert(spark.table("dedupedw").select("id").distinct().count() == 100)
    assert(spark.table("dedupedw").count() == 100)
  }
}
