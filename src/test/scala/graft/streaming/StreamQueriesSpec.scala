package graft.streaming

import graft.io.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Multi-batch replay parity for the oracle-checked StreamQueries
  * entries. The driver's oracle replays the single-file events table —
  * one micro-batch — so cross-batch state (window/session merge, dedup
  * state, join buffers) never fires there. Here the same transforms run
  * over a 4-file, time-INTERLEAVED copy of an events-shaped table with
  * `maxFilesPerTrigger=1` (≥4 micro-batches) and must still equal the
  * batch plan's answer.
  */
class StreamQueriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Tables.configure(
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
    .getOrCreate()

  /** Events-shaped rows (ts = epoch NANOS as Long, like the testdata
    * table reads under nanosAsLong): 10 users, one event every ~7 min
    * per user so 30-min sessions span file boundaries, types cycling so
    * clicks and purchases interleave within the attribution hour.
    */
  private lazy val dataDir: String = {
    import spark.implicits._
    val base = 1704067200L * 1000000000L // 2024-01-01T00:00Z in ns
    val types = Seq("click", "purchase", "view", "click", "error")
    val rows = (0 until 600).map { i =>
      val user = i % 10
      val step = i / 10 // per-user event index
      // a >30-min gap every 13 events closes the session
      val sec = step * 420L + (step / 13) * 2400L + user * 11L
      // type cycles with the PER-USER step (i % types.size would be
      // constant per user since 10 % 5 == 0 — no user would ever have
      // both a click and a purchase, and the attribution join is empty)
      (i.toLong, base + sec * 1000000000L + (i % 3) * 500L, // sub-µs ns tail
        user.toLong, types(step % types.size), i * 0.37 - 20.0, "{}")
    }
    val dir = java.nio.file.Files.createTempDirectory("stq").toString
    val tbl = s"$dir/events.parquet"
    // 4 files, each holding every 4th event — every micro-batch
    // overlaps every hour, session, and join window
    (0 until 4).foreach { slice =>
      rows.filter(_._1 % 4 == slice)
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(tbl)
    }
    dir
  }

  private def multiBatchStream: DataFrame =
    StreamQueries.eventStream(spark, dataDir,
      Map("maxFilesPerTrigger" -> "1"))

  private def batchEvents: DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$dataDir/events.parquet")
      .withColumn("tsu", timestamp_micros(expr("ts div 1000")))
  }

  /** Run to completion like StreamQueries.runToCompletion but surface
    * the batch count so the test can prove the replay was multi-batch.
    */
  private def run(df: DataFrame, mode: String, name: String): (DataFrame, Long) = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batches = q.recentProgress.map(_.batchId).distinct.length.toLong
    (spark.table(name), batches)
  }

  private def rowSet(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("hourly counts: 4-batch replay equals the batch aggregation") {
    val (got, batches) = run(
      StreamQueries.hourlyCounts(multiBatchStream), "complete", "mb_hourly")
    assert(batches >= 4, s"expected >=4 micro-batches, saw $batches")
    assert(rowSet(got) == rowSet(StreamQueries.hourlyCounts(batchEvents)))
  }

  test("session windows merge across micro-batches to the batch answer") {
    val (got, batches) = run(
      StreamQueries.sessionWindows(multiBatchStream), "complete", "mb_sess")
    assert(batches >= 4)
    val expected = StreamQueries.sessionWindows(batchEvents)
    // >1 session per user (the planted gaps) and >1 event per session
    // (sessions assembled from events scattered over all 4 files)
    assert(expected.count() > 10)
    assert(rowSet(got) == rowSet(expected))
  }

  test("streaming distinct emits each pair exactly once across batches") {
    val (got, batches) = run(
      StreamQueries.distinctPairs(multiBatchStream), "append", "mb_dd")
    assert(batches >= 4)
    assert(got.count() == got.dropDuplicates().count()) // no re-emission
    assert(rowSet(got) == rowSet(StreamQueries.distinctPairs(batchEvents)))
  }

  test("streaming PSI day counts equal the batch aggregation across " +
      "batches") {
    val (got, batches) = run(
      StreamQueries.psiDayCounts(multiBatchStream), "complete", "mb_psi")
    assert(batches >= 4)
    assert(rowSet(got) == rowSet(StreamQueries.psiDayCounts(batchEvents)))
    // fixture values span [-20, 202]: the negatives clamp into bucket 0
    // (not bucket -1) and nothing reaches bucket 1 — the clamp floor
    // semantics are pinned by the whole set landing on exactly {0}
    val buckets = got.select("bucket").collect().map(_.getLong(0)).toSet
    assert(buckets == Set(0L))
  }

  test("streaming DQ monitor equals the batch audit across batches") {
    val (got, batches) = run(
      StreamQueries.dqMonitor(multiBatchStream), "complete", "mb_dq")
    assert(batches >= 4)
    val expected = StreamQueries.dqMonitor(batchEvents)
    // the fixture's negative values make the range rule genuinely fire
    assert(expected.collect().head.getLong(1) > 0)
    assert(rowSet(got) == rowSet(expected))
  }

  test("stream-stream attribution joins rows that arrive in different batches") {
    val (got, batches) = run(
      StreamQueries.clickAttribution(multiBatchStream), "append", "mb_attr")
    assert(batches >= 4)
    val expected = StreamQueries.clickAttribution(batchEvents)
    // the interleaved slicing guarantees some (click, purchase) matches
    // land in different micro-batches
    assert(expected.count() > 50)
    assert(rowSet(got) == rowSet(expected))
  }

  test("left-outer interval join null-extends across time-ordered batches") {
    import org.apache.spark.sql.functions._
    // The outer join runs a 0-SECOND watermark (null emission needs the
    // watermark to advance), so the interleaved slices — where every
    // file spans the whole timeline — would late-drop batches 2-4.
    // Time-CONTIGUOUS slices are the legitimate replay: a candidate
    // click always precedes its error, and the watermark (strictly
    // behind the current batch) can never evict it early. Rebuild the
    // same rows as 4 time-ordered files.
    val rows = batchEvents.select("event_id", "ts", "user_id",
      "event_type", "value", "props").orderBy("ts").collect()
    val dir = java.nio.file.Files.createTempDirectory("stq_split").toString
    val tbl = s"$dir/events.parquet"
    val per = (rows.length + 3) / 4
    import spark.implicits._
    (0 until 4).foreach { slice =>
      rows.slice(slice * per, (slice + 1) * per)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getDouble(4), r.getString(5)))
        .toSeq
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(tbl)
    }
    val stream = StreamQueries.eventStream(spark, dir,
      Map("maxFilesPerTrigger" -> "1"))
    val (got, batches) = run(
      StreamQueries.outerIntervalJoin(stream), "append", "mb_outer")
    assert(batches >= 4)
    // batch expectation = LEFT JOIN + the watermark rule: unmatched
    // errors emit iff e_ts < least(max error ts, max click ts)
    val ev = batchEvents
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("tsu").as("e_ts"),
        col("event_id").as("error_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("tsu").as("c_ts"),
        col("event_id").as("click_id"))
    val wm = math.min(
      errors.agg(max(unix_micros(col("e_ts")))).head().getLong(0),
      clicks.agg(max(unix_micros(col("c_ts")))).head().getLong(0))
    val expected = errors.join(clicks, expr(
        """c_user = e_user AND
          |c_ts >= e_ts - interval 30 minutes AND
          |c_ts <= e_ts""".stripMargin), "left_outer")
      .filter(col("click_id").isNotNull ||
        unix_micros(col("e_ts")) < lit(wm))
      .select(col("error_id"), col("click_id"),
        col("e_user").as("user_id"),
        unix_micros(col("e_ts")).as("e_us"),
        unix_micros(col("c_ts")).as("c_us"))
    // the op's point is the null extension — make sure it fired
    assert(expected.filter(col("click_id").isNull).count() > 0)
    assert(rowSet(got) == rowSet(expected))
  }

  test("stream-static enrichment equals the batch join across batches") {
    import spark.implicits._
    // static dim: users 0-4 in segment A, 5-9 in B — every micro-batch
    // touches both segments, so per-batch joins must accumulate
    val dim = (0 until 10)
      .map(u => (u.toLong, if (u < 5) "SEG_A" else "SEG_B"))
      .toDF("c_custkey", "c_mktsegment")
    val (got, batches) = run(
      StreamQueries.staticEnrich(multiBatchStream, dim), "complete",
      "mb_enrich")
    assert(batches >= 4)
    assert(rowSet(got) == rowSet(
      StreamQueries.staticEnrich(batchEvents, dim)))
  }

  private lazy val docsDir: String = {
    import spark.implicits._
    val rows = (0 until 80).map { i =>
      // even docs share one 7-token sentence (its 5 trigrams each hit
      // 40×); odd docs contribute only unique grams (count 1)
      val txt = if (i % 2 == 0) "spark makes big data simple for all"
        else s"unique tokens t${i}a t${i}b t${i}c"
      (i.toLong, txt, "en", "syn", txt.length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("stq_docs").toString
    (0 until 4).foreach { slice =>
      rows.filter(_._1 % 4 == slice)
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("append").parquet(s"$dir/documents.parquet")
    }
    dir
  }

  test("streaming epoch mix equals the batch mix across micro-batches") {
    import spark.implicits._
    // srcN sources so the weight CASE resolves; 4 file slices force a
    // multi-batch replay of the stateless map-only transform
    val dir = java.nio.file.Files.createTempDirectory("stq_mix").toString
    val rows = (0 until 80).map(i =>
      (i.toLong, s"doc $i text", "en", s"src${i % 8}", 10L))
    (0 until 4).foreach { slice =>
      rows.filter(_._1 % 4 == slice)
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("append").parquet(s"$dir/documents.parquet")
    }
    val wtSql = "CASE CAST(substring(source, 4) AS INT) % 4 " +
      "WHEN 0 THEN 4 WHEN 1 THEN 10 WHEN 2 THEN 17 ELSE 25 END"
    val stream = StreamQueries.docStream(spark, dir,
      Map("maxFilesPerTrigger" -> "1"))
    val (got, batches) = run(
      graft.pipeline.Sampling.epochMix(stream, "doc_id", wtSql)
        .select("doc_id", "source", "n_copies", "copy"),
      "append", "mb_epoch_mix")
    assert(batches >= 4)
    val batch = graft.pipeline.Sampling.epochMix(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", wtSql)
      .select("doc_id", "source", "n_copies", "copy")
    assert(rowSet(got) == rowSet(batch) && got.count() > 80 / 2)
  }

  test("streaming frequent ngrams accumulate across micro-batches") {
    val stream = StreamQueries.docStream(spark, docsDir,
      Map("maxFilesPerTrigger" -> "1"))
    val (got, batches) = run(
      StreamQueries.frequentNgrams(stream, minSupport = 5L),
      "complete", "mb_ngrams")
    assert(batches >= 4)
    val out = got.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exactly the shared sentence's 5 trigrams, each counted over all
    // 4 micro-batches (40 even docs); every unique gram filtered out
    assert(out == Map(
      "spark makes big" -> 40L, "makes big data" -> 40L,
      "big data simple" -> 40L, "data simple for" -> 40L,
      "simple for all" -> 40L))
  }

  test("streaming count-min sketch merges to the batch sketch across " +
      "micro-batches") {
    val stream = StreamQueries.docStream(spark, docsDir,
      Map("maxFilesPerTrigger" -> "1"))
    val (got, batches) = run(
      graft.functions.CountMin.sketch(stream, d = 4, w = 256),
      "complete", "mb_cms")
    assert(batches >= 4)
    val expected = graft.functions.CountMin
      .sketch(spark.read.parquet(s"$docsDir/documents.parquet"),
        d = 4, w = 256)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val out = got.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // counter sums are order-independent, so the multi-batch stream
    // state must equal the batch sketch EXACTLY, counter for counter
    assert(out == expected)
    // bounded-state contract: never more than d*w counter rows
    assert(out.size <= 4 * 256)
  }

  test("streaming Misra-Gries heavy hitters: multi-batch candidate " +
      "build recounts to the exact batch answer at 10-counter state") {
    import org.apache.spark.sql.functions._
    import graft.text.TextAnalysis
    // k = 10 against a 125-gram vocabulary forces REAL decrement/merge
    // traffic in the MG buffer (unlike the driver entry's k = 20000,
    // which at testdata scale never evicts) — the candidate SET after
    // 4 interleaved micro-batches is merge-order-dependent at the
    // margins, but the recount gate must still land on the exact
    // HAVING answer: the 5 shared trigrams, count 40 each
    // (N = 320 grams, threshold 1/10 → cnt ≥ 32; MG at k = 10
    // guarantees presence above N/(k+1) = 29.1)
    val stream = StreamQueries.docStream(spark, docsDir,
      Map("maxFilesPerTrigger" -> "1"))
    def grams(df: DataFrame): DataFrame = df.select(
      explode(TextAnalysis.ngramsCol(
        TextAnalysis.tokens(col("text")), 3)).as("gram"))
    val (cands, batches) = run(
      grams(stream).agg(graft.functions.MisraGries
        .misra_gries(col("gram"), 10).as("cands")),
      "complete", "mb_mg")
    assert(batches >= 4)
    val candG = cands.select(explode(col("cands")).as("gram"))
    // bounded-state contract: the ENTIRE stream state was ≤ k counters
    assert(candG.count() <= 10)
    val batchDocs = spark.read.parquet(s"$docsDir/documents.parquet")
    val got = TextAnalysis.heavyHitterRecount(
      grams(batchDocs), candG, 1L, 10L)
    // equals the all-batch composition AND the known exact answer
    val expected = TextAnalysis.guaranteedHeavyHitters(batchDocs,
      n = 3, fracNum = 1L, fracDen = 10L, k = 10)
    assert(rowSet(got) == rowSet(expected))
    val m = got.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("spark makes big" -> 40L, "makes big data" -> 40L,
      "big data simple" -> 40L, "data simple for" -> 40L,
      "simple for all" -> 40L))
  }
}
