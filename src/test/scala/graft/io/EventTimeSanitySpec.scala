package graft.io

import graft.streaming.StreamQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Unit-sanity guard for decoded event-time (VERDICT r7 #2): the events
  * testdata generator writes timestamps inside a documented epoch window
  * (2024, per TESTDATA.md; we allow [2000, 2100) to stay generator-
  * agnostic). A timestamp-unit mixup — nanos decoded as micros or vice
  * versa — shifts every event-time by 1000×, far outside that window, so
  * these assertions turn a silent 1000× corruption into a red spec. Both
  * loaders (batch catalog, file-stream source) are pinned, on BOTH
  * physical layouts: whatever the current testdata ships, plus a
  * synthesized copy of the other layout.
  */
class EventTimeSanitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Tables.configure(
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"
  private val lo = Timestamp.valueOf("2000-01-01 00:00:00")
  private val hi = Timestamp.valueOf("2100-01-01 00:00:00")

  private def assertSaneRange(minTs: Timestamp, maxTs: Timestamp, who: String): Unit = {
    assert(minTs.after(lo) && maxTs.before(hi),
      s"$who decoded event-time [$minTs, $maxTs] outside sane epoch window — unit mixup?")
  }

  test("batch loader decodes events.ts into the generator's epoch window") {
    val ev = Tables.load(spark, sfDir, "events")
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.schema("ts_ns").dataType == LongType)
    val r = ev.agg(min("ts"), max("ts"), min("ts_ns"), max("ts_ns")).collect()(0)
    assertSaneRange(r.getTimestamp(0), r.getTimestamp(1), "Tables.load")
    // ts_ns carries the same instants at nano precision
    assert(r.getLong(2) / 1000L == r.getTimestamp(0).toInstant.toEpochMilli * 1000L
      + r.getTimestamp(0).toInstant.getNano / 1000 % 1000)
  }

  test("stream loader decodes events.ts into the generator's epoch window") {
    val ev = StreamQueries.eventStream(spark, sfDir)
    assert(ev.schema("tsu").dataType == TimestampType)
    assert(ev.schema("ts").dataType == LongType)
    val sink = StreamQueries.runToCompletion(
      ev.agg(min("tsu").as("lo"), max("tsu").as("hi"),
        min("ts").as("lons"), max("ts").as("hins")), "complete")
    val r = sink.collect()(0)
    assertSaneRange(r.getTimestamp(0), r.getTimestamp(1), "eventStream")
    // integer ts contract: nanos-since-epoch, consistent with tsu
    assert(r.getLong(2) == r.getTimestamp(0).toInstant.toEpochMilli * 1000000L
      + r.getTimestamp(0).toInstant.getNano % 1000000)
  }

  test("batch and stream loaders agree row-for-row on decoded event-time") {
    val batch = Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "ts_ns")
    val stream = StreamQueries.runToCompletion(
      StreamQueries.eventStream(spark, sfDir)
        .groupBy("event_id").agg(max("tsu").as("ts"), max("ts").as("ts_ns")),
      "complete")
    assert(batch.join(stream, Seq("event_id", "ts", "ts_ns")).count()
      == batch.count())
  }

  test("both loaders accept the legacy nanos-as-long layout unchanged") {
    // synthesize a long-typed events table (the pre-regen physical layout)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_nanos_events").toFile
    dir.deleteOnExit()
    val base = 1704067200L * 1000000000L // 2024-01-01T00:00Z in ns
    (0 until 50).map(i => (i.toLong, base + i * 1000000000L, i.toLong % 5,
        "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.load(spark, dir.toString, "events")
    val r = ev.agg(min("ts"), max("ts")).collect()(0)
    assertSaneRange(r.getTimestamp(0), r.getTimestamp(1), "Tables.load[nanos]")
    val st = StreamQueries.runToCompletion(
      StreamQueries.eventStream(spark, dir.toString)
        .agg(min("tsu"), max("tsu")), "complete").collect()(0)
    assertSaneRange(st.getTimestamp(0), st.getTimestamp(1), "eventStream[nanos]")
  }

  test("documents/embeddings loaders widen drifted integer/float types") {
    // the next drift class after events.ts: an upstream writer switching
    // id width (int32) or embedding precision (double[]) must normalize
    // to the canonical schema instead of breaking 100+ corpus queries
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toFile
    dir.deleteOnExit()
    Seq((1, "a b", "en", "src1", 3), (2, "c d", "en", "src2", 3))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .selectExpr("CAST(doc_id AS INT) doc_id", "text", "lang", "source",
        "CAST(n_chars AS INT) n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((1, Seq(1.0, 2.0), 0), (2, Seq(3.0, 4.0), 1))
      .toDF("vec_id", "embedding", "label")
      .selectExpr("CAST(vec_id AS INT) vec_id",
        "CAST(embedding AS ARRAY<DOUBLE>) embedding",
        "CAST(label AS SMALLINT) label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val docs = Tables.load(spark, dir.toString, "documents")
    assert(docs.schema("doc_id").dataType == LongType)
    assert(docs.schema("n_chars").dataType == LongType)
    val embs = Tables.load(spark, dir.toString, "embeddings")
    assert(embs.schema("vec_id").dataType == LongType)
    assert(embs.schema("label").dataType == IntegerType)
    assert(embs.schema("embedding").dataType == ArrayType(FloatType))
    // a representative corpus op still runs end-to-end on drifted input
    assert(graft.dedup.Dedup.exactDedup(docs).count() == 2)
    assert(graft.sim.Similarity.normAudit(embs).count() == 2)
  }

  test("column pruning pushes through the normalize Project") {
    // the canonicalizing casts must not block scan-level pruning: a
    // 2-column projection over the 5-column documents table reads 2
    val df = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source")
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.forall(_.requiredSchema.fieldNames.toSet
      == Set("doc_id", "source")),
      scans.map(_.requiredSchema.fieldNames.mkString(",")).mkString(" | "))
  }

  test("eventStream refuses a layout that decodes outside the epoch window") {
    // millis-since-epoch longs: the nanos decode lands them in 1970,
    // which the construction-time probe must reject loudly
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bad_events").toFile
    dir.deleteOnExit()
    (0 until 10).map(i => (i.toLong, 1704067200000L + i, i.toLong % 5,
        "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] {
      StreamQueries.eventStream(spark, dir.toString)
    }
    assert(e.getMessage.contains("unit mismatch"))
  }
}
