package graft.streaming

import graft.QueryRegistry
import graft.io.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import java.util.concurrent.atomic.AtomicInteger

/** Oracle-checked Structured Streaming entries (SURVEY §2.10).
  *
  * Each query REPLAYS the `events` table through a parquet file stream
  * with `Trigger.AvailableNow`, runs a streaming operator to
  * completion into a memory sink, and returns the sink table — so the
  * driver hash-matches STREAMING results against the DuckDB oracle,
  * not just batch twins. The reference is strictly batch
  * (`calculations/routes.py:22-33`); these prove the streaming path
  * computes the identical answer it would produce as a batch plan.
  *
  * Determinism notes (what makes streaming hash-matchable):
  *   - complete-mode aggregations hold all state, so the final sink
  *     table equals the batch aggregation regardless of how the file
  *     source slices micro-batches;
  *   - append-mode dedup/joins emit each row/match exactly once, so
  *     the final table is batch-equal AS A SET (the driver sorts);
  *   - watermarks use a delay far longer than the data span, so no
  *     row is ever late-dropped and no state is evicted mid-replay.
  *     (Bounded-state variants — 0-delay watermarks,
  *     dropDuplicatesWithinWatermark — are exercised in
  *     StreamingSpec; they intentionally trade tail completeness for
  *     bounded state, which can't hash-match a batch oracle.)
  */
object StreamQueries extends QueryRegistry {

  /** File-source stream over the events table with a µs event-time
    * column `tsu` (TimestampType) and `ts` as nanos-since-epoch BIGINT.
    *
    * SCHEMA-ADAPTIVE: the file stream source needs a user schema, so we
    * take it from a one-off batch read of the same file (schema-only, no
    * data scan) instead of a hard-coded DDL string — upstream generators
    * have shipped `ts` both as TIMESTAMP(NANOS)-read-as-long and as
    * native TIMESTAMP(MICROS)/NTZ, and a hard-coded BIGINT schema
    * silently mis-decodes the latter by 1000×. Decoding dispatches on the
    * observed type, mirroring [[graft.io.Tables.normalizeEvents]].
    */
  def eventStream(spark: SparkSession, dir: String,
      extraOptions: Map[String, String] = Map.empty): DataFrame = {
    Tables.requiredConfs.foreach { case (k, v) =>
      if (!spark.conf.getOption(k).contains(v)) spark.conf.set(k, v)
    }
    val batchTwin = spark.read.parquet(Tables.path(dir, "events"))
    val fileSchema = batchTwin.schema
    // Unit-sanity guard: a timestamp-unit mixup (ns read as µs, µs read
    // as ns) shifts every decoded event-time by 1000× — silently wrong
    // windows, the worst failure class. Probe ONE row through the same
    // decode and require it to land in a plausible epoch window, so a
    // unit bug fails loudly at stream construction instead of shipping.
    decodeEventTime(batchTwin.limit(1), fileSchema("ts").dataType)
      .select(col("tsu")).collect().foreach { r =>
        val t = r.getTimestamp(0).toInstant
        require(t.isAfter(java.time.Instant.parse("2000-01-01T00:00:00Z")) &&
          t.isBefore(java.time.Instant.parse("2100-01-01T00:00:00Z")),
          s"decoded event-time $t outside sane epoch window — timestamp-unit mismatch?")
      }
    val raw = spark.readStream.schema(fileSchema)
      .options(extraOptions)
      // events.parquet is a single FILE. For a non-glob path the file
      // stream source force-sets basePath to the path itself, which
      // then fails 'basePath must be a directory'; a glob path skips
      // that override, and the anchored basePath (the scale-factor
      // dir, no key=value components below it) keeps partition
      // inference empty.
      .option("basePath", dir)
      .parquet(dir + "/events.[p]arquet")
    decodeEventTime(raw, fileSchema("ts").dataType)
  }

  /** Append `tsu` (µs TimestampType event-time) to an events(-schema)
    * frame and normalize `ts` to nanos-since-epoch BIGINT, dispatching on
    * the observed `ts` type — the streaming mirror of
    * [[graft.io.Tables.normalizeEvents]], shared between the live stream
    * and the construction-time sanity probe.
    */
  private def decodeEventTime(raw: DataFrame,
      tsType: org.apache.spark.sql.types.DataType): DataFrame =
    tsType match {
      case LongType => // legacy nanos-as-long layout
        // integer `div`: epoch nanos exceed double's 53-bit mantissa
        raw.withColumn("tsu", timestamp_micros(expr("ts div 1000")))
      case TimestampType | TimestampNTZType =>
        raw
          .withColumn("tsu", col("ts").cast(TimestampType))
          // keep `ts` as nanos BIGINT — downstream transforms and specs
          // rely on the integer event-time contract
          .withColumn("ts", expr("unix_micros(tsu) * 1000"))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected BIGINT (nanos) or TIMESTAMP")
    }

  private val sinkId = new AtomicInteger(0)

  /** Run a streaming frame to completion (AvailableNow) into a memory
    * sink and return the sink table. Memory sinks need no durable
    * checkpoint; AvailableNow processes every available input slice,
    * runs the final watermark-advancing batch, then stops.
    */
  def runToCompletion(df: DataFrame, mode: String): DataFrame = {
    val name = s"graft_stream_sink_${sinkId.incrementAndGet()}"
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }

  /** Tumbling hourly counters per event type — the streaming twin of
    * the A4/window stats block, complete mode. Doubles are scaled to
    * exact integers PER ROW before the sum, so the aggregate is
    * order-independent across micro-batch boundaries and engines.
    */
  q("st_hourly_counts",
    """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS hour_start,
      |       event_type,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS value_u
      |FROM events GROUP BY 1, 2""") { (s, d) =>
    runToCompletion(hourlyCounts(eventStream(s, d)), "complete")
  }

  /** The st_hourly_counts transform over any events(-shaped) stream. */
  def hourlyCounts(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("tsu"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)")).as("value_u"))
      .select(unix_timestamp(col("window.start")).as("hour_start"),
        col("event_type"), col("n"), col("value_u"))

  /** Streaming gap sessionization via the merging `session_window`
    * operator, complete mode — the streaming twin of
    * `la_session_window` (same second-floored timestamps, same
    * INCLUSIVE 30-minute gap; the lag-based oracle therefore opens a
    * new session only on a strictly-greater gap).
    */
  q("st_session_window",
    """WITH flags AS (
      |  SELECT user_id, event_id,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |              OR CAST(floor(epoch(ts)) AS BIGINT) -
      |                 CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, sec,
      |         sum(new_session) OVER (PARTITION BY user_id
      |            ORDER BY sec, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flags)
      |SELECT CAST(user_id AS BIGINT) AS user_id,
      |       min(sec) AS session_start,
      |       CAST(count(*) AS BIGINT) AS n_events
      |FROM sessions GROUP BY user_id, sid""") { (s, d) =>
    runToCompletion(sessionWindows(eventStream(s, d)), "complete")
  }

  /** The st_session_window transform over any events(-shaped) stream. */
  def sessionWindows(ev: DataFrame): DataFrame =
    ev.withColumn("tsec", timestamp_seconds(expr("ts div 1000000000")))
      .groupBy(session_window(col("tsec"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("w.start")).as("session_start"), col("n_events"))

  /** Raw schema of documents.parquet (plain types — no nanos caveat). */
  private val docsDdl =
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

  /** File-source stream over the documents table (same single-file
    * glob trick as [[eventStream]]).
    */
  def docStream(spark: SparkSession, dir: String,
      extraOptions: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.schema(docsDdl)
      .options(extraOptions)
      .option("basePath", dir)
      .parquet(dir + "/documents.[p]arquet")

  /** File-source stream over the embeddings table. */
  def embStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
      .option("basePath", dir)
      .parquet(dir + "/embeddings.[p]arquet")

  /** Streaming epoch-aware dataset mixing — the streaming twin of
    * [[graft.pipeline.Sampling.epochMix]]: entirely map-local
    * (integer-exact md5 remainder threshold + sequence explode), so it
    * runs STATELESS in append mode — no watermark, no state store, the
    * replication decision is a pure function of each row. The batch
    * oracle hash-matches because map-only transforms are invariant to
    * micro-batch slicing.
    */
  q("st_epoch_mix",
    """WITH w AS (SELECT doc_id, source,
      |  CASE CAST(substr(source, 4) AS INT) % 4
      |    WHEN 0 THEN 4 WHEN 1 THEN 10 WHEN 2 THEN 17 ELSE 25 END AS wt,
      |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
      |    AS UBIGINT) AS u48
      |  FROM documents),
      |c AS (SELECT doc_id, source,
      |  wt // 10 + CASE WHEN CAST(u48 AS HUGEINT) * 10 <
      |    CAST(wt % 10 AS HUGEINT) * 281474976710656 THEN 1 ELSE 0 END
      |    AS n_copies
      |  FROM w)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
      |       CAST(n_copies AS INT) AS n_copies,
      |       CAST(unnest(generate_series(1, n_copies)) AS INT) AS copy
      |FROM c WHERE n_copies >= 1""") { (s, d) =>
    runToCompletion(
      graft.pipeline.Sampling.epochMix(docStream(s, d), "doc_id",
        "CASE CAST(substring(source, 4) AS INT) % 4 " +
          "WHEN 0 THEN 4 WHEN 1 THEN 10 WHEN 2 THEN 17 ELSE 25 END")
        .select(col("doc_id"), col("source"), col("n_copies"), col("copy")),
      "append")
  }

  /** Streaming gate-agreement kappa — the streaming twin of
    * `t_gate_kappa` (oracle shared via one SQL builder, so the two
    * cannot drift): both document gates are map-only column algebra
    * and the 2×2 cell counts are ONE aggregation level, so the whole
    * batch [[graft.text.TextAnalysis.gateKappa]] transform runs on
    * the stream unchanged in complete mode — the live "are my two
    * filters still agreeing" monitor an ingest pipeline keeps next to
    * its DQ gate. Complete-mode state is sources-sized (the 2×2
    * counts per source), invariant to micro-batch slicing because the
    * cell sums commute.
    */
  q("st_gate_kappa", graft.pipeline.TextQueries.gateKappaSql) {
    (s, d) =>
      runToCompletion(
        graft.text.TextAnalysis.gateKappa(docStream(s, d)), "complete")
  }

  /** Streaming minimum-detectable-effect monitor — the live "has this
    * experiment accrued enough sample yet" readout (complete mode;
    * oracle shared with `la_power_mde` via one SQL builder). The arm
    * sums are ONE aggregation level of exact DECIMAL partials —
    * commutative, so micro-batch slicing cannot change a bit — and
    * the MDE float chain is row-local on the types-sized state.
    */
  q("st_power_mde", graft.rel.LogAnalytics.powerMdeSql) { (s, d) =>
    runToCompletion(
      graft.rel.LogAnalytics.powerMde(eventStream(s, d)), "complete")
  }

  /** Streaming frequent n-grams (heavy hitters): complete-mode gram
    * counting with a support threshold — the streaming face of
    * [[graft.text.TextAnalysis.topKNgrams]]. A support FILTER stands in
    * for top-k because streaming Datasets support neither limit nor
    * non-time windows; the threshold gate is exact integers, and the
    * complete-mode state holds the full gram table regardless of
    * micro-batch slicing, so the sink equals the batch answer.
    */
  q("st_frequent_ngrams",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws
      |              FROM documents),
      |grams AS (
      |  SELECT ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
      |  FROM toks, unnest(generate_series(1, len(ws) - 2)) AS t(i)
      |  WHERE len(ws) >= 3)
      |SELECT gram, CAST(count(*) AS BIGINT) AS cnt
      |FROM grams GROUP BY gram HAVING count(*) >= 5""") { (s, d) =>
    runToCompletion(frequentNgrams(docStream(s, d), minSupport = 5L),
      "complete")
  }

  /** Streaming decontamination: the incoming doc stream probed
    * map-locally against a STATIC broadcast Bloom row built from the
    * held-out eval slice — stateless (no watermark, no state store),
    * append mode, exactly the shape a 100 TB ingest firehose needs.
    * Same oracle semantics as the batch `dd_bloom_decontam` minus the
    * per-bit count column (the probe is a forall, not an aggregate).
    */
  q("st_bloom_decontam",
    """WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
      |                  doc_id % 100 < 10 AS is_eval FROM documents),
      |n AS (SELECT greatest(64, 5 * count(*)) AS m FROM t WHERE is_eval),
      |b AS (SELECT doc_id, is_eval, md5(text) AS th,
      |             CAST(CAST(('0x' || substr(md5(concat(CAST(i AS VARCHAR),
      |                  ':', text)), 1, 8)) AS UBIGINT) % m AS BIGINT)
      |               AS bit
      |      FROM t, n, unnest([0, 1, 2]) AS u(i)),
      |bloom AS (SELECT DISTINCT bit FROM b WHERE is_eval),
      |ev AS (SELECT DISTINCT md5(text) AS th FROM t WHERE is_eval),
      |hits AS (SELECT doc_id, th FROM b JOIN bloom USING (bit)
      |         WHERE NOT is_eval GROUP BY doc_id, th HAVING count(*) = 3)
      |SELECT h.doc_id,
      |       CAST(CASE WHEN e.th IS NOT NULL THEN 1 ELSE 0 END AS INT)
      |         AS exact
      |FROM hits h LEFT JOIN ev e USING (th)""") { (s, d) =>
    val evalDocs = graft.io.Tables.load(s, d, "documents")
      .filter(col("doc_id") % 100 < 10)
    val bloomRow = graft.dedup.Dedup.bloomBroadcastRow(evalDocs,
      bitsPerKey = 5, j = 3)
    runToCompletion(
      graft.dedup.Dedup.bloomProbe(
        docStream(s, d).filter(!(col("doc_id") % 100 < 10)),
        bloomRow, j = 3),
      "append")
  }

  /** The st_frequent_ngrams transform over any documents(-shaped)
    * stream.
    */
  def frequentNgrams(docs: DataFrame, minSupport: Long): DataFrame =
    docs.select(explode(graft.text.TextAnalysis.ngramsCol(
        graft.text.TextAnalysis.tokens(col("text")), 3)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minSupport)

  /** Streaming count-min sketch — the BOUNDED-state answer to
    * [[frequentNgrams]]'s honest scaling limit: st_frequent_ngrams's
    * complete-mode state is the full gram vocabulary (grows with the
    * corpus), while here the sketch IS the stream state — d×w = 1024
    * counter rows whatever the corpus size. One aggregation, so it
    * streams; counters are order-independent sums, so micro-batch
    * boundaries can't change the result and the batch oracle replays
    * it exactly. Point estimates stay a batch-side probe against this
    * table ([[graft.functions.CountMin.estimates]] / `t_countmin`) —
    * the probe's second aggregation doesn't stream, the build does.
    */
  q("st_countmin_sketch",
    graft.functions.CountMin.sketchOracleSql(d = 4, w = 256)) { (s, d) =>
    runToCompletion(
      graft.functions.CountMin.sketch(docStream(s, d), d = 4, w = 256),
      "complete")
  }

  /** Streaming GUARANTEED heavy hitters — the third leg of the
    * frequency routing rule (SCALE.md), now fully executable in the
    * streaming layer: exact gram counts (`st_frequent_ngrams`) when
    * the vocabulary fits complete-mode state, the count-min sketch
    * (`st_countmin_sketch`) for point estimates on the firehose, and
    * THIS — Misra–Gries as the ENTIRE stream state (k = 20,000
    * counters whatever the vocabulary or corpus size) when the
    * deliverable is the guaranteed-above-threshold item set. One
    * global [[graft.functions.MisraGriesAgg]] in complete mode is the
    * streaming build (a single stateful aggregation, so it streams;
    * the `TypedImperativeAggregate` buffer serializes into the state
    * store exactly as `st_byte_triage`'s does); the exact recount of
    * the ≤k candidates is a batch-side probe
    * ([[graft.text.TextAnalysis.heavyHitterRecount]] — the
    * `st_countmin_sketch` build/probe split). The MG candidate SET
    * varies with micro-batch slicing at the non-heavy margins, but
    * every item of frequency > N/(k+1) is present under ANY merge
    * order, so the recount output equals the exact HAVING answer and
    * the batch twin's oracle (`t_heavy_hitters`) transfers VERBATIM.
    */
  q("st_heavy_hitters",
    graft.pipeline.TextQueries.heavyHittersOracleSql) { (s, d) =>
    import graft.text.TextAnalysis
    TextAnalysis.requireMgGuarantee(20000, 3L, 59582L)
    def grams(df: DataFrame): DataFrame = df.select(
      explode(TextAnalysis.ngramsCol(
        TextAnalysis.tokens(col("text")), 3)).as("gram"))
    val cands = runToCompletion(
      grams(docStream(s, d))
        .agg(graft.functions.MisraGries.misra_gries(col("gram"), 20000)
          .as("cands")),
      "complete")
      .select(explode(col("cands")).as("gram"))
    TextAnalysis.heavyHitterRecount(
      grams(Tables.load(s, d, "documents")), cands, 3L, 59582L)
  }

  /** Streaming INCREMENTAL ingest dedup — the streaming twin of
    * [[graft.dedup.Dedup.incrementalDedup]]: the incoming doc stream is
    * anti-joined against the STATIC standing-corpus digest table
    * (stream-static left_anti — re-read/broadcast per micro-batch, no
    * state store for the corpus side), then streaming dropDuplicates
    * keeps each surviving digest's first occurrence. Emitted at
    * digest grain because that is the set-deterministic surface: WHICH
    * doc of an intra-batch duplicate family arrives first depends on
    * micro-batch slicing, but the distinct digest set does not — and
    * md5 is replayable in DuckDB, so the streaming run hash-matches
    * the batch oracle exactly.
    */
  q("st_incremental_dedup",
    """SELECT DISTINCT md5(text) AS digest
      |FROM documents
      |WHERE doc_id % 10 >= 8 AND text NOT IN
      |  (SELECT text FROM documents WHERE doc_id % 10 < 8)""") { (s, d) =>
    val corp = Tables.load(s, d, "documents")
      .filter(col("doc_id") % 10 < 8)
      .select(md5(col("text")).as("cd")).distinct()
    runToCompletion(
      docStream(s, d).filter(col("doc_id") % 10 >= 8)
        .withColumn("digest", md5(col("text")))
        .join(corp, col("digest") === col("cd"), "left_anti")
        .select("digest")
        .dropDuplicates("digest"),
      "append")
  }

  /** Streaming byte-triage ingest gate (r13) — the pre-decode payload
    * gate run ON the live ingest stream instead of post-hoc: per doc,
    * the full histogram summary ([[graft.multimodal.Multimodal]]
    * semantics) via ONE [[graft.functions.ByteTriageAgg]] in complete
    * mode. This twin is only EXPRESSIBLE because the bounded-state
    * aggregate exists: the batch explode form is two chained
    * aggregations ((doc, byte) count, then the doc rollup), which
    * Structured Streaming rejects — the 256-slot aggregate collapses
    * them into one stateful operator whose per-doc state is the
    * histogram buffer. Shares the batch pair's DuckDB oracle VERBATIM
    * (one truth, three consumers: explode, aggregate, stream).
    * Chunked payloads would arrive as multiple rows per doc and fold
    * into the same buffer — the update/merge path the frame-equality
    * spec pins.
    */
  q("st_byte_triage",
    graft.pipeline.MediaSourceQueries.byteTriageOracleSql) { (s, d) =>
    runToCompletion(
      graft.multimodal.Multimodal.byteTriageSummary(
        docStream(s, d).select(col("doc_id"), col("text").as("t"))),
      "complete")
  }

  /** Streaming NEAR-dup gate — the streaming twin of
    * [[graft.dedup.Dedup.incrementalNearDup]]'s corpus arm: incoming
    * docs sign map-side (stateless UDF), their band keys join the
    * STATIC corpus band table (stream-static equi join; the corpus
    * side is the standing signature index, capped at 64 per bucket —
    * the skew guard that matters, since the corpus is the big side),
    * and survivors verify on the signature-agreement estimate before
    * the flagged doc_id emits once via dropDuplicates. Batch-internal
    * near-dups are inherently stateful (bucket populations across the
    * whole stream) and stay on the batch API — this is the
    * decontamination-gate shape (`st_bloom_decontam` precedent).
    */
  q("st_incremental_neardup", {
    val ps = graft.dedup.Dedup.minhashParams(32, 42L)
    val M = "CAST('18446744073709551616' AS HUGEINT)"
    val H = "CAST('9223372036854775808' AS HUGEINT)"
    val P = "CAST('1099511628211' AS HUGEINT)"
    val B = "CAST('14695981039346656037' AS HUGEINT)"
    val aL = ps.map(p => s"CAST('${p._1}' AS HUGEINT)")
      .mkString("[", ", ", "]")
    val bL = ps.map(p => s"CAST('${p._2}' AS HUGEINT)")
      .mkString("[", ", ", "]")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |sh AS (
       |  SELECT doc_id, array_to_string(l[i:i+2], ' ') AS s
       |  FROM toks, unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
       |shh AS (
       |  SELECT doc_id,
       |    list_reduce(
       |      list_prepend($B,
       |        list_transform(range(1, length(s) + 1),
       |          i -> CAST(ord(substr(s, CAST(i AS INT), 1)) AS HUGEINT))),
       |      (acc, ch) -> ((acc - (acc % 256) +
       |          CAST(xor(CAST(acc % 256 AS BIGINT), CAST(ch AS BIGINT)) AS HUGEINT))
       |          * $P) % $M) AS x
       |  FROM sh),
       |uh AS (
       |  SELECT doc_id, f,
       |         ((((${aL}[f + 1] * (x // 4294967296)) % 4294967296) * 4294967296
       |            + ${aL}[f + 1] * (x % 4294967296))
       |           + ${bL}[f + 1]) % $M AS u
       |  FROM shh, unnest(generate_series(0, 31)) AS g(f)),
       |sig AS (
       |  SELECT doc_id, f,
       |         min(CAST(CASE WHEN u >= $H THEN u - $M ELSE u END AS BIGINT)) AS mh
       |  FROM uh GROUP BY doc_id, f),
       |sigl AS (SELECT doc_id, list(mh ORDER BY f) AS sig FROM sig GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, band,
       |    list_reduce(
       |      list_prepend($B,
       |        list_transform(sig[band * 4 + 1 : band * 4 + 4],
       |          s -> (CASE WHEN s < 0 THEN CAST(s AS HUGEINT) + $M
       |                ELSE CAST(s AS HUGEINT) END))),
       |      (acc, v) -> (((
       |          CAST(xor(CAST(acc // 4294967296 AS BIGINT), CAST(v // 4294967296 AS BIGINT)) AS HUGEINT) * 4294967296
       |          + CAST(xor(CAST(acc % 4294967296 AS BIGINT), CAST(v % 4294967296 AS BIGINT)) AS HUGEINT))
       |        * $P) % $M)) AS bucket
       |  FROM sigl, unnest(generate_series(0, 7)) AS g(band)),
       |cband AS (SELECT * FROM banded WHERE doc_id % 10 < 8),
       |iband AS (SELECT * FROM banded WHERE doc_id % 10 >= 8),
       |okc AS (SELECT band, bucket FROM cband GROUP BY 1, 2
       |        HAVING count(*) <= 64),
       |cand AS (
       |  SELECT DISTINCT i.doc_id, c.doc_id AS corpus_id
       |  FROM iband i
       |  JOIN okc ON okc.band = i.band AND okc.bucket = i.bucket
       |  JOIN cband c ON c.band = i.band AND c.bucket = i.bucket)
       |SELECT DISTINCT CAST(cc.doc_id AS BIGINT) AS doc_id
       |FROM cand cc
       |JOIN sigl si ON si.doc_id = cc.doc_id
       |JOIN sigl sm ON sm.doc_id = cc.corpus_id
       |WHERE len(list_filter(range(1, 33),
       |      f -> si.sig[CAST(f AS INT)] = sm.sig[CAST(f AS INT)]))
       |      / 32.0 >= 0.5""".stripMargin
  }) { (s, d) =>
    import graft.dedup.Dedup
    val corpSigs = Dedup.signatures(
      Tables.load(s, d, "documents").filter(col("doc_id") % 10 < 8))
    val cBands = Dedup.bandTable(corpSigs)
    val cOk = cBands.join(
      cBands.groupBy("band", "bucket").agg(count(lit(1)).as("__n"))
        .filter(col("__n") <= 64).select("band", "bucket"),
      Seq("band", "bucket"))
      .withColumnRenamed("doc_id", "corpus_id")
    val inc = Dedup.bandTable(
      Dedup.signatures(docStream(s, d).filter(col("doc_id") % 10 >= 8)),
      keepSig = true)
    runToCompletion(
      inc.join(cOk, Seq("band", "bucket"))
        .join(corpSigs.select(col("doc_id").as("corpus_id"),
          col("sig").as("sc")), "corpus_id")
        .filter(aggregate(zip_with(col("sig"), col("sc"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / 32 >= 0.5)
        .select("doc_id")
        .dropDuplicates("doc_id"),
      "append")
  }

  /** Streaming exact dedup (append mode): each (user, type) pair emits
    * exactly once, on first sight — the final sink table is the
    * distinct set whatever the micro-batch slicing.
    */
  q("st_distinct_pairs",
    """SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id, event_type
      |FROM events""") { (s, d) =>
    runToCompletion(distinctPairs(eventStream(s, d)), "append")
  }

  /** The st_distinct_pairs transform over any events(-shaped) stream. */
  def distinctPairs(ev: DataFrame): DataFrame =
    ev.select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")

  /** Streaming DSIR gate — the streaming twin of
    * [[graft.text.TextAnalysis.dsirWeights]]: the µ-nat LLR model fits
    * batch-side (bucket-bounded, here 1024 entries), COLLECTS into the
    * task closure, and every incoming document scores with a map-only
    * integer fold — zero joins, zero state, append mode with no
    * watermark (the st_epoch_mix stateless contract). This is the
    * deploy shape for importance-weighted ingest at 100 TB/day: the
    * model is megabytes however large the corpus, so the scoring
    * stream scales with input alone.
    */
  q("st_dsir_gate",
    """WITH tok AS (SELECT doc_id, source,
      |    CAST(('0x' || substr(md5(t.tok), 1, 12)) AS UBIGINT) % 1024 AS feat
      |  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
      |        FROM documents WHERE text IS NOT NULL) t),
      |fc AS (SELECT feat,
      |    CAST(sum(CASE WHEN source IN ('src0','src1','src2','src3')
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS ct,
      |    CAST(sum(CASE WHEN source IN ('src0','src1','src2','src3')
      |                  THEN 0 ELSE 1 END) AS BIGINT) AS cr
      |  FROM tok GROUP BY feat),
      |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt,
      |               CAST(sum(cr) AS BIGINT) AS nr,
      |               CAST(count(*) AS BIGINT) AS v FROM fc),
      |llr AS (SELECT feat,
      |    CAST(round(ln((CAST(ct + 1 AS DOUBLE) * CAST(nr + v AS DOUBLE)) /
      |      (CAST(cr + 1 AS DOUBLE) * CAST(nt + v AS DOUBLE))) * 1000000)
      |      AS BIGINT) AS llr_u
      |  FROM fc CROSS JOIN tot)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |       CAST(sum(llr_u) AS BIGINT) AS logw_u,
      |       CAST(CASE WHEN sum(llr_u) >= 0 THEN 1 ELSE 0 END AS INT) AS keep
      |FROM tok JOIN llr USING (feat)
      |GROUP BY doc_id""") { (s, d) =>
    import graft.text.TextAnalysis
    val model = TextAnalysis.dsirModel(Tables.load(s, d, "documents"),
      targetSources = Seq("src0", "src1", "src2", "src3"),
      hashBuckets = 1024)
    val (nTok, logw) = TextAnalysis.dsirScore(model, 1024, col("text"))
    runToCompletion(
      docStream(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), nTok.as("n_tokens"), logw.as("logw_u"))
        .withColumn("keep", (col("logw_u") >= 0).cast("int")),
      "append")
  }

  /** Watermarked stream-stream interval join: attribute each purchase
    * to every click by the same user within the preceding hour. Both
    * sides carry event-time watermarks and the condition bounds event
    * time, so state eviction is provable at a real delay; the replay
    * uses a delay longer than the data span so the match set is exactly
    * the batch join. Both engines compare INTEGER microseconds, so the
    * ns→µs truncation can't move a boundary on one side only.
    */
  q("st_click_attribution",
    """WITH c AS (
      |  SELECT user_id, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS c_us,
      |         event_id AS click_id
      |  FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS p_us,
      |         event_id AS purchase_id,
      |         CAST(floor(value * 10000 + 0.5) AS BIGINT) AS value_u
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.purchase_id, c.click_id, CAST(p.user_id AS BIGINT) AS user_id,
      |       c.c_us, p.p_us, p.value_u
      |FROM p JOIN c ON c.user_id = p.user_id
      |WHERE p.p_us >= c.c_us AND p.p_us <= c.c_us + 3600000000""") { (s, d) =>
    runToCompletion(clickAttribution(eventStream(s, d)), "append")
  }

  /** Stream-static enrichment join: each streamed event is joined to
    * the STATIC customer dimension (re-read/broadcast per micro-batch —
    * Spark's canonical enrichment pattern; no watermark needed on the
    * static side, no state store involved), then aggregated per
    * (market segment, event type) in complete mode. Proves the
    * stream-static path computes the identical answer to the batch
    * join whatever the micro-batch slicing.
    */
  q("st_static_enrich",
    """SELECT c.c_mktsegment, e.event_type,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(floor(e.value * 10000 + 0.5) AS BIGINT))
      |            AS BIGINT) AS value_u
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1, 2""") { (s, d) =>
    runToCompletion(
      staticEnrich(eventStream(s, d), Tables.load(s, d, "customer")),
      "complete")
  }

  /** The st_static_enrich transform: stream joined to a static
    * dimension frame, then a complete-mode aggregation (sum over
    * scaled integers — streaming forbids exact distinct aggregates,
    * and integer sums are order-insensitive, so the result
    * hash-matches batch).
    */
  def staticEnrich(ev: DataFrame, dim: DataFrame): DataFrame =
    ev.join(dim.select(col("c_custkey"), col("c_mktsegment")),
        ev("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)"))
          .as("value_u"))

  /** Streaming data-quality monitor (complete mode): four of
    * `dq_constraints`' five rules as one wide streaming aggregate —
    * null id, value range, ts window, type domain. The uniqueness rule
    * needs an exact distinct, which streaming aggregation forbids, so
    * it stays batch-only (`dq_constraints`); everything here is a
    * conditional integer sum — order-insensitive across micro-batches,
    * so the final table hash-matches the batch audit.
    */
  q("st_dq_monitor",
    """SELECT
      |  CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)
      |       AS BIGINT) AS v_id_null,
      |  CAST(sum(CASE WHEN value < 0 OR value > 10000 THEN 1 ELSE 0 END)
      |       AS BIGINT) AS v_value_range,
      |  CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-01'
      |            OR ts >= TIMESTAMP '2025-01-01' THEN 1 ELSE 0 END)
      |       AS BIGINT) AS v_ts_window,
      |  CAST(sum(CASE WHEN event_type NOT IN
      |            ('click','view','purchase','signup','error')
      |            THEN 1 ELSE 0 END) AS BIGINT) AS v_type_domain,
      |  CAST(count(*) AS BIGINT) AS n_rows
      |FROM events""") { (s, d) =>
    runToCompletion(dqMonitor(eventStream(s, d)), "complete")
  }

  /** Streaming k-anonymity monitor — the streaming twin of
    * `dq_k_anon` (oracle shared via `LogAnalytics.kAnonSql`, per-type
    * rollup shared via `LogAnalytics.kAnonRollup`, so the three
    * readouts cannot drift): the quasi-identifier class counts run as
    * ONE complete-mode streaming aggregation whose state is bounded by
    * the QI domain (|types|·24·|value buckets| rows — CONSTANT, never
    * the corpus) and invariant to micro-batch slicing because counts
    * commute; the per-type k-min rollup is a batch post-pass over the
    * class-sized sink (the embed-drift snapshot pattern — the
    * memory-sink view cannot feed a second aggregation level inside
    * the stream, and streaming forbids chained aggregations anyway).
    * The live "did a release slip below k=5" gate a privacy review
    * keeps next to its DQ monitors.
    */
  q("st_k_anon", graft.rel.LogAnalytics.kAnonSql) { (s, d) =>
    val qi = eventStream(s, d).select(col("event_type"),
      hour(col("tsu")).as("hr"),
      floor(col("value") / 1000).cast("long").as("vb"))
    val sink = runToCompletion(
      qi.groupBy("event_type", "hr", "vb").agg(count(lit(1)).as("k")),
      "complete")
    // QI-domain-bounded snapshot (the embed-drift contract): rebuild a
    // plain frame so the post-pass can aggregate it
    import s.implicits._
    val snap = sink.collect().toSeq
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toDF("event_type", "hr", "vb", "k")
    graft.rel.LogAnalytics.kAnonRollup(snap)
  }

  /** The st_dq_monitor transform over any events(-shaped) stream. */
  def dqMonitor(ev: DataFrame): DataFrame =
    ev.agg(
      sum(when(col("event_id").isNull, 1L).otherwise(0L)).as("v_id_null"),
      sum(when(col("value") < 0 || col("value") > 10000, 1L)
        .otherwise(0L)).as("v_value_range"),
      sum(when(col("tsu") < lit("2024-01-01").cast("timestamp") ||
        col("tsu") >= lit("2025-01-01").cast("timestamp"), 1L)
        .otherwise(0L)).as("v_ts_window"),
      sum(when(!col("event_type").isInCollection(
        Seq("click", "view", "purchase", "signup", "error")), 1L)
        .otherwise(0L)).as("v_type_domain"),
      count(lit(1)).as("n_rows"))

  /** LEFT-OUTER stream-stream interval join: every error event, with
    * the click(s) from the same user in the preceding 30 minutes, or
    * NULLs when there were none (the "failure with no recent activity"
    * triage op). Outer stream-stream joins exercise the state-store
    * path the inner entries cannot: a null-extended row is emitted
    * only once the watermark proves no future match can arrive. The
    * replay keeps that deterministic with a 0-second watermark delay:
    * the single-file source feeds ALL rows in micro-batch 1 (the
    * join filter uses the PREVIOUS batch's watermark = -inf, so
    * nothing is late-dropped), then AvailableNow's final
    * watermark-advancing batch flushes the unmatched left rows.
    *
    * The oracle encodes the watermark rule itself (empirically
    * pinned): matched rows always emit; an UNMATCHED error emits its
    * null-extended row iff `e_us < least(max error ts, max click ts)`
    * — the global watermark is the min over both sides' maxima, and
    * eviction is strict, so the error(s) sitting exactly at the
    * stream's high-water mark stay open in state forever (no later
    * event can ever prove them unmatchable). That frontier row is
    * not a defect; it is what any unbounded run would hold pending.
    */
  q("st_outer_join",
    """WITH er AS (
      |  SELECT CAST(user_id AS BIGINT) AS user_id, event_id AS error_id,
      |         CAST(epoch_ns(ts) // 1000 AS BIGINT) AS e_us
      |  FROM events WHERE event_type = 'error'),
      |c AS (
      |  SELECT user_id, event_id AS click_id,
      |         CAST(epoch_ns(ts) // 1000 AS BIGINT) AS c_us
      |  FROM events WHERE event_type = 'click'),
      |wm AS (
      |  SELECT least((SELECT max(e_us) FROM er),
      |               (SELECT max(c_us) FROM c)) AS w)
      |SELECT er.error_id, c.click_id, er.user_id, er.e_us, c.c_us
      |FROM er LEFT JOIN c ON c.user_id = er.user_id
      |  AND c.c_us >= er.e_us - 1800000000 AND c.c_us <= er.e_us, wm
      |WHERE c.click_id IS NOT NULL OR er.e_us < wm.w""") {
    (s, d) =>
      runToCompletion(outerIntervalJoin(eventStream(s, d)), "append")
  }

  /** The st_outer_join transform: errors LEFT OUTER JOIN clicks on
    * (same user, click within the 30 min before the error). Both
    * sides branch off `ev` with 0-second watermarks — mandatory for
    * outer stream-stream joins (the watermark is what licenses the
    * null-extension), and safe here per the replay argument above.
    */
  def outerIntervalJoin(ev: DataFrame): DataFrame = {
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("tsu").as("e_ts"),
        col("event_id").as("error_id"))
      .withWatermark("e_ts", "0 seconds")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("tsu").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "0 seconds")
    errors.join(clicks, expr(
      """c_user = e_user AND
        |c_ts >= e_ts - interval 30 minutes AND
        |c_ts <= e_ts""".stripMargin), "left_outer")
      .select(col("error_id"), col("click_id"),
        col("e_user").as("user_id"),
        unix_micros(col("e_ts")).as("e_us"),
        unix_micros(col("c_ts")).as("c_us"))
  }

  /** Streaming PSI drift monitor: per-DAY Population Stability Index
    * of the value-bucket distribution against the full-corpus
    * reference — the live "is today's feed drifting from the serving
    * distribution" alarm (`t_psi_drift`'s streaming sibling; same
    * +1-smoothed µ-unit terms). The STREAM carries all corpus-sized
    * state as one complete-mode (day × 10-bucket) count — constant
    * state per day regardless of volume; the PSI combination is a
    * tiny batch post-pass over the sink table joined to the broadcast
    * reference histogram (streaming can't chain a second aggregation,
    * and shouldn't: the grid is days×10 rows). Buckets clamp value/1000
    * into [0,9] via floor-then-clamp so negative outliers land in
    * bucket 0 identically on both engines (Spark `div` truncates
    * toward zero where DuckDB `//` floors — the float `floor(x/1000)`
    * sidesteps that divergence).
    */
  q("st_psi_drift",
    """WITH b AS (
      |  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400
      |           AS day_start,
      |         least(greatest(CAST(floor(value / 1000) AS BIGINT), 0), 9)
      |           AS bucket
      |  FROM events),
      |w AS (SELECT day_start, bucket, CAST(count(*) AS BIGINT) AS c_w
      |      FROM b GROUP BY 1, 2),
      |ref AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c_ref
      |        FROM b GROUP BY 1),
      |tot AS (SELECT CAST(sum(c_ref) AS BIGINT) AS n_ref,
      |               CAST(count(*) AS BIGINT) AS k FROM ref),
      |days AS (SELECT DISTINCT day_start FROM b),
      |nw AS (SELECT day_start, CAST(sum(c_w) AS BIGINT) AS n_w
      |       FROM w GROUP BY 1),
      |g AS (SELECT d.day_start, r.bucket, coalesce(w.c_w, 0) AS c_w,
      |             r.c_ref, nw.n_w, n_ref, k
      |      FROM days d CROSS JOIN ref r
      |      LEFT JOIN w ON w.day_start = d.day_start AND w.bucket = r.bucket
      |      JOIN nw ON nw.day_start = d.day_start, tot),
      |t AS (SELECT day_start, bucket, c_w, c_ref,
      |        CAST(round((CAST(c_w + 1 AS DOUBLE) / CAST(n_w + k AS DOUBLE) -
      |            CAST(c_ref + 1 AS DOUBLE) / CAST(n_ref + k AS DOUBLE)) *
      |          ln((CAST(c_w + 1 AS DOUBLE) / CAST(n_w + k AS DOUBLE)) /
      |            (CAST(c_ref + 1 AS DOUBLE) / CAST(n_ref + k AS DOUBLE)))
      |          * 1000000) AS BIGINT) AS psi_term_u
      |      FROM g)
      |SELECT day_start, bucket, c_w, c_ref, psi_term_u,
      |       CAST(sum(psi_term_u) OVER (PARTITION BY day_start) AS BIGINT)
      |         AS psi_day_u
      |FROM t""") { (s, d) =>
    val sink = runToCompletion(psiDayCounts(eventStream(s, d)), "complete")
    val bucket = least(greatest(
      expr("CAST(floor(value / 1000) AS BIGINT)"), lit(0L)), lit(9L))
    val ref = Tables.load(s, d, "events").select(bucket.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c_ref"))
    val tot = ref.agg(sum("c_ref").as("n_ref"), count(lit(1)).as("k"))
    // days/nw branch off the sink table too — alias every rejoined
    // column so the three-way self-join carries distinct attribute ids
    val days = sink.select(col("day_start").as("d_day")).distinct()
    val nw = sink.groupBy("day_start").agg(sum("c_w").as("n_w"))
      .select(col("day_start").as("nw_day"), col("n_w"))
    val g = days.crossJoin(ref)
      .join(sink,
        col("d_day") === sink("day_start") && ref("bucket") === sink("bucket"),
        "left")
      .na.fill(0L, Seq("c_w"))
      .join(nw, col("d_day") === col("nw_day"))
      .crossJoin(broadcast(tot))
    val pa = (col("c_w") + 1).cast("double") /
      (col("n_w") + col("k")).cast("double")
    val pb = (col("c_ref") + 1).cast("double") /
      (col("n_ref") + col("k")).cast("double")
    g.select(col("d_day").as("day_start"), ref("bucket"), col("c_w"),
        col("c_ref"),
        round((pa - pb) * log(pa / pb) * 1e6).cast("long").as("psi_term_u"))
      .withColumn("psi_day_u", sum("psi_term_u").over(
        org.apache.spark.sql.expressions.Window.partitionBy("day_start")))
  }

  /** Streaming embedding-drift monitor — the streaming twin of
    * `sim_embed_drift` (oracle shared via one SQL builder, so the two
    * cannot drift): the (half, dim) integer-µ sums run as ONE
    * complete-mode streaming aggregation whose state is 2·dims rows —
    * CONSTANT, never the corpus — and invariant to micro-batch slicing
    * because integer sums commute; the centroid-cosine/drift
    * derivation is a batch post-pass over the dims-sized sink. The
    * live "did the encoder distribution move" gate an embedding-ingest
    * pipeline keeps next to its DQ monitors.
    *
    * FIXED-WIDTH invariant (r10 advisory): per-half vector counts come
    * from the per-(half, dim) exploded-row count, while the shared
    * oracle (and the batch twin) counts DISTINCT vec_id per half —
    * identical exactly because every embedding carries every dimension
    * (the testdata contract: dense float32[64], no ragged or
    * null-padded arrays). A variable-width source would need a second
    * per-half distinct-vec_id streaming aggregate here; the exploded
    * count is deliberately kept because it avoids carrying vec_id
    * through the (half, dim) state at corpus scale.
    */
  q("st_embed_drift", graft.pipeline.SimQueries.embedDriftSql) {
    (s, d) =>
    val dec = "decimal(38,0)"
    val ex = embStream(s, d)
      .withColumn("half",
        when(graft.pipeline.Sampling.hashBucket("vec_id") % 2 === 0, "a")
          .otherwise("b"))
      .select(col("half"), posexplode(col("embedding")).as(Seq("dim0", "v")))
      .select(col("half"), (col("dim0") + 1).as("dim"),
        floor(col("v").cast("double") * 1000000 + lit(0.5))
          .cast("long").as("vu"))
    val sink = runToCompletion(
      ex.groupBy("half", "dim")
        .agg(sum(col("vu")).as("s"), count(lit(1)).as("n")),
      "complete")
    // the memory-sink view cannot self-join (conflicting attribute
    // ids); the state is 2·dims rows — snapshot it through a bounded
    // collect (model-sized, the quantizer-fit contract) and rebuild
    import s.implicits._
    val snap = sink.collect().toSeq
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toDF("half", "dim", "s", "n")
    val wide = snap.filter(col("half") === "a")
      .select(col("dim"), col("s").as("sa"), col("n").as("n_a"))
      .join(snap.filter(col("half") === "b")
        .select(col("dim"), col("s").as("sb"), col("n").as("n_b")),
        Seq("dim"))
    wide
      .select(col("n_a"), col("n_b"),
        expr("abs(sa * n_b - sb * n_a) div (n_a * n_b)").as("dmean_u"),
        (col("sa").cast(dec) * col("sb")).as("dot_t"),
        (col("sa").cast(dec) * col("sa")).as("aa_t"),
        (col("sb").cast(dec) * col("sb")).as("bb_t"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        round(sum(col("dot_t")).cast("double") /
          (sqrt(sum(col("aa_t")).cast("double")) *
            sqrt(sum(col("bb_t")).cast("double"))), 6).as("centroid_cos"),
        max(col("dmean_u")).cast("long").as("max_dmean_u"),
        sum(when(col("dmean_u") > 50000, 1L).otherwise(0L))
          .as("n_drifted_dims"))
  }

  /** Streaming sequence-length planning curve — the twin of
    * `t_seqlen_curve` (oracle + both math stages shared via
    * `TextQueries.seqlenCurveSql`/`seqlenSums`/`seqlenDerive`):
    * the live "is the incoming feed's length profile still compatible
    * with the configured max_seq_len" readout. The stream-static
    * broadcast cross join amplifies ONE per-doc LONG ×5 map-side, the
    * complete-mode aggregate holds |L| = 5 rows of commuting integer
    * sums — constant state, invariant to micro-batch slicing — and
    * the ppm derivations run as a batch post-pass over the 5-row sink.
    */
  q("st_seqlen_curve", graft.pipeline.TextQueries.seqlenCurveSql) {
    (s, d) =>
    val sink = runToCompletion(
      graft.pipeline.TextQueries.seqlenSums(docStream(s, d)),
      "complete")
    graft.pipeline.TextQueries.seqlenDerive(sink)
  }

  /** Streaming Benford monitor — the streaming twin of `dq_benford`
    * (oracle + post-count math shared via `LogAnalytics.benfordSql` /
    * `benfordRollup`, so the twins cannot drift): the live
    * fabricated-feed screen next to the DQ monitors. Digit extraction
    * is map-local integer-to-string truncation; the stream carries ONE
    * complete-mode (type, digit) count — state ≤ types×9 rows, STRICTLY
    * bounded and invariant to micro-batch slicing (counts commute);
    * the expectation join + divergence window run as a batch post-pass
    * over the bounded sink snapshot.
    */
  q("st_benford", graft.rel.LogAnalytics.benfordSql) { (s, d) =>
    val o = eventStream(s, d)
      .filter(expr("CAST(floor(abs(value) * 10000 + 0.5) AS BIGINT) > 0"))
      .select(col("event_type"),
        graft.rel.LogAnalytics.benfordDigit.as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("c"))
    val sink = runToCompletion(o, "complete")
    import s.implicits._
    val snap = sink.collect().toSeq
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .toDF("event_type", "d", "c")
    graft.rel.LogAnalytics.benfordRollup(snap)
  }

  /** Streaming domain-reweight monitor — the streaming twin of
    * `t_domain_reweight` (oracle + downstream math shared via
    * `TextQueries.domainReweightSql` / `domainReweightFromCounts`,
    * so the twins cannot drift): the live "has the ingest mixture
    * drifted enough to re-plan domain weights" readout. The stream
    * carries the feature counts as ONE complete-mode (lang, bucket)
    * aggregation over md5-u48 HASHED tokens (`dsirBucket`, 4096
    * buckets) — state is |domains|·4096 rows, BOUNDED regardless of
    * vocabulary growth (raw tokens would make streaming state
    * vocabulary-sized, the one thing a long-lived stream must never
    * hold); the KL/update math is a batch post-pass over the
    * model-sized sink snapshot (bounded collect, the quantizer-fit
    * contract — the memory-sink view cannot self-join).
    *
    * Bucket-aggregated KL is a LOWER bound on the token-level KL
    * (data-processing inequality) and equals it while buckets are
    * collision-free — true of the committed testdata at 4096 and
    * pinned by spec, so the twin hash-matches the batch entry's
    * numbers only through its own hashed oracle, never by accident.
    */
  q("st_domain_reweight",
    graft.pipeline.TextQueries.domainReweightSql(
      """SELECT lang,
        |       CAST(('0x' || substr(md5(w0), 1, 12)) AS UBIGINT) % 4096
        |         AS w
        |FROM (SELECT lang, unnest(string_split(text, ' ')) AS w0
        |      FROM documents WHERE text IS NOT NULL)""".stripMargin)) {
    (s, d) =>
    val toks = docStream(s, d).filter(col("text").isNotNull)
      .select(col("lang"),
        explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("lang"),
        graft.text.TextAnalysis.dsirBucket(col("tok"), 4096).as("w"))
    val sink = runToCompletion(
      toks.groupBy("lang", "w").agg(count(lit(1)).as("c_dw")),
      "complete")
    import s.implicits._
    val snap = sink.collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toDF("lang", "w", "c_dw")
    graft.pipeline.TextQueries.domainReweightFromCounts(snap)
  }

  /** The streaming half of st_psi_drift: complete-mode per-day
    * value-bucket counts — (days × 10) state rows total.
    */
  def psiDayCounts(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("tsu"), "1 day"),
        least(greatest(expr("CAST(floor(value / 1000) AS BIGINT)"),
          lit(0L)), lit(9L)).as("bucket"))
      .agg(count(lit(1)).as("c_w"))
      .select(unix_timestamp(col("window.start")).as("day_start"),
        col("bucket"), col("c_w"))

  /** The st_click_attribution transform over any events(-shaped)
    * stream (a stream self-join: both sides branch off `ev`).
    */
  def clickAttribution(ev: DataFrame): DataFrame = {
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("tsu").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "3650 days")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("tsu").as("p_ts"),
        col("event_id").as("purchase_id"),
        expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").as("value_u"))
      .withWatermark("p_ts", "3650 days")
    purchases.join(clicks, expr(
      """c_user = p_user AND
        |p_ts >= c_ts AND p_ts <= c_ts + interval 1 hour""".stripMargin))
      .select(col("purchase_id"), col("click_id"),
        col("p_user").as("user_id"),
        unix_micros(col("c_ts")).as("c_us"),
        unix_micros(col("p_ts")).as("p_us"), col("value_u"))
  }
}
