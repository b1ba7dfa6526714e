package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §7.5): media payloads travel as
  * opaque `binary` columns beside typed metadata; decode/feature steps
  * run batch-wise per partition so a real decoder (image/audio codec)
  * drops in without touching the Spark plan.
  *
  * The decode itself is STUBBED — this container ships no media codecs —
  * with a deterministic fake that preserves the real data flow: schema,
  * partitioning, batch shape, and feature projection are all live and
  * tested; only `decodeStub` would be replaced in production.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte],
      media_type: String, n_bytes: Int)

  final case class MediaFeatures(doc_id: Long, n_bytes: Int,
      checksum: Long, width: Int, height: Int, mean_intensity: Double,
      sum_bytes: Long)

  /** Build a media table from the documents corpus: the text bytes play
    * the opaque payload; metadata is typed columns.
    */
  def payloads(spark: SparkSession, dir: String): DataFrame =
    graft.io.Tables.load(spark, dir, "documents").select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("text/fake").as("media_type"),
      octet_length(col("text").cast("binary")).as("n_bytes"))

  /** STUB decode: a real implementation would decode the payload with a
    * codec and return pixel/sample features. The fake derives
    * deterministic pseudo-features from the bytes so the pipeline is
    * end-to-end testable.
    */
  private[multimodal] def decodeStub(payload: Array[Byte]): (Int, Int, Double) = {
    var checksum = 0L
    var i = 0
    while (i < payload.length) {
      checksum = checksum * 31 + (payload(i) & 0xff)
      i += 1
    }
    val width = 16 + (math.abs(checksum) % 48).toInt // fake dims
    val height = 16 + (math.abs(checksum >> 8) % 48).toInt
    val mean =
      if (payload.isEmpty) 0.0
      else payload.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / payload.length
    (width, height, mean)
  }

  /** Frame-sampling plumbing: treat the payload as fixed-width frames
    * and keep every k-th with its fingerprint. A real video decoder
    * emits frames by PTS/keyframe — here the STUB slices fixed byte
    * windows — but the Spark-side shape is the live part: lazy
    * sequence+filter+explode (no UDF), per-frame fingerprint via the
    * native RollingHash expression, one output row per sampled frame.
    * Frames are full-width by construction (trailing remainder bytes
    * are not a frame).
    */
  def frameSample(media: DataFrame, frameBytes: Int,
      everyK: Int): DataFrame = {
    require(frameBytes > 0 && everyK > 0, "frameBytes/everyK must be > 0")
    media.select(col("doc_id"),
        expr(s"n_bytes div $frameBytes").cast("int").as("n_frames"),
        col("payload").cast("string").as("__txt"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("n_frames"), col("__txt"),
        explode(filter(sequence(lit(0), col("n_frames") - 1),
          i => i % everyK === 0)).as("frame_idx"))
      .withColumn("frame",
        expr(s"substring(__txt, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        graft.functions.RollingHash.rolling_hash(col("frame"))
          .as("frame_fp"))
  }

  /** Near-duplicate media detection by SHARED FRAME FINGERPRINTS —
    * the "same video re-encoded / trimmed / re-containered" relation
    * whole-payload checksums miss (one changed byte breaks the
    * checksum; most frames still collide): pairs of docs sharing ≥
    * `minShared` distinct sampled-frame fingerprints, scored by
    * overlap_ppm = shared / min(|fp_a|, |fp_b|) (containment-style, so
    * a clip inside a longer cut still scores high). Rides
    * [[frameSample]]'s native rolling-hash fingerprints, so the
    * DuckDB oracle replays the identical HUGEINT fold. Shape: one
    * (frame_fp)-keyed posting self-join — the LSH band-join contract;
    * `maxDocFreq` is the production skew knob (a blank/boilerplate
    * frame shared by k docs emits O(k²) pair rows; grams above the
    * cap leave candidate generation via a per-fp df table, the
    * ngramContainmentPairs pattern — bounded recall loss, since
    * near-dup media share rare frames too).
    */
  def frameOverlapPairs(media: DataFrame, frameBytes: Int, everyK: Int,
      minShared: Long, maxDocFreq: Option[Int] = None): DataFrame = {
    require(minShared >= 1, s"minShared out of range: $minShared")
    val fps = frameSample(media, frameBytes, everyK)
      .select(col("doc_id"), col("frame_fp")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val joinable = maxDocFreq match {
      case Some(cap) =>
        require(cap >= 2, s"maxDocFreq out of range: $cap")
        val df = fps.groupBy("frame_fp").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select("frame_fp")
        fps.join(df, "frame_fp")
      case None => fps
    }
    val cnt = fps.groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
    // materialize the (pair-sized) result, then release the shared
    // fingerprint cache — a lazy return would leak the persist for the
    // session (r9 advisory)
    val out = joinable.as("x").join(joinable.as("y"),
        col("x.frame_fp") === col("y.frame_fp") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(cnt.select(col("doc_id").as("doc_a"), col("n_fp").as("fp_a")),
        "doc_a")
      .join(cnt.select(col("doc_id").as("doc_b"), col("n_fp").as("fp_b")),
        "doc_b")
      .withColumn("overlap_ppm",
        expr("n_shared * 1000000L div least(fp_a, fp_b)"))
      .localCheckpoint(true)
    fps.unpersist(false)
    out
  }

  /** Byte-level payload TRIAGE (r12) — the step a media pipeline runs
    * BEFORE any decode is attempted: per payload, the byte histogram's
    * summary statistics flag corrupt, truncated, mislabeled or
    * degenerate blobs without touching a codec. Everything is exact
    * integer arithmetic so the report is engine-replayable:
    *
    *   - n_bytes, n_distinct_bytes — a payload claiming to be
    *     compressed media with 6 distinct bytes is garbage;
    *   - top_byte / top_count (ties to the LOWER byte value — total
    *     order) — a dominant 0x00 means padding/truncation;
    *   - printable_ppm — share of bytes in [32, 126]; the text-vs-
    *     binary verdict threshold (a "jpeg" that is 99% printable is
    *     mislabeled HTML);
    *   - simpson_u = Σ c² over the histogram — the collision mass, an
    *     exact-integer diversity proxy (compressed/encrypted payloads
    *     score near-uniform LOW, repetitive/degenerate ones HIGH) that
    *     needs no ln() and therefore no cross-engine libm hazard.
    *
    * Format sniffing rides this histogram in [[formatSniff]] (r13 —
    * the extension this docstring used to only promise): a broadcast
    * magic-byte table joined on the first-4-bytes prefix, histogram
    * verdict as the fallback.
    *
    * Shape at scale: ONE explode of the payload bytes into a
    * (doc, byte)-keyed count — map-side combined into ≤256 rows per
    * doc — then a doc-keyed aggregate over that bounded histogram.
    * No UDF: the byte explode is codegen'd transform/sequence/ascii
    * column algebra (payloads here are the ASCII text bytes, so
    * `ascii(substring)` IS the byte value — the winnow oracle's
    * proven ord() convention; a raw-binary corpus would swap in
    * `get_byte`-style indexing with the same two-aggregate shape).
    *
    * Posture note (r12 verdict #4): the explode emits one INTERNAL row
    * per payload byte before the partial aggregate collapses it —
    * correct and codegen'd, but 10⁶ rows/doc at MB-scale media
    * payloads. [[byteTriageAgg]] is the bounded-state twin for that
    * regime (one row per payload through the plan, 256-slot aggregate
    * buffer); the bench A/B mm_byte_triage vs mm_byte_triage_agg
    * prices the two forms, and ByteTriageAggSpec-grade frame equality
    * is spec-pinned so either can serve any caller.
    */
  def byteTriage(media: DataFrame): DataFrame = {
    val hist = media
      .select(col("doc_id"), col("payload").cast("string").as("t"))
      // empty payloads drop BEFORE the explode (r12 ADVICE): Spark's
      // sequence(1, 0) is [1, 0] (step defaults to -1 when start >
      // stop), which would fabricate two b=0 rows for a zero-length
      // blob while the oracle's generate_series(1, 0) is empty —
      // matching the oracle's row-drop semantics keeps the latent
      // divergence out, and a triage gate has nothing to say about a
      // payload with no bytes anyway (upstream length checks own it)
      .filter(length(col("t")) > 0)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(t)), i -> ascii(substring(t, i, 1)))"))
        .as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
    triageRollup(hist)
  }

  /** [[byteTriage]]'s RAW-BINARY sibling: the identical two-aggregate
    * shape, but byte values come from per-byte hex decode
    * (`conv(hex(substring(payload, i, 1)), 16, 10)` — still codegen'd
    * column algebra, no UDF) instead of `ascii` over a string cast.
    * This is the form the byteTriage docstring promises for a
    * raw-binary corpus: a string cast UTF-8-mangles every byte above
    * 0x7F (U+FFFD replacement), so a PNG/JPEG payload's histogram —
    * and therefore its text/binary verdict — would be wrong under
    * [[byteTriage]]. Used by [[formatSniffBytes]] and exercised
    * oracle-checked over the committed binary-magic fixture
    * (`mm_format_sniff_magic`).
    */
  def byteTriageBytes(media: DataFrame): DataFrame = {
    val hist = media
      .filter(expr("octet_length(payload)") > 0)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, octet_length(payload)),
          |  i -> CAST(conv(hex(substring(payload, i, 1)), 16, 10)
          |            AS INT))""".stripMargin)).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
    triageRollup(hist)
  }

  /** The (doc, byte)→count histogram → per-doc summary rollup shared
    * by the char-valued and raw-binary triage forms.
    */
  private def triageRollup(hist: DataFrame): DataFrame =
    hist.groupBy("doc_id").agg(
      sum("c").as("n_bytes"),
      count(lit(1)).cast("long").as("n_distinct_bytes"),
      max(struct(col("c"), (-col("b")).as("nb"))).as("top"),
      sum(col("c") * col("c")).as("simpson_u"),
      sum(when(col("b").between(32, 126), col("c")).otherwise(0L))
        .as("printable"))
      .select(col("doc_id"), col("n_bytes"), col("n_distinct_bytes"),
        (-col("top.nb")).cast("int").as("top_byte"),
        col("top.c").as("top_count"),
        expr("printable * 1000000L div n_bytes").as("printable_ppm"),
        col("simpson_u"),
        when(expr("printable * 1000000L div n_bytes") >= 950000L,
          "text").otherwise("binary").as("verdict"))

  /** [[byteTriage]]'s bounded-state twin (r12 verdict #4): identical
    * output, but the per-byte row explode is replaced by ONE
    * [[graft.functions.ByteTriageAgg]] pass — each payload folds into
    * a 256-slot count array inside the aggregate buffer, so row
    * traffic through the plan is one row per payload (not one per
    * byte: 10⁶/doc at MB-scale media) and the doc-keyed exchange moves
    * a single summary struct. The cost is leaving pure column algebra
    * for a typed aggregate; the bench A/B (mm_byte_triage vs
    * mm_byte_triage_agg) prices the tradeoff, and ByteTriageAggSpec
    * pins frame equality against the explode form.
    */
  def byteTriageAgg(media: DataFrame): DataFrame =
    byteTriageSummary(media.select(col("doc_id"),
      col("payload").cast("string").as("t")))

  /** The (doc_id, t)-frame → triage-summary block shared by the batch
    * aggregate form and the streaming twin (`st_byte_triage`) — ONE
    * projection for every ByteTriageAgg consumer, so the "one truth,
    * three consumers" contract can't drift through a hand-copied
    * select list. Works on batch and streaming frames alike (select/
    * filter/one aggregation).
    */
  def byteTriageSummary(docsT: DataFrame): DataFrame =
    docsT
      .filter(length(col("t")) > 0) // oracle row-drop semantics
      .groupBy("doc_id")
      .agg(graft.functions.ByteTriageAgg.byte_triage(col("t")).as("s"))
      .select(col("doc_id"), col("s.n_bytes"), col("s.n_distinct_bytes"),
        col("s.top_byte"), col("s.top_count"), col("s.printable_ppm"),
        col("s.simpson_u"), col("s.verdict"))

  /** Format sniffing by MAGIC-BYTE prefix (r12 verdict #5 — the
    * production extension [[byteTriage]]'s docstring promised): a
    * broadcast (first-4-BYTES prefix → format) table joined against
    * each payload's prefix, with the triage verdict as the fallback —
    * so the output verdict ladder is jpeg/png/gif/pdf/zip/… for
    * recognized containers, then text/binary from the histogram for
    * everything else. Pure column algebra + one broadcast hash join +
    * one doc-keyed join back to the histogram summary; the corpus
    * never shuffles on content.
    *
    * The comparison is BYTE-level (r13 self-review): the payload's
    * first four RAW bytes hex-encoded against the magic table's hex
    * form — a cast-to-string comparison would UTF-8-mangle every
    * magic byte above 0x7F (raw 0x89 is not the encoding of U+0089),
    * so PNG/JPEG magics would never match a real binary payload. The
    * table itself stays readable char-valued Scala (each char < 256 =
    * one byte); [[formatSniff]] and the DuckDB oracle both derive the
    * hex compare from it, so the three forms cannot drift.
    */
  val magicTable: Seq[(String, String)] = Seq(
    "\u0089PNG" -> "png",
    "\u00ff\u00d8\u00ff\u00e0" -> "jpeg", // JFIF
    "\u00ff\u00d8\u00ff\u00e1" -> "jpeg", // EXIF
    "GIF8" -> "gif",
    "%PDF" -> "pdf",
    "PK\u0003\u0004" -> "zip",
    "Rar!" -> "rar",
    "OggS" -> "ogg",
    "fLaC" -> "flac",
    "RIFF" -> "riff", // wav/avi container
    "<!DO" -> "html",
    "<htm" -> "html",
    "<?xm" -> "xml")

  /** The magic table in first-4-bytes HEX form — the join/CASE key
    * both engines actually compare on.
    */
  def magicHexTable: Seq[(String, String)] =
    magicTable.map { case (p, f) =>
      (p.map(c => f"${c.toInt}%02X").mkString, f)
    }

  def formatSniff(media: DataFrame): DataFrame =
    sniffWith(media, byteTriage(media))

  /** [[formatSniff]] with the byte-exact histogram fallback — the
    * form a RAW-BINARY corpus routes through (the char-cast triage
    * would mangle >0x7F bytes and misjudge the printable share; the
    * prefix join is byte-level in both forms).
    */
  def formatSniffBytes(media: DataFrame): DataFrame =
    sniffWith(media, byteTriageBytes(media))

  private def sniffWith(media: DataFrame, triage: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val magic = broadcast(magicHexTable.toDF("prefix_hex", "sniffed_fmt"))
    // substring on BinaryType slices BYTES; hex() of <=4 bytes is the
    // <=8-char uppercase key (identical to DuckDB's
    // substring(hex(encode(text)), 1, 8) on the oracle side)
    val pre = media.select(col("doc_id"),
      hex(expr("substring(payload, 1, 4)")).as("prefix_hex"))
    triage
      .join(pre.join(magic, Seq("prefix_hex"), "left")
        .select(col("doc_id"), col("prefix_hex"), col("sniffed_fmt")),
        "doc_id")
      .select(col("doc_id"), col("prefix_hex"),
        coalesce(col("sniffed_fmt"), lit("none")).as("sniffed"),
        col("verdict"),
        coalesce(col("sniffed_fmt"), col("verdict")).as("format"))
  }

  /** Resize plumbing: target dimensions + exact scale factors from the
    * decoded dims. A codec-backed implementation would resample pixels
    * per partition; the plan shape (dims in, scales + target out) is
    * what the engine owns either way.
    */
  def resizePlan(features: Dataset[MediaFeatures], targetW: Int,
      targetH: Int): DataFrame =
    features.toDF().select(col("doc_id"), col("width"), col("height"),
      lit(targetW).as("target_w"), lit(targetH).as("target_h"),
      round(lit(targetW).cast("double") / col("width"), 6).as("scale_x"),
      round(lit(targetH).cast("double") / col("height"), 6).as("scale_y"))

  /** Batch feature extraction over partitions: one JVM-level pass per
    * partition (where a codec would amortize its setup), typed output.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition: real decoders initialize once here
        rows.map { case (id, payload) =>
          var checksum = 0L
          var sum = 0L
          payload.foreach { b =>
            checksum = checksum * 31 + (b & 0xff)
            sum += (b & 0xff)
          }
          val (w, h, mean) = decodeStub(payload)
          MediaFeatures(id, payload.length, checksum, w, h, mean, sum)
        }
      }
  }
}
