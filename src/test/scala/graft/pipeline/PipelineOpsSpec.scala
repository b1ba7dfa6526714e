package graft.pipeline

import graft.dedup.Dedup
import graft.functions.RollingHash
import graft.multimodal.Multimodal
import graft.sim.Similarity
import graft.pipeline.Sampling
import graft.text.{Search, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the training-data pipeline operators: dedup family,
  * similarity, text analysis, fingerprinting, multimodal plumbing.
  */
class PipelineOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup collapses identical texts to min doc_id") {
    val df = docsDf(
      (1L, "aa bb cc"), (2L, "aa bb cc"), (3L, "dd ee ff"))
    val out = Dedup.exactDedup(df).collect()
      .map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_copies")))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("minhash estimate ≈ jaccard: identical=1, disjoint=0") {
    val a = Seq.tabulate(40)(i => s"tok$i")
    val b = Seq.tabulate(40)(i => s"other$i")
    val sa = Dedup.minhashSignature(a, 64, 3, 42L)
    val sa2 = Dedup.minhashSignature(a, 64, 3, 42L)
    val sb = Dedup.minhashSignature(b, 64, 3, 42L)
    assert(sa.sameElements(sa2))
    assert(sa.zip(sb).count(t => t._1 == t._2) <= 3) // ~0 matches
  }

  test("minhash LSH surfaces a planted near-duplicate pair") {
    val base = Seq.tabulate(50)(i => s"w$i")
    val nearDup = base.updated(10, "CHANGED") // jaccard ~0.9
    val far = Seq.tabulate(50)(i => s"z$i")
    val df = docsDf(
      (1L, base.mkString(" ")), (2L, nearDup.mkString(" ")),
      (3L, far.mkString(" ")))
    val pairs = Dedup.minhashCandidates(df, minEstJaccard = 0.5).collect()
    assert(pairs.exists(r =>
      r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L),
      s"got ${pairs.mkString(";")}")
    assert(!pairs.exists(r => r.getAs[Long]("doc_b") == 3L))
  }

  test("minhash star mode: a viral family over the bucket cap stays " +
      "connected via hub edges; drop mode loses it entirely") {
    // 6 identical docs (every band bucket holds all 6) + 1 unrelated;
    // maxBucket = 2 makes the family's buckets HOT. Drop mode: zero
    // candidates — the documented recall hole the adversarial run
    // measured (exact dedup can't catch NEAR dups). Star mode: every
    // member pairs with the bucket-min hub (doc 1) — exactly the 5
    // hub edges, so connected components collapse the family at k−1
    // volume, never k².
    val fam = Seq.tabulate(40)(i => s"t$i").mkString(" ")
    val df = docsDf((1L, fam), (2L, fam), (3L, fam), (4L, fam),
      (5L, fam), (6L, fam), (7L, Seq.tabulate(40)(i => s"u$i").mkString(" ")))
    val drop = Dedup.minhashCandidates(df, minEstJaccard = 0.5,
      maxBucket = 2).collect()
    assert(drop.isEmpty, s"drop mode must exclude hot buckets: ${drop.toSeq}")
    val star = Dedup.minhashCandidates(df, minEstJaccard = 0.5,
      maxBucket = 2, hotBucketStar = true).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).sorted
    assert(star.toSeq == (2L to 6L).map(b => (1L, b)),
      s"expected the 5 hub edges, got ${star.toSeq}")
  }

  test("simhash: identical → hamming 0; near-dup small; far large") {
    val base = Seq.tabulate(60)(i => s"w$i")
    val near = base.updated(5, "x")
    val h1 = Dedup.simhash64(base)
    val h2 = Dedup.simhash64(near)
    val h3 = Dedup.simhash64(Seq.tabulate(60)(i => s"q$i"))
    assert(java.lang.Long.bitCount(h1 ^ h1) == 0)
    val dNear = java.lang.Long.bitCount(h1 ^ h2)
    val dFar = java.lang.Long.bitCount(h1 ^ h3)
    assert(dNear < dFar, s"near $dNear !< far $dFar")
  }

  test("ngram jaccard computes the exact overlap ratio") {
    // doc1: tokens a b c d e → 3-grams {abc,bcd,cde}; doc2 shares 2 of 3
    val df = docsDf(
      (1L, "a b c d e"), (2L, "a b c d x"), (3L, "p q r s t"))
    val out = Dedup.ngramJaccardPairs(df, n = 3, minJaccard = 0.1).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    // grams1 = {abc,bcd,cde}, grams2 = {abc,bcd,cdx}: inter 2, union 4
    assert(math.abs(r.getAs[Double]("jaccard") - 0.5) < 1e-9)
  }

  test("cosine near-dup and brute-force top-k agree on a planted cluster") {
    import spark.implicits._
    val v1 = Array.tabulate(8)(i => (i + 1).toFloat)
    val v2 = v1.map(x => x * 2.0f) // same direction → cosine 1
    val v3 = Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f)
    val df = Seq((1L, v1.toSeq, 0), (2L, v2.toSeq, 0), (3L, v3.toSeq, 1))
      .toDF("vec_id", "embedding", "label")
    val nd = Dedup.cosineNearDup(df, 0.99).collect()
    assert(nd.length == 1 && nd(0).getAs[Long]("vec_a") == 1L &&
      nd(0).getAs[Long]("vec_b") == 2L)
    val topk = Similarity.bruteForceTopK(df.filter($"vec_id" === 1L), df, 2)
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(topk(0).getAs[Long]("cand_id") == 2L)
    assert(math.abs(topk(0).getAs[Double]("cosine") - 1.0) < 1e-6)
  }

  test("LSH top-k achieves high recall vs brute force on clustered data") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // 10 cluster centers × 10 members with small perturbations
    val rows = for {
      c <- 0 until 10
      m <- 0 until 10
    } yield {
      val center = Array.tabulate(16)(d =>
        math.sin(c * 16 + d).toFloat * 5)
      val vec = center.map(x => x + rnd.nextGaussian().toFloat * 0.1f)
      ((c * 10 + m).toLong, vec.toSeq, c)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val brute = Similarity.bruteForceTopK(df, df, 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    val lsh = Similarity.lshTopK(df, 3, planes = 8, tables = 6).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall > 0.8, s"LSH recall $recall")
  }

  test("IVF top-k achieves high recall vs brute force on clustered data") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val rows = for {
      c <- 0 until 8
      m <- 0 until 12
    } yield {
      val center = Array.tabulate(16)(d => math.cos(c * 16 + d).toFloat * 5)
      val vec = center.map(x => x + rnd.nextGaussian().toFloat * 0.1f)
      ((c * 12 + m).toLong, vec.toSeq, c)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val brute = Similarity.bruteForceTopK(df, df, 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    val ivf = Similarity.ivfTopK(df, 3, nlist = 8, nprobe = 2).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall > 0.9, s"IVF recall $recall")
  }

  test("IVF-PQ: same-cluster candidates dominate, deterministic, prunes the scan") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = for {
      c <- 0 until 8
      m <- 0 until 12
    } yield {
      val center = Array.tabulate(16)(d => math.cos(c * 16 + d).toFloat * 5)
      val vec = center.map(x => x + rnd.nextGaussian().toFloat * 0.1f)
      ((c * 12 + m).toLong, vec.toSeq, c)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val quant = Similarity.hashSampledQuantizer(df, nlist = 8)
    val cb = Similarity.hashSampledPqCodebook(df, m = 4, ksub = 8)
    val out = Similarity.ivfPqTopK(quant, cb, df, df, k = 3, nprobe = 2)
      .collect()
    // deterministic across invocations (frozen quantizer + codebook)
    val out2 = Similarity.ivfPqTopK(quant, cb, df, df, k = 3, nprobe = 2)
      .collect()
    assert(out.map(_.toString).sorted.sameElements(out2.map(_.toString).sorted))
    // Two approximations compound (IVF prunes cells, PQ distorts
    // distances), so purity sits below either alone (~0.73 here) but
    // far above the 1/8 chance floor — the recall/IO trade the layout
    // exists for; exact re-rank of the survivors recovers the rest.
    val labels = rows.map(r => r._1 -> r._3).toMap
    val purity = out.count(r =>
      labels(r.getAs[Long]("query_id")) == labels(r.getAs[Long]("cand_id")))
      .toDouble / out.length
    assert(purity > 0.6, s"IVF-PQ same-cluster purity $purity")
  }

  test("semDedup drops planted duplicates within cells, keeps the rest") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val originals = (0 until 20).map { i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat), 0)
    }
    // exact copies of the first 5 vectors, larger ids — same cell by
    // construction, cosine exactly 1
    val copies = (0 until 5).map { i =>
      (100L + i, originals(i)._2, 0)
    }
    val df = (originals ++ copies).toDF("vec_id", "embedding", "label")
    val quant = Similarity.hashSampledQuantizer(df, nlist = 4)
    val kept = Dedup.semDedup(quant, df, minCosine = 0.95)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(kept == (0 until 20).map(_.toLong).toSet,
      s"survivors: ${kept.toSeq.sorted}")
  }

  test("repetition stats: repeated text fails the gopher gate, varied text passes") {
    val df = docsDf(
      (1L, "a a a a a a"), // dup_frac 5/6, top bigram "a a" ×5
      (2L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"))
    val out = TextAnalysis.repetitionStats(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("top_bigram_cnt"), r.getAs[Double]("dup_word_frac"),
          r.getAs[Int]("gopher_pass"))).toMap
    assert(out(1L) == ((5L, 0.8333, 0)))
    // 10 distinct tokens: dup 0, top bigram 1 → frac 0.2 = the bound → pass
    assert(out(2L) == ((1L, 0.0, 1)))
  }

  test("decontaminate flags docs sharing an 8-gram with the benchmark slice") {
    val gram = "g1 g2 g3 g4 g5 g6 g7 g8"
    val df = docsDf(
      (100L, s"bench prefix $gram bench suffix pad pad"), // benchmark doc
      (1L, s"corpus words then $gram and more after that"), // contaminated
      (2L, "totally different text with no shared gram at all here"),
      (3L, "short")) // < 8 words → clean by definition
    val out = Dedup.decontaminate(df, col("doc_id") === 100L, n = 8)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shared"), r.getAs[Int]("contaminated"))).toMap
    assert(!out.contains(100L), "benchmark docs are excluded from output")
    assert(out(1L)._1 >= 1 && out(1L)._2 == 1, s"doc 1: ${out(1L)}")
    assert(out(2L) == ((0L, 0)))
    assert(out(3L) == ((0L, 0)))
  }

  test("frame sampling slices fixed-width frames at the sampling stride") {
    import spark.implicits._
    val text = ("abcdefgh" * 13).take(100) // 100 bytes -> 3 frames of 32
    val media = Seq((7L, text)).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("text/fake").as("media_type"),
        octet_length(col("text").cast("binary")).as("n_bytes"))
    val out = Multimodal.frameSample(media, frameBytes = 32, everyK = 2)
      .collect().sortBy(_.getAs[Int]("frame_idx"))
    // frames 0 and 2 sampled (stride 2 of 3 full frames; remainder dropped)
    assert(out.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 2))
    assert(out.forall(_.getAs[Int]("n_frames") == 3))
    // fingerprint equals the native expression applied to the exact slice
    val expected = Seq(text.substring(0, 32), text.substring(64, 96))
      .map(f => Seq(f).toDF("s")
        .select(RollingHash.rolling_hash(col("s"))).collect()(0).getLong(0))
    assert(out.map(_.getAs[Long]("frame_fp")).toSeq == expected)
  }

  test("byte triage: histogram stats, tiebreak, and verdict on planted payloads") {
    import spark.implicits._
    // doc 1: "aaab" — top byte 'a'(97)x3, 2 distinct, simpson 9+1=10,
    //   all printable -> text
    // doc 2: "abab" — 'a' and 'b' tie at 2; tiebreak to the LOWER byte
    //   value (97); simpson 4+4=8
    // doc 3: 6 newlines + "ab" — printable 2/8 = 250000 ppm -> binary
    val media = Seq((1L, "aaab"), (2L, "abab"), (3L, "\n\n\n\n\n\nab"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("text/fake").as("media_type"),
        octet_length(col("text").cast("binary")).as("n_bytes"))
    val out = Multimodal.byteTriage(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_bytes") == 4L &&
      d1.getAs[Long]("n_distinct_bytes") == 2L)
    assert(d1.getAs[Int]("top_byte") == 97 &&
      d1.getAs[Long]("top_count") == 3L)
    assert(d1.getAs[Long]("simpson_u") == 10L)
    assert(d1.getAs[String]("verdict") == "text")
    val d2 = out(2L)
    assert(d2.getAs[Int]("top_byte") == 97 &&
      d2.getAs[Long]("top_count") == 2L)
    assert(d2.getAs[Long]("simpson_u") == 8L)
    val d3 = out(3L)
    assert(d3.getAs[Long]("printable_ppm") == 250000L)
    assert(d3.getAs[Int]("top_byte") == 10 &&
      d3.getAs[Long]("top_count") == 6L)
    assert(d3.getAs[String]("verdict") == "binary")
  }

  test("byte triage drops empty payloads (oracle row-drop semantics)") {
    import spark.implicits._
    // r12 ADVICE: sequence(1, 0) in Spark is [1, 0] (negative default
    // step), which used to fabricate two b=0 rows for an empty blob —
    // the DuckDB oracle's generate_series(1, 0) is empty and drops the
    // doc. Empty/truncated blobs are exactly what triage targets, so
    // the row-drop must match.
    val media = Seq((1L, ""), (2L, "ok"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("text/fake").as("media_type"),
        octet_length(col("text").cast("binary")).as("n_bytes"))
    val out = Multimodal.byteTriage(media).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L),
      "empty payload must not fabricate a histogram row")
    assert(out.head.getAs[Long]("n_bytes") == 2L)
  }

  test("byte triage aggregate twin equals the explode form row for row") {
    import spark.implicits._
    // r13 (r12 verdict #4): the TypedImperativeAggregate twin must be
    // output-identical to the explode form — same stats, same
    // lower-byte tiebreak, same verdict — including on ties, empty
    // payloads (dropped), non-ASCII code points (overflow map) and a
    // long repetitive payload (the shape the aggregate exists for).
    val media = Seq(
      (1L, "aaab"), (2L, "abab"), (3L, "\n\n\n\n\n\nab"), (4L, ""),
      (5L, "café résumé कख"), // é ×3 + CJK-range
      (6L, "xy" * 5000),
      // CHUNKED payload: three rows, one doc — the multi-row
      // update/merge path a chunked media store feeds the aggregate
      // (the explode form unions the rows' bytes the same way)
      (7L, "chunk-one "), (7L, "chunk-two "), (7L, "chunk-three"))
      .toDF("doc_id", "text")
      .repartition(4, col("text")) // chunks land in DIFFERENT tasks -> genuine buffer merge
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("text/fake").as("media_type"),
        octet_length(col("text").cast("binary")).as("n_bytes"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.toSeq.toList).sortBy(_.head.toString).toList
    val explodeForm = canon(Multimodal.byteTriage(media))
    val aggForm = canon(Multimodal.byteTriageAgg(media))
    assert(explodeForm == aggForm)
    assert(explodeForm.map(_.head) == Seq(1L, 2L, 3L, 5L, 6L, 7L))
    // the chunked doc's histogram spans all three chunks
    assert(explodeForm.last(1) == 31L) // n_bytes = 10 + 10 + 11
  }

  test("format sniff: magic-byte hits override, misses fall back to verdict") {
    import spark.implicits._
    // RAW-byte payloads (not string round-trips): the PNG/JPEG magics
    // carry bytes > 0x7F that a cast-to-string comparison would
    // UTF-8-mangle — the sniff must match the genuine binary form
    // (r13 self-review fix: the compare is byte-level hex)
    val pngBytes = Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0D, 0x0A, 0x1A, 0x0A) ++
      "....binaryish".getBytes("UTF-8") ++ Array[Byte](1, 2, 3)
    val jpegBytes = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte,
      0xE0.toByte, 0, 16) ++ "JFIF".getBytes("UTF-8") ++
      Array[Byte](0, 1, 2, 3, 4)
    val rows: Seq[(Long, Array[Byte])] = Seq(
      1L -> pngBytes, // genuine binary magic hit
      6L -> jpegBytes, // second >0x7F magic (JFIF variant)
      2L -> "%PDF-1.7 lots of text here that is printable".getBytes("UTF-8"),
      3L -> "<!DOCTYPE html><p>hello</p>".getBytes("UTF-8"),
      4L -> "just a plain prose document with no magic at all".getBytes("UTF-8"),
      5L -> (Array[Byte](1, 2, 3, 4) ++
        " unrecognized binary prefix".getBytes("UTF-8")))
    val media = rows.toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        lit("media/fake").as("media_type"),
        octet_length(col("payload")).as("n_bytes"))
    val out = Multimodal.formatSniff(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("sniffed") == "png" &&
      out(1L).getAs[String]("format") == "png")
    assert(out(1L).getAs[String]("prefix_hex") == "89504E47")
    assert(out(6L).getAs[String]("sniffed") == "jpeg" &&
      out(6L).getAs[String]("format") == "jpeg")
    assert(out(2L).getAs[String]("format") == "pdf")
    assert(out(3L).getAs[String]("format") == "html")
    // miss -> histogram fallback: prose is text, control-prefixed is
    // whatever the printable share says
    assert(out(4L).getAs[String]("sniffed") == "none" &&
      out(4L).getAs[String]("format") == "text")
    assert(out(5L).getAs[String]("sniffed") == "none" &&
      out(5L).getAs[String]("format") ==
        out(5L).getAs[String]("verdict"))
  }

  test("byte-exact triage counts true bytes where the char cast " +
      "mangles >0x7F payloads") {
    import spark.implicits._
    // three invalid-UTF-8 bytes + "abc": the raw form must see 6
    // distinct byte values and a 50% printable share (binary verdict);
    // the char-cast form collapses all three high bytes to U+FFFD
    val payload = Array[Byte](0x89.toByte, 0xFF.toByte, 0x80.toByte) ++
      "abc".getBytes("UTF-8")
    val media = Seq((1L, payload)).toDF("doc_id", "payload")
    val r = Multimodal.byteTriageBytes(media).collect().head
    assert(r.getAs[Long]("n_bytes") == 6L)
    assert(r.getAs[Long]("n_distinct_bytes") == 6L)
    assert(r.getAs[String]("verdict") == "binary")
    val c = Multimodal.byteTriage(media).collect().head
    assert(c.getAs[Long]("n_distinct_bytes") == 4L,
      "char cast should collapse the three invalid bytes to one " +
        "replacement char — if this starts matching the raw form, " +
        "the byteTriageBytes variant is redundant")
  }

  test("sequence packing invariants on randomized shards") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = for (shard <- Seq("a", "b", "c"); i <- 1 to 40)
      yield (shard, i.toLong, 1 + rnd.nextInt(700))
    val out = Sampling.sequencePack(rows.toDF("source", "doc_id", "n"),
      "source", "doc_id", col("n"), capacity = 512).collect()
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
      var expect = 0L
      sorted.foreach { r =>
        val start = r.getAs[Long]("start_offset")
        val pack = r.getAs[Long]("pack_id")
        val off = r.getAs[Long]("offset_in_pack")
        assert(start == expect, "offsets are exact prefix sums")
        assert(pack == start / 512 && off == start % 512)
        expect += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("sequence packing: concat-then-chunk offsets and pack ids") {
    import spark.implicits._
    val df = Seq(
      ("s1", 1L, 300), ("s1", 2L, 300), ("s1", 3L, 100),
      ("s2", 4L, 600)) // second shard packs independently from 0
      .toDF("source", "doc_id", "n")
    val out = Sampling.sequencePack(df, "source", "doc_id",
      col("n"), capacity = 512)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("start_offset"), r.getAs[Long]("pack_id"),
          r.getAs[Long]("offset_in_pack"))).toMap
    assert(out(1L) == ((0L, 0L, 0L)))
    assert(out(2L) == ((300L, 0L, 300L))) // starts in pack 0, spills into 1
    assert(out(3L) == ((600L, 1L, 88L)))
    assert(out(4L) == ((0L, 0L, 0L))) // shard s2 restarts at zero
  }

  test("hash-sampled quantizer: deterministic centers, high IVF recall") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = for {
      c <- 0 until 8
      m <- 0 until 12
    } yield {
      val center = Array.tabulate(16)(d => math.cos(c * 16 + d).toFloat * 5)
      val vec = center.map(x => x + rnd.nextGaussian().toFloat * 0.1f)
      ((c * 12 + m).toLong, vec.toSeq, c)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    // reproducible: two fits pick the identical center set in order
    val q1 = Similarity.hashSampledQuantizer(df, nlist = 8)
    val q2 = Similarity.hashSampledQuantizer(df, nlist = 8)
    assert(q1.centers.length == 8)
    assert(q1.centers.zip(q2.centers).forall { case (a, b) => a.sameElements(b) })
    val brute = Similarity.bruteForceTopK(df, df, 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    val ivf = Similarity.ivfTopK(q1, df, k = 3, nprobe = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall > 0.8, s"hash-sampled IVF recall $recall")
  }

  test("LSH top-k caps degenerate buckets instead of exploding pairs") {
    import spark.implicits._
    // 2000 near-identical vectors: every LSH table hashes them all into
    // ONE bucket. Uncapped that's a 4M-row pair expansion per table;
    // with the cap the hot bucket is excluded and the query completes
    // with bounded work (and, here, no candidates — the documented
    // trade: degenerate content needs exact dedup first, not ANN).
    val rnd = new scala.util.Random(5)
    val base = Array.tabulate(16)(_.toFloat)
    val df = (0 until 2000).map(i =>
        (i.toLong, base.map(x => x + rnd.nextGaussian().toFloat * 1e-4f).toSeq, 0))
      .toDF("vec_id", "embedding", "label")
    val capped = Similarity.lshTopK(df, 3, planes = 8, tables = 2,
      maxBucket = 100)
    assert(capped.count() == 0)
    // sanity: a healthy corpus is unaffected by the cap
    val mixed = ((0 until 50).map(i =>
        (i.toLong,
          Array.tabulate(16)(d => math.sin(i * 16 + d).toFloat * 5).toSeq, 0)))
      .toDF("vec_id", "embedding", "label")
    val loose = Similarity.lshTopK(mixed, 3, planes = 8, tables = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tight = Similarity.lshTopK(mixed, 3, planes = 8, tables = 2,
      maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == tight)
  }

  test("brute-force baselines refuse oversized inputs") {
    import spark.implicits._
    val df = (0 until 200).map(i =>
        (i.toLong, Array.tabulate(4)(d => (i + d).toFloat).toSeq, 0))
      .toDF("vec_id", "embedding", "label")
    intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(df, df, 3, maxCorpusRows = 100)
    }
    intercept[IllegalArgumentException] {
      Dedup.cosineNearDup(df, 0.9, maxRows = 100)
    }
    // under the limit both still work
    assert(Similarity.bruteForceTopK(df.limit(5), df, 3,
      maxCorpusRows = 1000).count() > 0)
  }

  test("IVF cell cap: grid shard binds on a hot cell, results identical") {
    import spark.implicits._
    // a planted hot cell (the stale-quantizer shape): 120 near-identical
    // vectors land in one cell under any quantizer; 40 spread vectors
    // populate the rest. cap=32 must shard the hot cell into >=4 shards
    // while leaving every result bit-identical to the unsharded join —
    // the grid shard is a partitioning of the same pair space.
    val rnd = new scala.util.Random(7)
    val base = Array.tabulate(8)(_.toFloat)
    val hot = (0 until 120).map(i =>
      (i.toLong, base.map(x => x + rnd.nextGaussian().toFloat * 1e-4f).toSeq, 0))
    val spread = (0 until 40).map(i =>
      ((1000 + i).toLong,
        Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat * 5).toSeq, 0))
    val df = (hot ++ spread).toDF("vec_id", "embedding", "label")
    // STALE layout: centers sampled from the spread-only corpus (the
    // clump arrived after the fit), so the whole clump lands on its
    // one nearest old center — data-sampled centers from the FULL
    // corpus would split it, which is the defense, not the trap
    val quant = Similarity.hashSampledQuantizer(
      spread.toDF("vec_id", "embedding", "label"), nlist = 6)
    val idx = Similarity.buildIndex(quant, df)
    val over = Similarity.oversizedCells(idx.assigned, 32)
    assert(over.nonEmpty && over.values.max >= 4, s"cap did not bind: $over")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
    val capped = Similarity.ivfTopK(quant, df, k = 3, nprobe = 2,
      cellCap = 32).collect().map(key).toSet
    val un = Similarity.ivfTopK(quant, df, k = 3, nprobe = 2,
      cellCap = Int.MaxValue).collect().map(key).toSet
    assert(capped == un)
    def dkey(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getLong(2))
    val dc = Similarity.dbscan(quant, df, minCosine = 0.5, minPts = 2,
      probes = 2, cellCap = 32).collect().map(dkey).toSet
    val du = Similarity.dbscan(quant, df, minCosine = 0.5, minPts = 2,
      probes = 2, cellCap = Int.MaxValue).collect().map(dkey).toSet
    assert(dc == du)
  }

  test("IVF quantizer fits once and is reused across query sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = for { c <- 0 until 8; m <- 0 until 12 } yield {
      val center = Array.tabulate(16)(d => math.cos(c * 16 + d).toFloat * 5)
      ((c * 12 + m).toLong,
        center.map(x => x + rnd.nextGaussian().toFloat * 0.1f).toSeq, c)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val quant = Similarity.fitQuantizer(df, nlist = 8)
    // two disjoint corpora served by the SAME fitted quantizer — no
    // k-means job in either query (fit happened above, once)
    val half1 = df.filter($"vec_id" % 2 === 0)
    val half2 = df.filter($"vec_id" % 2 === 1)
    val r1 = Similarity.ivfTopK(quant, half1, k = 3, nprobe = 2)
    val r2 = Similarity.ivfTopK(quant, half2, k = 3, nprobe = 2)
    assert(r1.count() > 0 && r2.count() > 0)
    // parity: the self-contained form with the same seed gives the same
    // result as fit-then-query on the full corpus
    val a = Similarity.ivfTopK(df, 3, nlist = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Similarity.ivfTopK(quant, df, 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("rolling_hash matches reference implementation and runs codegen") {
    def ref(s: String): Long = {
      var h = 0L
      s.getBytes("UTF-8").foreach(b => h = h * 1000003L + (b & 0xff))
      h
    }
    val df = docsDf((1L, "hello world"), (2L, ""), (3L, "αβγ"))
    val out = df.select(col("doc_id"),
      RollingHash.rolling_hash(col("text")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == ref("hello world"))
    assert(out(2L) == 0L)
    assert(out(3L) == ref("αβγ")) // multi-byte UTF-8 path
    // null-safety
    import spark.implicits._
    val withNull = Seq((1L, "x"), (2L, null)).toDF("doc_id", "text")
    val got = withNull.select(RollingHash.rolling_hash($"text")).collect()
    assert(got(1).isNullAt(0))
  }

  test("language heuristic votes on marker stopwords and scripts") {
    val df = docsDf(
      (1L, "el que de la casa y los perros en madrid"),
      (2L, "the cat sat of the mat and it is warm"),
      (3L, "der hund und die katze ist von den bergen"),
      (4L, "数据 处理 引擎 分布式 计算 系统 内存 管理"))
    val out = TextAnalysis.withLangId(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(out(1L) == "es")
    assert(out(2L) == "en")
    assert(out(3L) == "de")
    assert(out(4L) == "zh")
  }

  test("doc pipeline curates: gates quality, drops dups, splits") {
    val base = Seq.tabulate(40)(i => s"w$i word token text sample")
    val df = docsDf(
      (1L, base.mkString(" ")),                       // keeper
      (2L, base.mkString(" ")),                       // exact dup of 1
      (3L, base.updated(0, "CHANGED").mkString(" ")), // near dup of 1
      (4L, "too short"),                              // quality-gated
      (5L, Seq.tabulate(40)(i => s"z$i distinct corpus doc").mkString(" ")))
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
    val out = DocPipeline.curate(spark, df, DocPipeline.CurationParams(
      minTokens = 10, minQualityScore = 0.0, nearDupJaccard = 0.5))
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(1L), s"keeper dropped: $ids")
    assert(!ids.contains(2L), "exact dup survived")
    assert(!ids.contains(3L), "near dup survived")
    assert(!ids.contains(4L), "short doc survived")
    assert(ids.contains(5L))
    val st = DocPipeline.stats(out).collect()
    assert(st.map(_.getAs[Long]("n_docs")).sum == ids.size)
  }

  test("doc pipeline: repetition gate and decontamination stages") {
    val gram = "g1 g2 g3 g4 g5 g6 g7 g8"
    val clean = Seq.tabulate(20)(i => s"u$i").mkString(" ")
    val df = docsDf(
      (1L, s"bench doc holds $gram plus some other words here"), // eval slice
      (10L, clean), // survives everything
      (11L, ("spam ham " * 10).trim), // top bigram covers the doc -> gated
      (13L, s"train doc leaking $gram into the corpus body text")) // contaminated
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
    val out = DocPipeline.curate(spark, df, DocPipeline.CurationParams(
      minTokens = 5, minQualityScore = 0.0, nearDupJaccard = 0.9,
      maxTopBigramPermille = 200, benchmarkPct = 2))
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(10L), s"got $ids")
  }

  test("multimodal feature extraction is deterministic and typed") {
    import spark.implicits._
    val media = Seq((1L, "payload-bytes"), (2L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val feats = Multimodal.extractFeatures(spark, media).collect()
      .sortBy(_.doc_id)
    assert(feats(0).n_bytes == "payload-bytes".getBytes.length)
    assert(feats(1).n_bytes == 0)
    val again = Multimodal.extractFeatures(spark, media).collect()
      .sortBy(_.doc_id)
    assert(feats.toSeq == again.toSeq)
  }

  test("connected components: transitive chains collapse, singletons stay") {
    import spark.implicits._
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    // chain 1-2-3-4 (1~4 never emitted as a pair), pair 5-6, singleton 7
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(verts, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("connected components: sum-invariant convergence is exact on " +
      "mixed non-contiguous components") {
    // r15 opt: convergence is now the exact DECIMAL label-sum compare
    // (labels are per-vertex non-increasing, so equal sums == fixed
    // point). Non-contiguous ids + components of different diameters
    // force several rounds with different per-round sum drops; the
    // result must still be the exact min-id labeling.
    import spark.implicits._
    val verts = Seq(100L, 7L, 903L, 55L, 21L, 4000L, 8L).toDF("doc_id")
    val pairs = Seq((903L, 55L), (55L, 100L), (100L, 21L), // chain, min 21
      (4000L, 8L)) // pair, min 8
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(verts, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(903L -> 21L, 55L -> 21L, 100L -> 21L, 21L -> 21L,
      4000L -> 8L, 8L -> 8L, 7L -> 7L))
  }

  test("cluster dedup: a 64-node path resolves to one keeper") {
    import spark.implicits._
    // worst-case topology for plain propagation (diameter 63): pointer
    // jumping must still converge well inside the iteration cap
    val n = 64L
    val verts = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.clusterDedup(verts, pairs).collect()
    assert(out.length == n)
    assert(out.forall(_.getAs[Long]("cluster_id") == 1L))
    assert(out.count(_.getAs[Int]("is_keep") == 1) == 1)
  }

  test("PQ: deterministic codebook, encode stability, same-cluster ADC") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = for { c <- 0 until 8; m <- 0 until 12 } yield {
      val center = Array.tabulate(16)(d => math.cos(c * 16 + d).toFloat * 5)
      ((c * 12 + m).toLong,
        center.map(x => x + rnd.nextGaussian().toFloat * 0.1f).toSeq, c)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val cb1 = Similarity.hashSampledPqCodebook(df, m = 4, ksub = 16)
    val cb2 = Similarity.hashSampledPqCodebook(df, m = 4, ksub = 16)
    assert(cb1.m == 4 && cb1.ksub == 16 && cb1.dsub == 4)
    assert(cb1.centers.flatMap(_.toSeq).zip(cb2.centers.flatMap(_.toSeq))
      .forall { case (a, b) => a.sameElements(b) })
    // encode is a pure function of the codebook
    val e1 = Similarity.pqEncode(cb1, df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val e2 = Similarity.pqEncode(cb2, df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(e1 == e2)
    // ADC neighbors land in the query's own cluster: the compressed
    // scan preserves the coarse geometry (cluster spacing >> noise)
    val labels = rows.map(r => r._1 -> r._3).toMap
    val top = Similarity.pqAdcTopK(cb1, df, df, k = 3).collect()
    val purity = top.count(r =>
      labels(r.getAs[Long]("query_id")) == labels(r.getAs[Long]("cand_id")))
      .toDouble / top.length
    assert(purity > 0.8, s"ADC same-cluster purity $purity")
  }

  test("PII redaction scrubs emails, IPs, phones and counts them") {
    val df = docsDf(
      (1L, "write alice.smith+x@corp.example.org or 192.168.0.1 call 415-555-2671"),
      (2L, "no pii here just words"),
      (3L, "two mails a@b.io c@d.co one ip 10.0.0.255"))
    val out = TextAnalysis.piiProjection(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Int]("n_emails"),
        r.getAs[Int]("n_ips"), r.getAs[Int]("n_phones"),
        r.getAs[String]("redacted")))).toMap
    assert(out(1L) == ((1, 1, 1, "write <EMAIL> or <IP> call <PHONE>")))
    assert(out(2L) == ((0, 0, 0, "no pii here just words")))
    assert(out(3L) == ((2, 1, 0, "two mails <EMAIL> <EMAIL> one ip <IP>")))
  }

  test("topKNgrams counts grams with deterministic tie-break; short docs contribute none") {
    val df = docsDf(
      (1L, "a b c a b c"),    // "a b c"×2, "b c a", "c a b"
      (2L, "a b c x"),        // "a b c", "b c x"
      (3L, "one two"))        // < 3 tokens: no trigrams
    val out = TextAnalysis.topKNgrams(df, n = 3, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("a b c", 3L, 2L), ("b c a", 1L, 1L), ("b c x", 1L, 1L)))
  }

  test("ngramsCol is empty below n tokens and never fabricates from the descending-sequence trap") {
    val df = docsDf((1L, "solo"), (2L, "x y"))
    val out = df.select(col("doc_id"),
        size(TextAnalysis.ngramsCol(TextAnalysis.tokens(col("text")), 3)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 0, 2L -> 0))
  }

  test("rarityProjection computes exact global-frequency stats per doc") {
    val df = docsDf(
      (1L, "the the rareword"),  // the:3 total, rareword:1
      (2L, "the common common")) // common:2
    val out = TextAnalysis.rarityProjection(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("sum_tok_freq"),
          r.getAs[Long]("min_tok_freq"), r.getAs[Long]("n_hapax")))).toMap
    assert(out(1L) == ((3L, 3L + 3L + 1L, 1L, 1L)))
    assert(out(2L) == ((3L, 3L + 2L + 2L, 2L, 0L)))
  }

  test("unigramLogProb: uniform corpus scores ln(V) per token exactly") {
    // 4 distinct tokens, each appearing once: p = 1/4 for every token,
    // so avg_neg_logp = ln(4) for both docs.
    val df = docsDf((1L, "aa bb"), (2L, "cc dd"))
    val out = TextAnalysis.unigramLogProb(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_neg_logp"))
      .toMap
    assert(math.abs(out(1L) - math.log(4)) < 1e-12)
    assert(math.abs(out(2L) - math.log(4)) < 1e-12)
    // rarer tokens score higher: plant a doc of hapaxes vs repeats
    val df2 = docsDf((1L, "x x x x"), (2L, "p q r s"))
    val o2 = TextAnalysis.unigramLogProb(df2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_neg_logp"))
      .toMap
    assert(o2(2L) > o2(1L))
  }

  test("bm25TopK ranks the rare-term doc first and drops non-matches") {
    // 'needle' appears in one doc (df=1, high idf); 'common' in all.
    val df = docsDf(
      (1L, "common common common common"),
      (2L, "needle common filler filler"),
      (3L, "common filler filler filler"),
      (4L, "zebra zebra zebra zebra"))
    val out = Search.bm25TopK(df, Seq("needle", "common"), k = 10)
      .collect()
    assert(out.head.getAs[Long]("doc_id") == 2L,
      s"rare-term doc must rank first: ${out.mkString(";")}")
    // doc 4 matches neither query term -> excluded entirely
    assert(!out.exists(_.getAs[Long]("doc_id") == 4L))
    // more hits of the same term score higher under equal length
    assert(out.map(_.getAs[Long]("doc_id")).indexOf(1L) <
      out.map(_.getAs[Long]("doc_id")).indexOf(3L))
  }

  test("bm25TopK length normalization: same tf, shorter doc wins") {
    val df = docsDf(
      (1L, "hit pad pad pad pad pad pad pad pad pad pad pad"),
      (2L, "hit pad pad"),
      (3L, "pad pad pad"))
    val out = Search.bm25TopK(df, Seq("hit"), k = 5).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L, 1L))
    assert(out(0).getAs[Double]("score") > out(1).getAs[Double]("score"))
  }

  test("keywordInContext: edge-clamped windows, multiple hits per doc") {
    val df = docsDf(
      (1L, "hit a b c hit"),     // hit at both edges
      (2L, "x y z"),             // no hits
      (3L, "a hit b"))
    val out = Search.keywordInContext(df, "hit", window = 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("pos")) ->
        r.getAs[String]("snippet")).toMap
    assert(out == Map(
      (1L, 1) -> "hit a b",      // left edge clamped
      (1L, 5) -> "b c hit",      // right edge clamped
      (3L, 2) -> "a hit b"))     // both sides within bounds
  }

  test("bm25TopK and bm25TopKIndexed return identical rankings and scores") {
    val df = docsDf(
      (1L, "needle common filler pad pad"),
      (2L, "common common pad"),
      (3L, "needle needle pad pad pad pad"),
      (4L, "pad pad pad"),
      (5L, "common needle pad"))
    val a = Search.bm25TopK(df, Seq("needle", "common"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(r.length - 1))).toSeq
    val b = Search.bm25TopKIndexed(df, Seq("needle", "common"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(r.length - 1))).toSeq
    assert(a == b) // same order, bit-identical scores
  }

  test("invertedIndex: postings sorted, capped, minDf enforced") {
    val df = docsDf(
      (3L, "aa bb aa"), (1L, "aa cc"), (2L, "aa bb"))
    val out = Search.invertedIndex(df, maxPostings = 2, minDf = 2L)
      .collect()
      .map(r => r.getAs[String]("tok") ->
        ((r.getAs[Long]("doc_freq"), r.getAs[Long]("coll_freq"),
          r.getAs[String]("postings")))).toMap
    // 'aa': 3 docs / 4 occurrences, postings capped at first 2 sorted ids
    assert(out("aa") == ((3L, 4L, "1,2")))
    assert(out("bb") == ((2L, 2L, "2,3")))
    assert(!out.contains("cc")) // df=1 < minDf
  }

  test("misra_gries: guaranteed items survive eviction across partitions") {
    import spark.implicits._
    // 10k stream elements, ~2000 distinct, k=15 counters: heavy items
    // 'hot1' (2000x) and 'hot2' (1500x) have freq > N/(k+1) = 625 and
    // MUST be candidates; the long uniform tail forces constant
    // eviction in every partial
    val rows = Seq.fill(2000)("hot1") ++ Seq.fill(1500)("hot2") ++
      (0 until 6500).map(i => s"tail${i % 2000}")
    val df = new scala.util.Random(7).shuffle(rows).toDF("item")
      .repartition(8)
    val cands = df
      .agg(graft.functions.MisraGries.misra_gries(col("item"), 15))
      .collect()(0).getSeq[String](0)
    assert(cands.size <= 15)
    assert(cands.contains("hot1") && cands.contains("hot2"),
      s"guaranteed heavy items missing from $cands")
  }

  test("guaranteedHeavyHitters equals the exact HAVING answer") {
    // threshold 1/5 of N; k=9 >= fracDen/fracNum so the guarantee holds
    val df = docsDf(
      (1L, "a b c a b c a b c"),   // grams: 'a b c' x3, 'b c a' x2, 'c a b' x2
      (2L, "a b c x y z"),         // +1 'a b c', singletons elsewhere
      (3L, "q r s t u v"))
    val got = TextAnalysis.guaranteedHeavyHitters(df, n = 3,
        fracNum = 1L, fracDen = 5L, k = 9)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // N = 7 + 4 + 4 = 15 grams; threshold cnt*5 >= 15 -> cnt >= 3
    assert(got == Map("a b c" -> 4L))
  }

  test("chunkOverlap: overlapping windows, short tail, single-chunk doc") {
    val df = docsDf(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b"))                                    // shorter than width
    val out = TextAnalysis.chunkOverlap(df, width = 4, stride = 3)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_id")) ->
        ((r.getAs[String]("chunk"), r.getAs[Int]("n_chunk_tokens")))).toMap
    // starts at tokens 1, 4, 7, 10: three full-ish windows + 1-token tail
    assert(out((1L, 0)) == (("w1 w2 w3 w4", 4)))
    assert(out((1L, 1)) == (("w4 w5 w6 w7", 4))) // stride 3 < width 4: overlap
    assert(out((1L, 2)) == (("w7 w8 w9 w10", 4)))
    assert(out((1L, 3)) == (("w10", 1)))          // short tail kept
    assert(out((2L, 0)) == (("a b", 2)))          // doc shorter than width
    assert(out.size == 5)
  }

  test("embedDecontaminate drops near-eval vectors, keeps orthogonal ones") {
    import spark.implicits._
    val dim = 8
    def vec(hot: Int, v: Double = 1.0) =
      Array.tabulate(dim)(i => if (i == hot) v.toFloat else 0.0f).toSeq
    // eval vector along axis 0; corpus: a paraphrase-level copy (10),
    // a noisy near-copy (11), and orthogonal vectors (12, 13)
    val all = Seq(
      (50L, vec(0)), // eval slice: vec_id % 50 == 0
      (10L, vec(0, 0.9)),
      (11L, (vec(0, 1.0).zipWithIndex.map { case (x, i) =>
        if (i == 1) 0.2f else x }).toSeq),
      (12L, vec(3)), (13L, vec(5))
    ).toDF("vec_id", "embedding")
    val qz = Similarity.IvfQuantizer(Array(Array.tabulate(dim)(i =>
      if (i == 0) 1.0 else 0.0))) // single cell: everything comparable
    val out = Dedup.embedDecontaminate(qz,
        all.filter(col("vec_id") % 50 =!= 0),
        all.filter(col("vec_id") % 50 === 0), minCosine = 0.8)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(12L, 13L),
      s"near-eval vectors 10, 11 must be dropped, got ${out.mkString(",")}")
  }

  test("bounded_min_set == slice(sort_array(collect_set)) with O(k) state") {
    import spark.implicits._
    // 1000 distinct values per key across many partitions forces real
    // map-side partials + merges; cap at 7
    val df = (0L until 1000L).map(i => (i % 3, (i * 2654435761L) % 100000L))
      .toDF("k", "v").repartition(8)
    val got = df.groupBy("k")
      .agg(graft.functions.BoundedMinSet.bounded_min_set(col("v"), 7)
        .as("caps"))
    val want = df.groupBy("k")
      .agg(slice(sort_array(collect_set(col("v"))), 1, 7).as("caps"))
    val g = got.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val w = want.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(g == w)
    // duplicates collapse; fewer distinct values than the cap -> all
    val df2 = Seq((1L, 5L), (1L, 5L), (1L, 3L)).toDF("k", "v")
    val o2 = df2.groupBy("k")
      .agg(graft.functions.BoundedMinSet.bounded_min_set(col("v"), 7))
      .collect()(0).getSeq[Long](1)
    assert(o2 == Seq(3L, 5L))
  }

  test("temperatureMix: integer-sqrt quotas flatten the head stratum") {
    import spark.implicits._
    // strata: big=100 docs (w=10), small=4 docs (w=2) -> quotas of a
    // budget 12 split 10/2: big gets 10 (not 12*100/104≈11.5), small 2.
    val df = ((1L to 100L).map(i => (i, "big")) ++
      (101L to 104L).map(i => (i, "small"))).toDF("doc_id", "src")
    val out = Sampling.temperatureMix(df, "src", "doc_id", budget = 12L)
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("big" -> 10L, "small" -> 2L))
    // membership is a pure function of ids: re-running yields same rows
    val ids1 = out.select("doc_id").collect().map(_.getLong(0)).sorted
    val ids2 = Sampling.temperatureMix(df, "src", "doc_id", budget = 12L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids1.sameElements(ids2))
  }

  test("span dedup: overlapping dup grams merge to one maximal span") {
    import graft.dedup.SpanDedup
    val shared = (0 until 12).map(i => s"SH$i").mkString(" ")
    val df = docsDf(
      (1L, (0 until 10).map(i => s"u$i").mkString(" ") + " " + shared +
        " " + (0 until 10).map(i => s"v$i").mkString(" ")),
      (2L, shared + " " + (0 until 20).map(i => s"w$i").mkString(" ")),
      (3L, (0 until 30).map(i => s"z$i").mkString(" ")))
    val spans = SpanDedup.duplicateSpans(df, k = 4).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("span_start"),
        r.getAs[Int]("span_end"), r.getAs[Int]("span_len"),
        r.getAs[Long]("n_dup_grams"))).sortBy(_._1)
    // doc1: grams start at 11..19 (1-based), one island covering 11..22
    assert(spans.toSeq == Seq(
      (1L, 11, 22, 12, 9L), (2L, 1, 12, 12, 9L)))
  }

  test("span dedup: far-apart repeats stay separate islands") {
    import graft.dedup.SpanDedup
    val s = "p1 p2 p3 p4" // exactly k tokens -> 1 gram per occurrence
    val df = docsDf(
      (4L, s + " " + (0 until 10).map(i => s"q$i").mkString(" ") + " " + s),
      (5L, s + " " + (0 until 6).map(i => s"r$i").mkString(" ")))
    val spans = SpanDedup.duplicateSpans(df, k = 4).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("span_start"),
        r.getAs[Int]("span_end"))).sortBy(t => (t._1, t._2))
    assert(spans.toSeq == Seq((4L, 1, 4), (4L, 15, 18), (5L, 1, 4)))
  }

  test("span dedup clean: keeper doc keeps the passage, others lose it") {
    import graft.dedup.SpanDedup
    val shared = (0 until 8).map(i => s"SH$i").mkString(" ")
    val tail2 = (0 until 8).map(i => s"b$i").mkString(" ")
    val df = docsDf(
      (1L, shared + " " + (0 until 8).map(i => s"a$i").mkString(" ")),
      (2L, shared + " " + tail2),
      (3L, (0 until 16).map(i => s"c$i").mkString(" ")))
    val out = SpanDedup.spanDedupClean(df, k = 4).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("clean_text"),
        r.getAs[Long]("n_removed"), r.getAs[Long]("n_kept")))
      .sortBy(_._1)
    assert(out(0) == (1L, df.collect().map(r => r.getString(1)).head, 0L, 16L))
    assert(out(1) == (2L, tail2, 8L, 8L))
    assert(out(2)._3 == 0L) // untouched doc
  }

  test("compression ratio: repetitive < normal < random; gate bands") {
    val rep = ("spam " * 200).trim // compresses to almost nothing
    val normal = (0 until 100).map(i => s"w${i % 37} t$i").mkString(" ")
    val rnd = new scala.util.Random(7)
    val noise = Seq.fill(200)(rnd.nextInt().toHexString).mkString(" ")
    val df = docsDf((1L, rep), (2L, normal), (3L, noise))
    val out = TextAnalysis.compressionProjection(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("ratio"), r.getAs[Int]("pass"))).toMap
    assert(out(1L)._1 < out(2L)._1 && out(2L)._1 < out(3L)._1)
    assert(out(1L)._2 == 0, s"repetitive must fail the band: ${out(1L)}")
    assert(out(2L)._2 == 1 && out(3L)._2 == 1)
    // deterministic across runs
    val again = TextAnalysis.compressionProjection(df).collect()
      .map(r => r.getAs[Double]("ratio")).sorted
    assert(again.sameElements(out.values.map(_._1).toArray.sorted))
  }

  test("snapshot diff classifies added/removed/changed, drops unchanged") {
    val prev = docsDf((1L, "same"), (2L, "old text"), (3L, "gone"))
    val cur = docsDf((1L, "same"), (2L, "new text"), (4L, "fresh"))
    val out = Snapshot.diff(prev, cur).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("tokenize-to-ids: rank-1 = most frequent, order preserved") {
    val df = docsDf(
      (1L, "b a a c a"), // a:3 -> id 1; b:2 -> 2; c:1 -> 3
      (2L, "b c a a a a")) // a:7 total... recount below
    // global counts: a=7, b=2, c=2 -> a->1, b->2 (tie b<c), c->3
    val out = TextAnalysis.tokenizeToIds(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("ids"), r.getAs[Long]("n_tokens"))).toMap
    assert(out(1L) == ("2,1,1,3,1", 5L))
    assert(out(2L) == ("2,3,1,1,1,1", 6L))
  }

  test("tokenize-to-ids: two-phase distributed rank == global row_number") {
    // A corpus whose vocab spans many range partitions, with frequency
    // ties, so the partition-offset arithmetic and the (c desc, tok)
    // tie-break are both exercised.
    val rows = (1L to 60L).map { i =>
      val words = (0 until (i % 9 + 2).toInt)
        .map(j => s"w${(i * 31 + j * 17) % 41}")
      (i, words.mkString(" "))
    }
    val df = docsDf(rows: _*)
    val twoPhase = TextAnalysis.tokenizeToIds(df).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    // reference: the naive single-partition global rank
    import org.apache.spark.sql.expressions.Window
    val vocab = df.select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .withColumn("id", row_number().over(
        Window.partitionBy(lit(0)).orderBy(col("c").desc, col("tok"))))
      .select("tok", "id")
    val naive = df.select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))))
      .select(col("doc_id"), col("pos"), col("col").as("tok"))
      .join(vocab, Seq("tok"))
      .groupBy("doc_id")
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("id")))),
          x => x.getField("id")), ",").as("ids"),
        count(lit(1)).cast("long").as("n_tokens"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(twoPhase.sameElements(naive))
  }

  test("incremental dedup: corpus dup beats batch dup beats new") {
    val corpus = docsDf((1L, "seen before"), (2L, "other old"))
    val incoming = docsDf(
      (10L, "seen before"), // digest already in corpus -> dup_corpus
      (11L, "fresh text"), // new
      (12L, "fresh text"), // same text, higher id -> dup_batch
      (13L, "unique here")) // new
    val out = Dedup.incrementalDedup(corpus, incoming).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(10L -> "dup_corpus", 11L -> "new",
      12L -> "dup_batch", 13L -> "new"))
  }

  test("snapshot diff: null-text rows are present, not added/removed") {
    import spark.implicits._
    val prev = Seq((1L, Option.empty[String]), (2L, Option("x")),
      (3L, Option.empty[String])).toDF("doc_id", "text")
    val cur = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (4L, Option("y"))).toDF("doc_id", "text")
    val out = Snapshot.diff(prev, cur).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1: null -> null = unchanged (absent); 2: text -> null = changed;
    // 3: present-with-null -> absent = removed; 4 = added
    assert(out == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("null-text rows survive the dedup ops with exactDedup's semantics") {
    import spark.implicits._
    val withNulls = Seq((1L, Option("a b")), (2L, Option.empty[String]),
      (3L, Option.empty[String]), (4L, Option(""))).toDF("doc_id", "text")
    // exactDedup groups all null texts as ONE family (groupBy is
    // null-safe): keeper 2, two copies
    val fam = Dedup.exactDedup(withNulls).collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    assert(fam(2L) == 2L && fam(1L) == 1L && fam(4L) == 1L)
    // incrementalDedup must agree — null-text docs are NOT silently
    // dropped (a plain equi join on the null hash would lose them)
    val corpus = Seq((10L, Option.empty[String])).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(corpus, withNulls).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(2L) == "dup_corpus" && out(3L) == "dup_corpus")
    assert(out(1L) == "new" && out(4L) == "new")
  }

  test("digest store: materialized path == recompute path; append cycle") {
    import graft.io.DigestStore
    val corpus = docsDf((1L, "old a"), (2L, "old b"))
    val batch1 = docsDf((10L, "old a"), (11L, "fresh"), (12L, "fresh"))
    val stored = DigestStore.digests(corpus)
    val viaStore = DigestStore.incrementalDedup(stored, batch1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaRecompute = Dedup.incrementalDedup(corpus, batch1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaStore == viaRecompute)
    assert(viaStore == Map(10L -> "dup_corpus", 11L -> "new",
      12L -> "dup_batch"))
    // append the accepted digests; the next ingest sees them as corpus
    val verdicts = DigestStore.incrementalDedup(stored, batch1)
    val grown = stored.union(
      DigestStore.acceptedDigests(batch1, verdicts))
    val batch2 = docsDf((20L, "fresh"), (21L, "newer"))
    val round2 = DigestStore.incrementalDedup(grown, batch2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(round2 == Map(20L -> "dup_corpus", 21L -> "new"))
  }

  test("incremental dedup agrees with whole-corpus dedup (ingest algebra)") {
    // Splitting a corpus into (already-deduped corpus, incoming batch)
    // and running incrementalDedup must keep exactly the docs that
    // exactDedup over the union would keep, PROVIDED corpus ids precede
    // batch ids (the min-id keeper's order assumption at ingest time).
    val texts = (1L to 40L).map(i => (i, s"text ${(i * 7) % 13}"))
    val (corpusRows, batchRows) = texts.partition(_._1 <= 25)
    val corpus0 = docsDf(corpusRows: _*)
    val batch = docsDf(batchRows: _*)
    // corpus is itself deduped first (the bootstrap invariant)
    val corpusKeep = Dedup.exactDedup(corpus0)
      .select(col("keep_id").as("doc_id"))
    val corpus = corpus0.join(corpusKeep, "doc_id")
    val incrementalKept = corpus.select("doc_id").collect().map(_.getLong(0)).toSet ++
      Dedup.incrementalDedup(corpus, batch)
        .filter(col("status") === "new").collect().map(_.getLong(0)).toSet
    val unionKept = Dedup.exactDedup(docsDf(texts: _*))
      .collect().map(_.getAs[Long]("keep_id")).toSet
    assert(incrementalKept == unionKept)
  }

  test("canonicalUrl: scheme/www/query/trailing-slash cascade, in order") {
    import spark.implicits._
    val cases = Seq(
      "https://www.Ex.COM/a/b?q=1" -> "ex.com/a/b",
      "http://ex.org/" -> "ex.org",
      "HTTPS://WWW.EX.COM" -> "ex.com",
      "ex.com/p/" -> "ex.com/p",
      "www.ex.com?x" -> "ex.com",
      // www not at the start survives; only one trailing slash strips
      "https://sub.www.ex.com//" -> "sub.www.ex.com/")
    val out = cases.map(_._1).toDF("u")
      .select(TextAnalysis.canonicalUrl(col("u"))).as[String].collect()
    assert(out.toSeq == cases.map(_._2))
    val dom = Seq("ex.com/a/b", "ex.org").toDF("c")
      .select(TextAnalysis.domainOf(col("c"))).as[String].collect()
    assert(dom.toSeq == Seq("ex.com", "ex.org"))
  }

  test("tfIdfTopK ranks rare-but-frequent terms first, ties by term") {
    val df = docsDf(
      (1L, "zeta zeta zeta common common"), // zeta only here: tf3/df1
      (2L, "common common alpha"), // alpha only here: tf1/df1
      (3L, "common zzz zzz")) // zzz only here: tf2/df1
    val out = TextAnalysis.tfIdfTopK(df, k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(4)) -> r.getString(1)).toMap
    assert(out((1L, 1)) == "zeta") // 3/1 beats common 2/3
    assert(out((2L, 1)) == "alpha") // 1/1 beats common 2/3
    assert(out((3L, 1)) == "zzz")
    assert(out((1L, 2)) == "common")
  }

  test("bloom decontamination flags exact members; never misses one") {
    import graft.dedup.Dedup
    val evalText = (0 until 30).map(i => s"e$i").mkString(" ")
    val df = docsDf(
      (100L, evalText), // eval slice member (id % 2 == 0)
      (1L, evalText), // corpus copy of an eval doc -> must be flagged
      (3L, (0 until 30).map(i => s"x$i").mkString(" ")),
      (5L, (0 until 30).map(i => s"y$i").mkString(" ")))
    val out = Dedup.bloomDecontaminate(df, col("doc_id") % 2 === 0,
        bitsPerKey = 4096, j = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("exact")))
    assert(out.contains((1L, 1)), s"got ${out.mkString(",")}")
    // wide filter: no FPs expected among the two clean docs
    assert(out.forall(_._2 == 1))
  }

  test("bloom probe (stream shape) agrees with the aggregate form") {
    import graft.dedup.Dedup
    val evalText = (0 until 30).map(i => s"e$i").mkString(" ")
    val df = docsDf(
      (100L, evalText),
      (1L, evalText),
      (3L, (0 until 30).map(i => s"x$i").mkString(" ")),
      (5L, (0 until 30).map(i => s"y$i").mkString(" ")))
    val isEval = col("doc_id") % 2 === 0
    val agg = Dedup.bloomDecontaminate(df, isEval, bitsPerKey = 64, j = 3)
      .select("doc_id", "exact").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val probe = Dedup.bloomProbe(df.filter(!isEval),
        Dedup.bloomBroadcastRow(df.filter(isEval), bitsPerKey = 64, j = 3),
        j = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(agg == probe && probe.contains((1L, 1)))
  }

  test("weighted sample: deterministic, biased toward heavy weights") {
    import spark.implicits._
    val df = ((1L to 100L).map(i => (i, 1000L)) ++
      (101L to 200L).map(i => (i, 1L))).toDF("doc_id", "w")
    val top = Sampling.weightedSample(df, "doc_id", "w", k = 50)
      .select("doc_id").collect().map(_.getLong(0))
    assert(top.length == 50)
    assert(top.count(_ <= 100L) >= 45, // ES keys: u^(1/1000) >> u^1
      s"only ${top.count(_ <= 100L)} heavy rows sampled")
    val again = Sampling.weightedSample(df, "doc_id", "w", k = 50)
      .select("doc_id").collect().map(_.getLong(0))
    assert(top.sorted.sameElements(again.sorted))
  }

  test("count-min: estimates dominate exact counts; wide sketch exact") {
    import graft.functions.CountMin
    val df = docsDf(
      (1L, (0 until 40).map(i => s"w${i % 10}").mkString(" ")),
      (2L, (0 until 30).map(i => s"w${i % 6}").mkString(" ")))
    // tiny width forces collisions -> strictly one-sided overcounts
    val narrow = CountMin.estimates(df, d = 2, w = 4).collect()
      .map(r => (r.getAs[Long]("est_count"), r.getAs[Long]("exact_cnt")))
    assert(narrow.nonEmpty && narrow.forall { case (e, x) => e >= x })
    assert(narrow.exists { case (e, x) => e > x }, "w=4 must collide")
    // generous width: every estimate exact (10 tokens in 4096 buckets)
    val wide = CountMin.estimates(df, d = 4, w = 4096).collect()
      .map(r => (r.getAs[Long]("est_count"), r.getAs[Long]("exact_cnt")))
    assert(wide.forall { case (e, x) => e == x })
  }

  test("span dup share: coverage ratio, zero for clean docs") {
    import graft.dedup.SpanDedup
    val shared = (0 until 8).map(i => s"SH$i").mkString(" ")
    val df = docsDf(
      (1L, shared + " " + (0 until 8).map(i => s"a$i").mkString(" ")),
      (2L, shared + " " + (0 until 8).map(i => s"b$i").mkString(" ")),
      (3L, (0 until 16).map(i => s"c$i").mkString(" ")))
    val out = SpanDedup.spanDupShare(df, k = 4).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens"),
        r.getAs[Long]("dup_tokens"), r.getAs[Double]("dup_share")))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 16, 8L, 0.5), (2L, 16, 8L, 0.5), (3L, 16, 0L, 0.0)))
  }

  test("intraDocClean: repeated windows drop, firsts survive, shorts pass") {
    val df = docsDf(
      (1L, "A B C D x A B C D y"), // gram repeats at pos 6 -> drop 6..9
      (2L, "p q r s t u"),         // no repeats -> untouched
      (3L, "a b c"),               // shorter than k -> no grams
      (4L, "a a a a a a"))         // overlapping dups -> only pos 1 kept
    val out = Dedup.intraDocClean(df, k = 4).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens"),
        r.getAs[Long]("n_dropped"), r.getAs[String]("text_clean")))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 10, 4L, "A B C D x y"),
      (2L, 6, 0L, "p q r s t u"),
      (3L, 3, 0L, "a b c"),
      (4L, 6, 5L, "a")))
  }

  test("keeperByQuality: best-scoring member wins, overriding min-id") {
    import spark.implicits._
    // cluster {1,2,3}: doc 3 has the best score -> keeper despite max id;
    // singleton 9 is its own keeper
    val comp = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("doc_id", "cluster_id")
    val scores = Seq((1L, 0.2), (2L, 0.5), (3L, 0.9), (9L, 0.1))
      .toDF("doc_id", "quality_score")
    val out = Dedup.keeperByQuality(comp, scores).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("is_keep")).toMap
    assert(out == Map(1L -> 0, 2L -> 0, 3L -> 1, 9L -> 1))
    // tie on score -> lower id wins
    val tied = Dedup.keeperByQuality(comp,
      Seq((1L, 0.5), (2L, 0.5), (3L, 0.5), (9L, 0.1))
        .toDF("doc_id", "quality_score")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("is_keep")).toMap
    assert(tied == Map(1L -> 1, 2L -> 0, 3L -> 0, 9L -> 1))
  }

  test("kmeans: refits tighten clusters, partition the corpus, determinism") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val rows = for {
      c <- 0 until 6
      m <- 0 until 15
    } yield {
      val center = Array.tabulate(16)(d => math.sin(c * 31 + d).toFloat * 4)
      val vec = center.map(x => x + rnd.nextGaussian().toFloat * 0.2f)
      ((c * 15 + m).toLong, vec.toSeq, c)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val a0 = Similarity.kmeansAssign(df, k = 6, iters = 0).collect()
    val a2 = Similarity.kmeansAssign(df, k = 6, iters = 2).collect()
    val a2b = Similarity.kmeansAssign(df, k = 6, iters = 2).collect()
    // every vector assigned exactly once to a valid cell
    assert(a2.length == rows.length)
    assert(a2.forall(r => (0 until 6).contains(r.getAs[Int]("cell"))))
    // deterministic across runs
    assert(a2.map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq ==
      a2b.map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq)
    // Lloyd monotonicity: refitting can only shrink the total
    // within-cluster SS (1e-2 slack for the 1e-6 centroid rounding)
    val wcss0 = a0.map(_.getAs[Double]("d2")).sum
    val wcss2 = a2.map(_.getAs[Double]("d2")).sum
    assert(wcss2 <= wcss0 + 1e-2, s"WCSS grew: $wcss0 -> $wcss2")
    // planted structure: refits should leave most true clusters pure
    // (sample init can seed two centers inside one cluster, so exact
    // recovery of all 6 is not a k-means guarantee)
    val pure = a2.map(r => (r.getLong(0) / 15, r.getInt(1)))
      .groupBy(_._1).values.count(g => g.map(_._2).distinct.length == 1)
    assert(pure >= 4, s"only $pure/6 planted clusters pure after refit")
  }

  test("budgetSelect: two-phase prefix sum equals the naive global window") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val df = (1L to 200L).map { id =>
      (id, math.floor(rnd.nextDouble() * 100) / 100, rnd.nextInt(50) + 1L)
    }.toDF("doc_id", "score", "n_tok").repartition(7)
    val got = Sampling.budgetSelect(df, "doc_id", "score", "n_tok", 900L)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("cum_tokens"))).sortBy(_._1)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val naive = df.withColumn("cum_tokens", sum(col("n_tok")).over(w))
      .filter(col("cum_tokens") <= 900L)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("cum_tokens"))).sortBy(_._1)
    assert(got.toSeq == naive.toSeq)
    assert(got.nonEmpty && got.map(_._2).max <= 900L)
    // maximality: the next-ranked doc would blow the budget
    assert(naive.length < 200)
  }

  test("ngramContainmentPairs: quoted sub-doc found where Jaccard misses") {
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val article = ((1 to 50).map(i => s"a$i") ++ (1 to 12).map(i => s"q$i")
      ++ (1 to 30).map(i => s"b$i")).mkString(" ")
    val df = docsDf((1L, quote), (2L, article), (3L, "x y z"))
    val got = Dedup.ngramContainmentPairs(df, n = 3, minContainment = 0.9)
      .collect().map(r => (r.getAs[Long]("doc_sub"),
        r.getAs[Long]("doc_super"), r.getAs[Double]("containment")))
    // every quote trigram appears verbatim inside the article
    assert(got.toSeq == Seq((1L, 2L, 1.0)))
    // the symmetric relation scores this pair near zero — asymmetry is
    // the whole point
    assert(Dedup.ngramJaccardPairs(df, n = 3, minJaccard = 0.8).count() == 0)
  }

  test("winnowPairs: shared runs pair up; boilerplate df-cap prunes") {
    // docs 1 and 2 share a 10-token run (>= w+k-1 = 6): the winnowing
    // guarantee forces a shared fingerprint, so the pair must surface
    val run = (1 to 10).map(i => s"s$i").mkString(" ")
    val df = docsDf(
      (1L, s"a1 a2 a3 a4 $run a5 a6 a7 a8"),
      (2L, s"b1 b2 b3 $run b4 b5 b6 b7 b8"),
      (3L, (1 to 20).map(i => s"c$i").mkString(" ")))
    val got = Dedup.winnowPairs(df, k = 3, w = 4, minShared = 1,
      maxDocFreq = 64).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(got == Set((1L, 2L)))
    // a df cap of 1 kills every cross-doc fingerprint — no pairs at all
    assert(Dedup.winnowPairs(df, 3, 4, minShared = 1,
      maxDocFreq = 1).count() == 0)
  }

  test("incrementalNearDup: corpus match beats batch match beats new") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearBase = ((1 to 39).map(i => s"w$i") :+ "zz").mkString(" ")
    val fresh = (1 to 40).map(i => s"u$i").mkString(" ")
    val corpus = docsDf((1L, base), (2L, (1 to 40).map(i => s"c$i").mkString(" ")))
    // 10: near-dups corpus doc 1; 11/12: near-dup each other (12 keeps
    // 11, the smaller id); 13: nothing like it -> new
    val incoming = docsDf(
      (10L, nearBase),
      (11L, fresh), (12L, ((1 to 39).map(i => s"u$i") :+ "q").mkString(" ")),
      (13L, (1 to 40).map(i => s"x$i").mkString(" ")))
    val got = Dedup.incrementalNearDup(Dedup.signatures(corpus), incoming)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("status"), Option(r.getAs[Any]("match_id")))))
      .toMap
    assert(got(10L)._1 == "near_dup_corpus" && got(10L)._2.contains(1L))
    assert(got(11L)._1 == "new") // smaller id keeps
    assert(got(12L)._1 == "near_dup_batch" && got(12L)._2.contains(11L))
    assert(got(13L)._1 == "new" && got(13L)._2.isEmpty)
    // per-ingest state contract: the corpus side was consumed as
    // signatures only (no text column touched)
    val sigOnly = Dedup.signatures(corpus).select("doc_id", "sig")
    assert(Dedup.incrementalNearDup(sigOnly, incoming).count() == 4)
  }

  test("ngramContainmentPairs: maxDocFreq drops hot-gram-only candidates") {
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val article = ((1 to 50).map(i => s"a$i") ++ (1 to 12).map(i => s"q$i")
      ++ (1 to 30).map(i => s"b$i")).mkString(" ")
    // 5 clones of one hot text: every gram of the clones has df = 5
    val hot = (1 to 10).map(i => s"h$i").mkString(" ")
    val df = docsDf(Seq((1L, quote), (2L, article)) ++
      (10L to 14L).map(id => (id, hot)): _*)
    // cap 5 keeps everything: capped == uncapped
    val capped5 = Dedup.ngramContainmentPairs(df, 3, 0.9, Some(5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = Dedup.ngramContainmentPairs(df, 3, 0.9, None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped5 == uncapped)
    assert(uncapped.contains((1L, 2L)))
    // cap 4 excises the df-5 clone grams from candidate generation:
    // the clone pairs disappear (their ENTIRE prefix is hot — the
    // documented bounded-recall trade), the quote pair survives
    val capped4 = Dedup.ngramContainmentPairs(df, 3, 0.9, Some(4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped4.contains((1L, 2L)))
    assert(!capped4.exists { case (a, b) => a >= 10L && b >= 10L })
    assert(capped4.subsetOf(uncapped))
  }

  test("pairMargin: clean anchors score +1e4, label noise scores -1e4") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), 0), // clean: twin v2, orthogonal negatives
      (2L, Seq(1.0f, 0.0f), 0),
      (3L, Seq(0.0f, 1.0f), 1), // no same-label partner -> dropped
      (4L, Seq(0.0f, 1.0f), 0)  // label noise: nearest same-label is far
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.pairMargin(
        Similarity.hashSampledQuantizer(df, nlist = 1), df)
      .collect().map(r => r.getAs[Long]("anchor_id") ->
        ((r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
          r.getAs[Long]("margin_u")))).toMap
    assert(got.keySet == Set(1L, 2L, 4L)) // v3 has no positive partner
    assert(got(1L) == ((2L, 1L, 10000L)))
    assert(got(2L) == ((2L, 1L, 10000L)))
    // v4's best same-label cosine is 0, best different-label is 1
    assert(got(4L) == ((2L, 1L, -10000L)))
  }

  test("centroidAffinity: identical slices cosine 1, orthogonal 0") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 1), // label 1 ≡ label 0
      (3L, Seq(0.0f, 2.0f, 0.0f, 0.0f), 2)  // orthogonal
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidAffinity(df).collect()
      .map(r => (r.getAs[Int]("label_a"), r.getAs[Int]("label_b"),
        r.getAs[Double]("cosine"))).sortBy(p => (p._1, p._2))
    assert(got.toSeq == Seq((0, 1, 1.0), (0, 2, 0.0), (1, 2, 0.0)))
  }

  test("normAudit: planted outliers flip exactly the right flags") {
    import spark.implicits._
    val unit = Seq(1.0f, 0.0f, 0.0f)
    val rows = (1L to 8L).map(i => (i, unit, 0)) ++ Seq(
      (9L, Seq(10.0f, 0.0f, 0.0f), 0),  // 10× median -> hi
      (10L, Seq(0.1f, 0.0f, 0.0f), 0))  // 0.1× median -> lo
    val got = Similarity.normAudit(rows.toDF("vec_id", "embedding", "label"))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("norm_u"), r.getAs[Int]("outlier_hi"),
          r.getAs[Int]("outlier_lo")))).toMap
    assert(got(1L) == ((10000L, 0, 0)))
    assert(got(9L) == ((100000L, 1, 0)))
    assert(got(10L) == ((1000L, 0, 1)))
    // exactly one hi and one lo across the corpus
    assert(got.values.map(_._2).sum == 1 && got.values.map(_._3).sum == 1)
  }

  test("vocabGrowth: hand curve; one shared exchange (AQE stage reuse)") {
    val df = docsDf(
      (0L, "a b"), (1L, "a c"), (2L, "a d"), (3L, "e e"))
    // m = max+1 = 4, buckets = 2: ids 0,1 -> bucket 0; ids 2,3 -> bucket 1
    val out = TextAnalysis.vocabGrowth(df, buckets = 2)
    val rows = out.collect()
      .map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("cum_tokens"),
        r.getAs[Long]("cum_vocab"))).sortBy(_._1)
    // bucket0 tokens a,b,a,c: 4 tokens, first-sights {a,b,c};
    // bucket1 tokens a,d,e,e: +4 tokens, first-sights {d,e}
    assert(rows.toSeq == Seq((0, 4L, 3L), (1, 8L, 5L)))
    // both bucket tables must come from ONE (tok,bucket) aggregate:
    // AQE reuses the materialized shuffle stage on the second branch
    assert(out.queryExecution.executedPlan.toString.contains("Reused"),
      "expected AQE stage reuse of the shared (tok, bucket) exchange")
  }

  test("zipfSlope: near -1 on a 1/r corpus, exact rank count") {
    import spark.implicits._
    // token t_r appears round(600/r) times: ln(c) vs ln(rank) slope ~ -1
    val toks = (1 to 12).flatMap(r => Seq.fill(math.round(600.0 / r).toInt)(s"t$r"))
    val df = toks.grouped(25).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val r = TextAnalysis.zipfSlope(df, k = 12).collect()(0)
    val slope = r.getAs[Double]("zipf_slope")
    assert(r.getAs[Long]("n_ranks") == 12L)
    assert(slope > -1.05 && slope < -0.95, s"slope $slope not ~ -1")
  }

  test("epochMix: integer copies exact, remainder bounded, deterministic") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, s"src${i % 8}"))
      .toDF("doc_id", "source")
    val wtSql = "CASE CAST(substring(source, 4) AS INT) % 4 " +
      "WHEN 0 THEN 4 WHEN 1 THEN 10 WHEN 2 THEN 17 ELSE 25 END"
    val out = Sampling.epochMix(df, "doc_id", wtSql)
      .select("doc_id", "source", "n_copies", "copy").collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    // copies enumerate 1..n_copies exactly once
    byDoc.foreach { case (_, rs) =>
      val n = rs.head.getAs[Int]("n_copies")
      assert(rs.map(_.getAs[Int]("copy")).sorted.toSeq == (1 to n))
    }
    // per-weight copy counts: floor(w) or floor(w)+1; wt=10 exactly 1
    def copies(srcMod: Int): Seq[Int] =
      out.filter(r => r.getAs[String]("source").drop(3).toInt % 4 == srcMod)
        .groupBy(_.getAs[Long]("doc_id")).values
        .map(_.head.getAs[Int]("n_copies")).toSeq
    assert(copies(1).forall(_ == 1)) // 1.0 epochs
    assert(copies(0).forall(n => n == 1)) // 0.4 epochs: survivors have 1
    assert(copies(2).forall(n => n == 1 || n == 2)) // 1.7 epochs
    assert(copies(3).forall(n => n == 2 || n == 3)) // 2.5 epochs
    // 0.4-epoch sources DOWN-sample: some docs drop entirely
    val src0Docs = (1L to 400L).filter(i => i % 8 % 4 == 0)
    assert(copies(0).length < src0Docs.length)
    // pure function of the ids: a second run is identical
    val again = Sampling.epochMix(df, "doc_id", wtSql)
      .select("doc_id", "source", "n_copies", "copy").collect()
    assert(out.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("sign random projection matches a brute-force sign matrix") {
    import spark.implicits._
    import graft.functions.SplitMix64
    val vecs = Seq(
      (1L, Array(1.0f, -2.0f, 0.5f, 0.0f), 0),
      (2L, Array(0.25f, 0.25f, -1.0f, 3.0f), 1))
    val df = vecs.toDF("vec_id", "embedding", "label")
    val outDims = 2
    val got = Similarity.signRandomProjection(df, outDims, dims = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == vecs.size * outDims)
    for ((id, e, _) <- vecs; k <- 0 until outDims) {
      val expected = e.indices.map { j =>
        val sgn = if (SplitMix64.mix(j.toLong * outDims + k) >= 0) 1L else -1L
        sgn * math.floor(e(j).toDouble * 10000 + 0.5).toLong
      }.sum
      assert(got((id, k.toLong)) == expected, s"vec $id comp $k")
    }
  }

  test("pcaTop1: axis-aligned variance converges to the dominant axis") {
    import spark.implicits._
    // zero-mean, axis-aligned: var(dim1) = 100 dominates var(dim2) = 1;
    // dims 3 and 4 are constant zero. Hand-traced integer iteration:
    // C_u = diag(1e6, 1e4, 0, 0) -> v after 3 rounds = (1e6, 1, 0, 0)
    val df = Seq(
      (1L, Array(10.0f, 1.0f, 0.0f, 0.0f), 0),
      (2L, Array(-10.0f, 1.0f, 0.0f, 0.0f), 0),
      (3L, Array(10.0f, -1.0f, 0.0f, 0.0f), 0),
      (4L, Array(-10.0f, -1.0f, 0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val v = Similarity.pcaTop1(df, iters = 3, dims = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v == Map(1L -> 1000000L, 2L -> 1L, 3L -> 0L, 4L -> 0L))
    // anisotropy on the same fixture: var = diag(100, 1, 0, 0) so the
    // top axis explains ~100/101 of total variance = 990099 ppm (the
    // residual 1e-6-scale v2 component perturbs below the ppm floor)
    val a = Similarity.anisotropy(df, iters = 3, dims = 4).collect().head
    assert(a.getAs[Long]("share_ppm") == 990099L)
    assert(a.getAs[Long]("trace_s") > 0L)
  }

  test("kmeansSilhouette: ppm bounds, coverage, and separation on " +
      "two tight blobs") {
    import spark.implicits._
    val blobA = (0 until 4).map(i => (i.toLong,
      Array(0.0f + i * 0.01f, 0.0f, 0.0f, 0.0f), 0))
    val blobB = (0 until 4).map(i => (10L + i,
      Array(10.0f, 10.0f + i * 0.01f, 0.0f, 0.0f), 1))
    val df = (blobA ++ blobB).toDF("vec_id", "embedding", "label")
    val rows = Similarity.kmeansSilhouette(df, k = 2, iters = 2).collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == 8L)
    rows.foreach { r =>
      val (mn, mean, mx) = (r.getAs[Long]("min_s_ppm"),
        r.getAs[Long]("mean_s_ppm"), r.getAs[Long]("max_s_ppm"))
      assert(mn >= 0L && mn <= mean && mean <= mx && mx <= 1000000L)
    }
    // well-separated blobs: after 2 refits both cells score near 1
    assert(rows.forall(_.getAs[Long]("mean_s_ppm") > 900000L))
  }

  test("gateKappa: hand 2x2 table gives kappa 0 (chance-level) and " +
      "a perfectly-agreeing source gives 10^6 ppm") {
    import spark.implicits._
    // s1: one doc per 2x2 cell -> po = pe = 0.5 -> kappa exactly 0.
    val passBoth = "the cat sat on a mat with some very fine hats today"
    val failBoth = "x y z"
    // 20 tokens, exactly 2 three-letter stopwords: gopher passes,
    // score = 0.1*2.5*0.5 + (3/8)*0.5 = 0.3125 < 0.5 fails
    val gopherOnly = "the and cat dog pig cow fox hen bat rat owl ant " +
      "bee elk yak ape asp cod eel emu"
    // 5 long words (n < 10 fails gopher), stop ratio 0.4 and mean
    // token length 7.8 push the score to 0.9875 >= 0.5
    val scoreOnly = "absolutely the magnificent of extraordinary"
    val df = Seq(
      (0L, passBoth, "s1"), (1L, failBoth, "s1"),
      (2L, gopherOnly, "s1"), (3L, scoreOnly, "s1"),
      (4L, passBoth, "s2"), (5L, failBoth, "s2"))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.gateKappa(df).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    val s1 = r("s1")
    assert(s1.getAs[Long]("n_pass_gopher") == 2L)
    assert(s1.getAs[Long]("n_pass_score") == 2L)
    assert(s1.getAs[Long]("n_agree") == 2L)
    assert(s1.getAs[Long]("agree_ppm") == 500000L)
    assert(s1.getAs[Long]("kappa_ppm") == 0L)
    val s2 = r("s2")
    assert(s2.getAs[Long]("n_agree") == 2L)
    assert(s2.getAs[Long]("kappa_ppm") == 1000000L)
  }

  test("sim_ivf_probe_curve: recall is monotone in nprobe and every " +
      "query is audited") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pc_embs").toString
    val rnd = new scala.util.Random(3)
    (0 until 40).map { i =>
      val c = if (i % 2 == 0) 0.0f else 10.0f
      (i.toLong, Array(c + rnd.nextFloat(), c + rnd.nextFloat(),
        rnd.nextFloat(), rnd.nextFloat()), i % 2)
    }.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val rows = SimQueries.queries("sim_ivf_probe_curve")(spark, dir)
      .collect().sortBy(_.getAs[Int]("nprobe"))
    assert(rows.map(_.getAs[Int]("nprobe")).toSeq == Seq(1, 2, 4, 8))
    assert(rows.forall(_.getAs[Long]("n_queries") == 20L))
    val rec = rows.map(_.getAs[Long]("recall_ppm")).toSeq
    assert(rec.zip(rec.tail).forall { case (a, b) => a <= b })
  }

  test("frameOverlapPairs: shared frames pair up with containment " +
      "ppm; the df cap drops the boilerplate frame") {
    import spark.implicits._
    def media(rows: (Long, String)*) = rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("text/fake").as("media_type"),
        octet_length(col("text").cast("binary")).as("n_bytes"))
    // frames of 4 bytes, every frame sampled: docs 0/1 share
    // AAAA+BBBB+CCCC (AAAA also in doc 2 -> df 3)
    val m = media((0L, "AAAABBBBCCCC"), (1L, "AAAABBBBCCCCDDDD"),
      (2L, "AAAAZZZZ"))
    val un = Multimodal.frameOverlapPairs(m, 4, 1, minShared = 2)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_shared"), r.getAs[Long]("overlap_ppm")))
    // uncapped: (0,1) share 3 of min(3,4) fps -> 1e6 exactly
    assert(un.toSeq == Seq((0L, 1L, 3L, 1000000L)))
    val capped = Multimodal.frameOverlapPairs(m, 4, 1, minShared = 2,
      maxDocFreq = Some(2)).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_shared")))
    // AAAA (df 3) leaves candidate generation; BBBB+CCCC remain
    assert(capped.toSeq == Seq((0L, 1L, 2L)))
  }

  test("jaccardThresholdCurve: exact-dup and J=0.6 pairs land in " +
      "buckets 10 and 6 with a top-down cumulative") {
    val df = docsDf(
      (0L, "x y z w v u"), (1L, "x y z w v u"),     // J = 1 -> bucket 10
      (2L, "a b c d e f"), (3L, "a b c d e g"))     // 3/5 -> bucket 6
    val rows = Dedup.jaccardThresholdCurve(df, n = 3, minJaccard = 0.5)
      .collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("cum_pairs")))).toMap
    assert(rows == Map(10L -> ((1L, 1L)), 6L -> ((1L, 2L))))
    // a permissive cap keeps every pair (prefix dfs here are <= 2)...
    val capped = Dedup.jaccardThresholdCurve(df, n = 3, minJaccard = 0.5,
      maxDocFreq = Some(16)).collect()
    assert(capped.length == 2)
    // ...while a cap below the duplicate family's df demonstrates the
    // bounded-recall trade: three identical docs make every gram df 3,
    // so cap=2 removes the whole family from candidate generation
    val tri = docsDf((0L, "x y z w v u"), (1L, "x y z w v u"),
      (2L, "x y z w v u"))
    assert(Dedup.jaccardThresholdCurve(tri, 3, 0.5, Some(2)).count() == 0L)
    assert(Dedup.jaccardThresholdCurve(tri, 3, 0.5, None).count() == 1L)
  }

  test("dd_minhash_recall: an exact duplicate pair is found (recall " +
      "10^6 ppm), disjoint docs contribute nothing") {
    import spark.implicits._
    val dup = (0 until 40).map(i => s"tok$i").mkString(" ")
    val other = (0 until 40).map(i => s"zzz$i").mkString(" ")
    val far = (0 until 40).map(i => s"qqq$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("mr_docs").toString
    Seq((0L, dup), (1L, dup), (2L, other), (3L, far))
      .map { case (id, t) => (id, t, "en", "s", t.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val r = DedupQueries.queries("dd_minhash_recall")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n_truth") == 1L)
    assert(r.getAs[Long]("n_hit") == 1L)
    assert(r.getAs[Long]("recall_ppm") == 1000000L)
    assert(r.getAs[Long]("precision_ppm") == 1000000L)
  }

  test("t_quality_calibration: hand scores land in the right bins " +
      "with the exact integer Brier") {
    import spark.implicits._
    // the four gateKappa fixture texts have known score_u values
    // 6250 / 625 / 3125 / 9875 -> bins 6 / 0 / 3 / 9
    val passBoth = "the cat sat on a mat with some very fine hats today"
    val failBoth = "x y z"
    val gopherOnly = "the and cat dog pig cow fox hen bat rat owl ant " +
      "bee elk yak ape asp cod eel emu"
    val scoreOnly = "absolutely the magnificent of extraordinary"
    val dir = java.nio.file.Files.createTempDirectory("cal_docs").toString
    Seq((0L, passBoth, "en"), (1L, failBoth, "xx"),
      (2L, gopherOnly, "en"), (3L, scoreOnly, "xx"))
      .map { case (id, t, lang) => (id, t, lang, "s1", t.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = TextQueries.queries("t_quality_calibration")(spark, dir)
      .collect().map(r => r.getAs[Int]("bin") ->
        ((r.getAs[Long]("n_pos"), r.getAs[Long]("pos_ppm"),
          r.getAs[Long]("bin_score_u"), r.getAs[Long]("brier_e8")))).toMap
    // Brier = (3750^2 + 625^2 + 6875^2 + 9875^2) div 4 = 39808593
    assert(rows(6) == ((1L, 1000000L, 6250L, 39808593L)))
    assert(rows(0) == ((0L, 0L, 625L, 39808593L)))
    assert(rows(3) == ((1L, 1000000L, 3125L, 39808593L)))
    assert(rows(9) == ((0L, 0L, 9875L, 39808593L)))
  }

  test("truncationRecall: planted prefix-blind neighbor costs exactly " +
      "one hit") {
    import spark.implicits._
    // query v0; full top-2 = {v1, v3} (cos 1.0, 0.707) but the 2-dim
    // prefix ranks v2 (prefix-parallel, cos 1.0) above v3 (0.707):
    // prefix top-2 = {v1, v2} -> overlap 1 of 2
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.0f, 1.0f, 0.0f)),
      (3L, Array(0.5f, 0.5f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val rows = Similarity.truncationRecall(df, prefixDims = 2, k = 2,
      nQueries = 1).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Int]("n_hits") == 1)
    assert(rows.head.getAs[Long]("n_queries") == 1L)
  }

  test("sim_embed_drift flags a planted per-dim shift between the halves") {
    import spark.implicits._
    // md5 halves: ids 0,1,3 -> 'a'; ids 2,4,5 -> 'b'. Half b shifted
    // +0.2 in dim 2 only -> max_dmean_u = 200000, exactly 1 drifted
    // dim (> 50000 gate), and a centroid cosine below 1.
    val fixture = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (3L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.2f, 0.0f, 0.0f), 1),
      (4L, Array(1.0f, 0.2f, 0.0f, 0.0f), 1),
      (5L, Array(1.0f, 0.2f, 0.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("edrift").toString
    fixture.coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val r = SimQueries.queries("sim_embed_drift")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("max_dmean_u") == 200000L)
    assert(r.getAs[Long]("n_drifted_dims") == 1L)
    val cos = r.getAs[Double]("centroid_cos")
    assert(cos > 0.9 && cos < 1.0, s"cos $cos")
  }

  test("t_cluster_split keeps a near-dup pair in ONE split where the " +
      "doc-level split would straddle it") {
    import spark.implicits._
    // md5 buckets: doc 0 -> 16 (train), doc 8 -> 93 (test) — a
    // DOC-level 80/20 split puts this near-dup pair on both sides of
    // the boundary (the leakage). The pair's cluster id is min(0,8)=0
    // -> bucket 16 -> both land in train under the cluster split.
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val fixture = Seq(
      (0L, base + " endA"), (8L, base + " endB"),           // near-dups
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "uno dos tres cuatro cinco seis siete ocho"),
      (19L, "red green blue yellow purple orange pink gray"))
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("csplit").toString
    fixture.coalesce(1).write.parquet(s"$dir/documents.parquet")
    // counterfactual: the doc-level buckets really do straddle
    val buckets = Sampling.hashSplit(
        spark.range(0, 1).selectExpr("0L AS doc_id")
          .union(spark.range(0, 1).selectExpr("8L AS doc_id")),
        "doc_id", 80)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(buckets(0L) == "train" && buckets(8L) == "test",
      "fixture ids must straddle at doc level for the test to bite")
    val out = TextQueries.queries("t_cluster_split")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("split") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_clusters"),
          r.getAs[Long]("n_straddling_clusters"))).toMap
    assert(out.values.forall(_._3 == 0L), s"straddle must be 0: $out")
    // 4 train docs (dup pair as ONE cluster + docs 1, 2), 1 test (19)
    assert(out("train")._1 == 4L && out("train")._2 == 3L, s"$out")
    assert(out("test")._1 == 1L && out("test")._2 == 1L, s"$out")
  }

  test("hashSample: nesting, layout-invariance, and split consistency") {
    import spark.implicits._
    val ids = spark.range(0, 2000).selectExpr("id AS doc_id")
    def sample(pct: Int, parts: Int) =
      Sampling.hashSample(ids.repartition(parts), "doc_id", pct)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val s10 = sample(10, 4)
    val s25 = sample(25, 4)
    val s50 = sample(50, 4)
    // monotone nesting: raising pct only ADDS rows — the property that
    // lets a cheap pilot sample extend to a bigger audit sample
    // without re-selecting (same md5 bucket, higher threshold)
    assert(s10.subsetOf(s25) && s25.subsetOf(s50))
    // membership is a pure function of the id — partition layout and
    // row order must not matter (the cross-engine determinism claim)
    assert(sample(25, 1) == s25 && sample(25, 13) == s25)
    // consistency with hashSplit: pct and trainPct read the same
    // bucket, so sample(80) IS the train side of an 80/20 split
    val train = Sampling.hashSplit(ids, "doc_id", 80)
      .filter(col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sample(80, 4) == train)
    // rough mass sanity: md5 buckets spread ids near-uniformly
    assert(s25.size > 400 && s25.size < 600, s"25% of 2000 -> ${s25.size}")
  }

  test("cross-split leakage: planted eval near-dups flag with their best " +
      "train neighbor; orthogonal eval stays clean") {
    import graft.sim.Similarity
    import spark.implicits._
    // md5-bucket parity of the ids: 0,1 -> train (side 0); 2,4,5 ->
    // eval (side 1). Geometry: evals 2 and 5 point near train 0's +x
    // axis (cos ~0.9994 / ~0.9397); eval 4 is orthogonal to both
    // trains. nprobe = nlist(=ceil(sqrt(5))=3) so every cross pair is
    // a candidate — the spec pins SEMANTICS (split, threshold, best
    // pick, n_cands); recall of the cell bound is the dbscan curve's
    // job.
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9994f, 0.0349f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (5L, Array(0.94f, 0.342f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.crossSplitLeakage(df, minCos = 0.4, nprobe = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out.keySet == Set(2L, 5L), s"flagged set: ${out.keySet}")
    val (t2, c2, n2) = out(2L)
    assert(t2 == 0L && c2 > 0.99 && n2 == 1L, s"eval 2: ${out(2L)}")
    val (t5, c5, n5) = out(5L)
    assert(t5 == 0L && c5 > 0.93 && c5 < 0.95 && n5 == 1L,
      s"eval 5: ${out(5L)}")
  }

  test("dbscan: arc chain -> two cores merge to one cluster, endpoints " +
      "border, orthogonal outlier noise") {
    import spark.implicits._
    // Unit vectors at 0/20/40/60 degrees in one plane: adjacent pairs
    // cos20 = 0.94 >= 0.9, skip-one cos40 = 0.77 < 0.9. Degrees with
    // minPts=2: v1,v2 core (the CC must MERGE them into one cluster,
    // min core id 1); v0,v3 have one neighbor each -> border attached
    // to cluster 1; v4 orthogonal -> noise. One quantizer cell
    // (nlist=1) so the eps-graph is cell-complete.
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9397f, 0.342f, 0.0f, 0.0f)),
      (2L, Array(0.766f, 0.6428f, 0.0f, 0.0f)),
      (3L, Array(0.5f, 0.866f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val quant = Similarity.hashSampledQuantizer(df, nlist = 1)
    val out = Similarity.dbscan(quant, df, minCosine = 0.9, minPts = 2)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[String]("role"), r.getAs[Long]("cluster"))).toMap
    assert(out(1L) == (("core", 1L)))
    assert(out(2L) == (("core", 1L))) // merged with v1, not its own id
    assert(out(0L) == (("border", 1L)))
    assert(out(3L) == (("border", 1L)))
    assert(out(4L) == (("noise", -1L)))
  }

  test("sourceOverlap: shared duplicated doc dominates the pair matrix, " +
      "disjoint sources emit no row") {
    import spark.implicits._
    // srcA and srcB share one identical doc; srcC has disjoint
    // vocabulary. Trigrams of "a b c d e" = 3 distinct; each source's
    // unique 4-token doc adds 2 — so n_a = n_b = 5 and the containment
    // overlap is 3/5. Pairs sharing nothing must be ABSENT (sparse
    // matrix), not zero rows.
    val df = Seq(
      (1L, "a b c d e", "srcA"), (2L, "x y z w", "srcA"),
      (3L, "a b c d e", "srcB"), (4L, "p q r s", "srcB"),
      (5L, "m n o t u", "srcC")).toDF("doc_id", "text", "source")
    val out = Dedup.sourceOverlap(df, n = 3).collect()
    assert(out.length == 1, s"only the (A,B) pair shares grams: " +
      out.mkString(", "))
    val r = out.head
    assert(r.getAs[String]("source_a") == "srcA" &&
      r.getAs[String]("source_b") == "srcB")
    assert(r.getAs[Long]("n_shared") == 3L && r.getAs[Long]("n_a") == 5L &&
      r.getAs[Long]("n_b") == 5L)
    assert(r.getAs[Long]("overlap_ppm") == 600000L)
  }

  test("testdata assumption: the curve pick at the DEFAULT (sqrt-n) " +
      "quantizer equals the headline's pinned p=4") {
    // sim_dbscan pins probes=4, a choice curvePick made over the
    // measured recall curve — re-measured HERE at the quantizer the
    // default actually runs (nlist = ceil(sqrt(n)), the
    // sim_dbscan_scaled_curve entry) so a testdata regen that shifts
    // the knee (e.g. denser eps-neighborhoods making p=2 sufficient)
    // fails THIS spec instead of silently leaving the headline pinned
    // off-curve. The dd_threshold_curve_capped df-cap spec is the
    // precedent for pinning a data assumption as a test.
    val curve = SimQueries.queries("sim_dbscan_scaled_curve")(
        spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getAs[Int]("probes") -> r.getAs[Long]("recall_ppm"))
      .toSeq.sortBy(_._1)
    assert(curve.size == 3, s"three arms expected: $curve")
    assert(Similarity.autoProbes(curve) == 4,
      s"headline sim_dbscan pins p=4 but the measured default-quantizer " +
        s"curve picks ${Similarity.autoProbes(curve)}: $curve — re-pin " +
        "the headline (and its oracle) to the curve-picked value")
  }

  test("mmrTopK spends rank 2 on the diverse candidate, not the near-dup") {
    import spark.implicits._
    // query v0; v1 is the top hit, v2 a near-duplicate of v1 (plain
    // top-2 = {v1, v2}), v3 relevant-but-different. MMR's redundancy
    // penalty must demote v2 and pick v3 at rank 2.
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.001f, 0.0f)),
      (3L, Array(0.6f, 0.0f, 0.8f, 0.0f))).toDF("vec_id", "embedding")
    val plain = Similarity.bruteForceTopK(df.filter($"vec_id" === 0), df, 2)
      .orderBy("rank").select("cand_id").as[Long].collect().toSeq
    assert(plain == Seq(1L, 2L), s"plain top-2 should be the dup pair: $plain")
    val mmr = Similarity.mmrTopK(df, k = 2, poolSize = 3, nQueries = 1)
      .orderBy("rank").select("cand_id").as[Long].collect().toSeq
    assert(mmr == Seq(1L, 3L), s"mmr should diversify: $mmr")
  }

  test("mmrTopKIvf diversifies over the IVF-fed pool") {
    import spark.implicits._
    // same planted geometry as the brute-pool test; with nlist=1 the
    // IVF candidate set is the whole (tiny) corpus, so the greedy must
    // make the identical diversify-not-duplicate choice — proving the
    // pool swap changes candidate GENERATION, not the greedy
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.001f, 0.0f)),
      (3L, Array(0.6f, 0.0f, 0.8f, 0.0f))).toDF("vec_id", "embedding")
    val quant = Similarity.hashSampledQuantizer(df, nlist = 1)
    val mmr = Similarity.mmrTopKIvf(quant, df, k = 2, poolSize = 3,
        nQueries = 1, nprobe = 1)
      .orderBy("rank").select("cand_id").as[Long].collect().toSeq
    assert(mmr == Seq(1L, 3L), s"ivf-fed mmr should diversify: $mmr")
  }

  test("autoNprobe picks the smallest arm within slack of best recall") {
    // best 715000, slack 20000 -> threshold 695000 -> knee = 2
    val curve = Seq(1 -> 500000L, 2 -> 700000L, 4 -> 710000L, 8 -> 715000L)
    assert(Similarity.autoNprobe(curve) == 2)
    // input order must not matter
    assert(Similarity.autoNprobe(curve.reverse) == 2)
    // monotone-improving curve with big steps -> pick the max arm
    assert(Similarity.autoNprobe(
      Seq(1 -> 400000L, 2 -> 500000L, 4 -> 600000L, 8 -> 720000L)) == 8)
    // single arm
    assert(Similarity.autoNprobe(Seq(4 -> 100000L)) == 4)
    // zero slack -> first arm attaining the max
    assert(Similarity.autoNprobe(curve, slackPpm = 0L) == 8)
  }

  test("testdata assumption: dd_threshold_curve_capped's df cap (16) is " +
      "inactive at verify scale") {
    // The capped curve is verified against the UNCAPPED exact oracle,
    // which is an identity only while no prefix gram's doc-frequency
    // exceeds the cap in the committed testdata (then the df filter
    // passes everything). If a testdata regen makes this fail, that is
    // the documented bounded-recall trade becoming active — re-tune
    // maxDocFreq in the dd_threshold_curve_capped entry or regenerate
    // colder grams; it is NOT a code regression.
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val docs = graft.io.Tables.load(spark, s"/root/testdata/$sf",
        "documents")
      val maxDf = Dedup.maxPrefixDocFreq(docs, n = 3, minJaccard = 0.5)
      assert(maxDf <= 16L,
        s"$sf: max prefix-gram df $maxDf exceeds the cap 16 — the " +
          "dd_threshold_curve_capped oracle gate's capped==uncapped " +
          "assumption no longer holds for this testdata")
      // the LSH planner's capped twin runs the prefix at t=0.3 (a
      // LONGER prefix, so dfs can only be >= the t=0.5 ones) — pin its
      // assumption separately
      val maxDf03 = Dedup.maxPrefixDocFreq(docs, n = 3, minJaccard = 0.3)
      assert(maxDf03 <= 16L,
        s"$sf: max t=0.3 prefix-gram df $maxDf03 exceeds the cap 16 — " +
          "the dd_lsh_plan_capped oracle gate's capped==uncapped " +
          "assumption no longer holds for this testdata")
    }
  }

  test("pqDistortion: per-subspace error to the ASSIGNED (nearest) " +
      "codeword, exact on planted geometry") {
    import spark.implicits._
    // m=2 subspaces of dsub=2; vector (1,1,5,5): subspace 0 assigns to
    // (0,0) at d2=2 (not (10,10) at 162); subspace 1 assigns to (5,5)
    // at d2=0
    val cb = Similarity.PqCodebook(2, Array(
      Array(Array(0.0, 0.0), Array(10.0, 10.0)),
      Array(Array(0.0, 0.0), Array(5.0, 5.0))))
    val df = Seq((0L, Seq(1f, 1f, 5f, 5f))).toDF("vec_id", "embedding")
    val out = Similarity.pqDistortion(cb, df).collect()
      .map(r => r.getInt(0) ->
        ((r.getAs[Double]("mean_d2"), r.getAs[Double]("max_d2")))).toMap
    assert(out(0) == ((2.0, 2.0)))
    assert(out(1) == ((0.0, 0.0)))
  }

  test("hammingTopK: sign flips count per dimension across BOTH " +
      "32-bit halves; rank follows flip count") {
    import spark.implicits._
    val ones = Seq.fill(64)(1f)
    def flip(dims: Int*) =
      dims.foldLeft(ones)((v, d) => v.updated(d - 1, -1f))
    val df = Seq(
        (0L, ones), (1L, flip(5)), (2L, flip(1, 2, 64)),
        (3L, flip(64)), (4L, ones.map(-_)))
      .toDF("vec_id", "embedding")
    val out = Similarity.hammingTopK(df.filter($"vec_id" === 0L), df, 4)
      .collect().map(r => r.getAs[Int]("rank") ->
        ((r.getAs[Long]("cand_id"), r.getAs[Int]("hamming")))).toMap
    // flips: 1 -> 1, 3 (dim 64 = hi half) -> 1 tie broken by id,
    // 2 -> 3 (dims 1, 2 in lo + 64 in hi), 4 -> 64
    assert(out(1) == ((1L, 1)))
    assert(out(2) == ((3L, 1)))
    assert(out(3) == ((2L, 3)))
    assert(out(4) == ((4L, 64)))
  }

  test("kCenterSelect: greedy picks the farthest-from-selected point " +
      "each step, distance ties to the lower vec_id") {
    import spark.implicits._
    // 0=(0,0) start; 2=(10,0) and 3=(0,10) both at d2=100 -> tie to 2;
    // then 3 (min-dist to {0,2} = 100); then 4 (0.04) over 1 (0.01)
    val df = Seq(
        (0L, Seq(0f, 0f)), (1L, Seq(0.1f, 0f)), (2L, Seq(10f, 0f)),
        (3L, Seq(0f, 10f)), (4L, Seq(0.2f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kCenterSelect(df, k = 4).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1) == ((0L, 0.0)))
    assert(out(2) == ((2L, 100.0)))
    assert(out(3) == ((3L, 100.0)))
    assert(out(4)._1 == 4L)
    assert(math.abs(out(4)._2 - 0.04) < 1e-6)
  }

  test("kCenterSelect stops at the honest coreset size on an exhausted pool") {
    import spark.implicits._
    // 10 vectors, only 3 DISTINCT points: once all three are selected
    // the greedy max min-d² is 0 and no further step may re-emit a
    // selected point (r11 ADVICE). The unrolled-CTE oracle mirrors the
    // stop with its md > 0 step filter (r12 ADVICE — verified against
    // DuckDB on this exact pool shape: 3 rows, steps (0, 2, 1)·64d²).
    val df = (0L until 10L).map(i =>
        (i, Seq.fill(64)((i % 3).toFloat)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kCenterSelect(df, k = 8).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 3, s"expected 3 honest steps, got ${out.length}")
    // step 1: lowest vec_id (0); step 2: farthest = value 2 (d²=4·64),
    // lowest id with it is 2; step 3: value 1 (d²=1·64), lowest id 1
    assert(out.toSeq == Seq((1, 0L, 0.0), (2, 2L, 256.0), (3, 1L, 64.0)))
  }

  test("protoPrune: cutoff = smallest d2 whose cumulative covers the " +
      "fraction; strictly-below pruned, cutoff ties kept") {
    import spark.implicits._
    // k=1 -> the fit converges to the global mean (4.5, 0, 0, 0);
    // d2 over x = 0..9 is symmetric: {0.25, 2.25, 6.25, 12.25, 20.25}
    // x2 each. cum at 0.25 is 2 < 3, at 2.25 is 4 >= 3 -> cutoff
    // 2.25: exactly the two most prototypical vectors (x = 4, 5)
    // prune; the 2.25 tie pair is AT the cutoff and stays.
    val df = (0 until 10).map(i =>
        (i.toLong, Seq(i.toFloat, 0f, 0f, 0f), "l"))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.protoPrune(df, k = 1, iters = 2).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("d2_u"), r.getAs[Int]("pruned"))).toMap
    assert(out.size == 10)
    assert(out(4L) == ((250000L, 1)) && out(5L) == ((250000L, 1)))
    assert(out(3L) == ((2250000L, 0)) && out(6L) == ((2250000L, 0)))
    assert(out.values.map(_._2).sum == 2) // at most floor(0.3n), never more
    assert(out(0L)._1 == 20250000L && out(0L)._2 == 0)
  }

  test("lshPlan: fixed-point S-curve masses match an independent " +
      "BigInt replay; steeper configs trade FP for FN") {
    // one exact-dup pair (s_pct = 100) + one pair at gram Jaccard
    // 6/14 -> s_pct = 42 (shared 8-token prefix of 12-token docs
    // gives 6 shared 3-grams of 10 per doc)
    val a = Seq.tabulate(30)(i => s"a$i").mkString(" ")
    val c = Seq.tabulate(12)(i => s"c$i")
    val d = c.take(8) ++ Seq.tabulate(4)(i => s"d$i")
    val df = docsDf((1L, a), (2L, a),
      (3L, c.mkString(" ")), (4L, d.mkString(" ")))
    val out = Dedup.lshPlan(df).collect()
      .map(r => r.getAs[Int]("r") -> r).toMap
    assert(out.size == 6)
    // independent replay of the square-and-floor recurrence
    val D = BigInt(1000000000000L)
    def m(x: BigInt, y: BigInt) = x * y / D
    def powFp(x: BigInt, e: Int): BigInt =
      Iterator.iterate(x)(v => m(v, v)).drop(
        (math.log(e) / math.log(2)).round.toInt).next()
    for ((r, b) <- Seq(1 -> 128, 2 -> 64, 4 -> 32, 8 -> 16, 16 -> 8,
        32 -> 4)) {
      val sFp = BigInt(42L) * 10000000000L
      val pc = D - powFp(D - powFp(sFp, r), b)
      val row = out(r)
      assert(row.getAs[Int]("b") == b)
      assert(row.getAs[Long]("n_pairs_obs") == 2L)
      // bucket 100 contributes pc = D exactly (fixed point is closed
      // at the top): fn = 0 and caught = 1e6 from that pair alone
      assert(row.getAs[Long]("fp_lo_upairs") == (pc / 1000000).toLong)
      assert(row.getAs[Long]("fn_hi_upairs") == 0L)
      assert(row.getAs[Long]("caught_hi_upairs") == 1000000L)
    }
    // FP mass at s=0.42 strictly decreases as bands get steeper
    val fps = Seq(1, 2, 4, 8, 16, 32).map(out(_).getAs[Long]("fp_lo_upairs"))
    assert(fps == fps.sorted.reverse && fps.distinct == fps)
    // argmin carries the chosen flag (steepest config: no FN anywhere
    // here, so min total err = min FP = r=32)
    assert(out(32).getAs[Int]("chosen") == 1)
    assert(out(1).getAs[Int]("chosen") == 0)
  }
}
