package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline (SURVEY §7.5):
  * tokenization, quality scoring, language ID, fingerprinting. All
  * column-expression based (codegen'd) except the language heuristic,
  * which is a small Scala UDF over the token array.
  */
object TextAnalysis {

  /** Whitespace tokens; the `documents` corpus is single-space joined. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword count: count of word-piece matches — capital-led
    * letter runs, lowercase runs, digit runs, and single non-alnum
    * marks — an upper-bound proxy for tokenizer load without shipping a
    * vocab. The piece pattern deliberately avoids lookarounds so the
    * SAME regex runs under Java regex (Spark codegen) and RE2 (DuckDB
    * oracle): both use leftmost-first alternation.
    */
  val bpeishPattern = "[A-Z][a-z]*|[a-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeishPattern), lit(0)))

  private val stopwords = Seq(
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by")

  /** Stopword hits among tokens (array intersection, no UDF). */
  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => t.isInCollection(stopwords)))

  /** Quality features + composite score in one projection:
    * length/stopword/alpha ratios à la C4/Gopher filters.
    */
  def qualityProjection(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      length(col("text")).as("n_chars_measured"),
      stopwordCount(toks).as("n_stop"))
      // score computed from the raw ratios (not the rounded display
      // columns): combining pre-rounded values lands exactly on decimal
      // half-boundaries where Java's shortest-repr rounding and C-style
      // rounding of the true binary value disagree.
      .withColumn("quality_score",
        round(least(col("n_stop") / col("n_tokens") * 2.5, lit(1.0)) * 0.5 +
          least((col("n_chars_measured") - (col("n_tokens") - 1)) /
            col("n_tokens") / 8.0, lit(1.0)) * 0.5, 4))
      .withColumn("stop_ratio",
        round(col("n_stop") / col("n_tokens"), 4))
      .withColumn("mean_tok_len",
        round((col("n_chars_measured") - (col("n_tokens") - 1)) /
          col("n_tokens"), 4))
  }

  /** Deflate compression ratio as a quality signal (Rae et al. 2021
    * §A1.1 use it to drop boilerplate/repetitive pages: text that
    * compresses too well is too repetitive; text that doesn't
    * compress at all is noise). zlib output is fully specified for a
    * given level, so the UDF is deterministic across runs and
    * executors — but no SQL engine exposes deflate, hence this is a
    * declared rows-only operator (spec-pinned instead of
    * oracle-checked). Map-only: one codegen-adjacent projection, no
    * shuffle; the UDF is the justified kind (byte-level codec, not
    * expressible as column algebra).
    */
  val compressRatio: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      if (text == null || text.isEmpty) 0.0
      else {
        val in = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val d = new java.util.zip.Deflater(6)
        d.setInput(in); d.finish()
        val buf = new Array[Byte](64)
        var n = 0L
        while (!d.finished()) n += d.deflate(buf)
        d.end()
        math.round(n.toDouble / in.length * 10000).toDouble / 10000
      }
    }

  /** Per-doc compression stats + the Gopher-style band gate: keep docs
    * whose ratio sits in [lo, hi] — below is repetitive boilerplate,
    * above is high-entropy noise.
    */
  def compressionProjection(docs: DataFrame, lo: Double = 0.25,
      hi: Double = 0.95): DataFrame =
    docs.select(col("doc_id"), length(col("text")).as("n_bytes"),
        compressRatio(col("text")).as("ratio"))
      .withColumn("pass",
        (col("ratio") >= lo && col("ratio") <= hi).cast("int"))

  /** Decile binning of the quality score, done the way a 100 TB job
    * must: compute the 9 cut points in one tiny aggregate, broadcast
    * the single-row threshold list, and bin each doc map-locally by
    * comparison — NEVER a global ntile(), whose Window.orderBy with
    * no partition key collapses the corpus onto one task. Ties sit
    * exactly on a threshold only when the interpolation endpoints are
    * equal (then the cut point is exact), so `>` binning is engine-
    * stable. Output: per-bin doc count, quality range, token mass.
    */
  def qualityDeciles(docs: DataFrame, nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val qs = (1 until nBins).map(i => i.toDouble / nBins)
    val qp = qualityProjection(docs)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
    val cuts = qp.agg(expr(
      s"percentile(quality_score, array(${qs.mkString(", ")}))").as("ts"))
    qp.crossJoin(broadcast(cuts))
      .withColumn("bin",
        size(filter(col("ts"), t => col("quality_score") > t)) + 1)
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        min(col("quality_score")).as("min_q"),
        max(col("quality_score")).as("max_q"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"))
  }

  /** Language-marker lists for the stopword language heuristic; argmax
    * tie-break follows this order (first max wins). Public so the DuckDB
    * oracle text can be generated from the same source of truth.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del"),
    "de" -> Seq("der", "die", "und", "das", "von", "mit", "ist", "den"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est", "une", "dans"),
    "it" -> Seq("il", "di", "che", "la", "per", "con", "del", "una"),
    "pt" -> Seq("o", "de", "que", "em", "do", "da", "um", "para"),
    "nl" -> Seq("de", "het", "een", "van", "en", "dat", "is", "op"))

  /** Script ranges (BMP) checked before marker voting; share > 0.3 of
    * non-space characters decides. Regex-expressible so the whole
    * heuristic stays inside codegen.
    */
  val scriptRanges: Seq[(String, String)] = Seq(
    "zh" -> "[\\x{4E00}-\\x{9FFF}]",
    "ru" -> "[\\x{0400}-\\x{04FF}]",
    "ar" -> "[\\x{0600}-\\x{06FF}]")

  /** Heuristic language ID as a pure column expression (no UDF — stays
    * in whole-stage codegen and is DuckDB-oracle expressible):
    * CJK/Cyrillic/Arabic script-share check, then stopword-marker argmax
    * with fixed tie-break order; "und" when nothing scores.
    */
  def langIdCol(text: Column): Column = {
    val joined = regexp_replace(text, " ", "")
    val total = length(joined)
    def share(pat: String): Column =
      when(total > 0,
        (total - length(regexp_replace(joined, pat, ""))).cast("double") / total)
        .otherwise(lit(0.0))
    val toks = split(lower(text), " ")
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isInCollection(markers)))
    }
    val best = greatest(scores.map(_._2): _*)
    val scriptPick = scriptRanges.foldLeft(when(lit(false), lit(""))) {
      case (acc, (lang, pat)) => acc.when(share(pat) > 0.3, lit(lang))
    }
    val markerPick = scores.foldLeft(scriptPick.when(best === 0, lit("und"))) {
      case (acc, (lang, sc)) => acc.when(sc === best, lit(lang))
    }
    markerPick.otherwise(lit("und"))
  }

  def withLangId(docs: DataFrame): DataFrame =
    docs.withColumn("lang_pred", langIdCol(col("text")))

  // ------------------------------------------------------ PII scrubbing

  /** PII patterns for redaction: (name, regex, replacement). All three
    * are lookaround-free so the SAME pattern string runs under Java
    * regex (Spark codegen) and RE2 (the DuckDB oracle) with identical
    * leftmost-first, greedy semantics. Replacement ORDER is part of the
    * contract: emails first (their local/domain parts contain digit and
    * dot runs the IP pattern would otherwise chew), then dotted-quad
    * IPs, then dashed phone numbers — the fold in [[redactPii]] and the
    * generated oracle SQL apply them identically.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
    ("phone", "[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"))

  /** Redact all PII pattern matches (all occurrences, fixed order). */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, pat, repl)) =>
      regexp_replace(c, lit(pat), lit(repl))
    }

  /** Per-doc PII counts (on the raw text) + the redacted text — the
    * standard scrub stage before pretraining. Pure column expressions:
    * one codegen'd projection, no shuffle, scales as a map-only pass.
    */
  def piiProjection(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val counts = piiPatterns.map { case (name, pat, _) =>
      size(regexp_extract_all(col(textCol), lit(pat), lit(0)))
        .as(s"n_${name}s")
    }
    docs.select(col("doc_id") +: counts :+
      redactPii(col(textCol)).as("redacted"): _*)
  }

  // ------------------------------------------- corpus n-gram statistics

  /** Word n-grams as an array column (empty below n tokens). Built from
    * zipped slices — never `sequence(1, size-n+1)`, whose descending
    * [1,0] result on short docs would fabricate grams — and stays
    * entirely inside whole-stage codegen.
    */
  def ngramsCol(toks: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val m = size(toks) - (n - 1)
    val grams = (2 to n).foldLeft(slice(toks, lit(1), m)) { (acc, j) =>
      zip_with(acc, slice(toks, lit(j), m), (a, b) => concat_ws(" ", a, b))
    }
    when(size(toks) >= n, grams).otherwise(array().cast("array<string>"))
  }

  /** Global top-k n-grams with collection and document frequency — the
    * vocabulary-audit / contamination-screen primitive. The explode is
    * map-local; the gram-keyed aggregation combines map-side before its
    * single shuffle (distinct-grams-per-partition bounds the exchange,
    * not the token stream); the top-k runs as TakeOrderedAndProject, no
    * global sort materialization. Tie-break on the gram string keeps
    * the k-boundary deterministic on any engine.
    */
  def topKNgrams(docs: DataFrame, n: Int = 3, k: Int = 50): DataFrame =
    docs.select(col("doc_id"),
        explode(ngramsCol(tokens(col("text")), n)).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("cnt"),
        count_distinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(k)

  /** Corpus unigram vocabulary: token -> collection frequency. One
    * token-keyed shuffle with map-side partial counts; the result is
    * heads-heavy and orders of magnitude smaller than the token stream,
    * so downstream joins broadcast it.
    */
  def unigramCounts(docs: DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))

  /** Vocabulary-growth (Heaps'-law) curve: cumulative distinct-type
    * count vs cumulative token count, sampled at `buckets` checkpoints
    * over the deterministic doc_id order — the dataset-size planning
    * curve (does doubling the corpus still buy new vocabulary?).
    *
    * Scale shape: bucket assignment is map-local integer math off a
    * 1-row max-id broadcast; "first appearance" is a min(bucket) per
    * token (map-side combined — the token stream shuffles once, as
    * 8-byte-ish (tok, bucket) partials); both per-bucket tables are
    * ≤ `buckets` rows, and the cumulative sums run as a bounded fold
    * over the sorted collected bucket list — no unpartitioned window,
    * no second pass over the corpus.
    */
  def vocabGrowth(docs: DataFrame, buckets: Int = 20): DataFrame = {
    val maxId = docs.agg((max(col("doc_id")) + 1).as("m"))
    val tb = docs.crossJoin(broadcast(maxId))
      .select(expr(s"CAST((doc_id * $buckets) div m AS INT)").as("bucket"),
        explode(tokens(col("text"))).as("tok"))
    // ONE pass over the token stream: both bucket tables derive from the
    // same (tok, bucket) partial-count aggregate, so Spark's exchange
    // reuse plans a single corpus scan + single token-keyed exchange
    // (ReusedExchange on the second branch — PLANS.md) and the regroups
    // operate on the vocab×buckets-sized table, not the token stream.
    val tokBucket = tb.groupBy("tok", "bucket").agg(count(lit(1)).as("c"))
    val counts = tokBucket.groupBy("bucket").agg(sum("c").as("n_tokens"))
    val news = tokBucket.groupBy("tok").agg(min("bucket").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("new_types"))
    counts.join(news, Seq("bucket"), "left")
      .na.fill(0L, Seq("new_types"))
      // prefix sums over the ≤ buckets-row frame: sorted collect + fold
      .agg(sort_array(collect_list(
        struct(col("bucket"), col("n_tokens"), col("new_types")))).as("rows"))
      .select(explode(expr(
        """zip_with(rows, sequence(1, size(rows)), (r, i) -> struct(
             r.bucket AS bucket,
             aggregate(slice(rows, 1, i), CAST(0 AS BIGINT),
               (a, x) -> a + x.n_tokens) AS cum_tokens,
             aggregate(slice(rows, 1, i), CAST(0 AS BIGINT),
               (a, x) -> a + x.new_types) AS cum_vocab))""")).as("r"))
      .select(col("r.bucket").as("bucket"),
        col("r.cum_tokens").as("cum_tokens"),
        col("r.cum_vocab").as("cum_vocab"))
  }

  /** Zipf rank–frequency fit: OLS slope/intercept of ln(count) on
    * ln(rank) over the top-k vocabulary — the one-row corpus health
    * stat (natural text ≈ −1; templated/synthetic corpora bend it).
    * The vocab count is the one token-keyed exchange; top-k runs as
    * TakeOrderedAndProject; ranks come from the single-row
    * sorted-collect over the O(k) slice (the RBO/hybrid-search idiom,
    * no unpartitioned window); the regression aggregates k rows.
    */
  def zipfSlope(docs: DataFrame, k: Int = 100): DataFrame =
    unigramCounts(docs)
      .orderBy(col("c").desc, col("tok"))
      .limit(k)
      .agg(sort_array(collect_list(
        struct((col("c") * -1).as("negc"), col("tok"), col("c")))).as("rows"))
      .select(posexplode(col("rows")).as(Seq("i", "r")))
      .select((col("i") + 1).cast("long").as("rank"), col("r.c").as("c"))
      .agg(round(regr_slope(log(col("c")), log(col("rank"))), 6).as("zipf_slope"),
        round(regr_intercept(log(col("c")), log(col("rank"))), 6).as("zipf_icept"),
        count(lit(1)).as("n_ranks"))

  /** Tokenize-to-ids: map every token to its frequency-ranked vocab id
    * (1 = most frequent; ties broken by token text so the ranking is a
    * pure function of the corpus) and emit the id sequence per doc —
    * the step between text curation and sequence packing.
    *
    * The vocabulary at 100 TB is 1e8–1e9 distinct tokens, so neither a
    * single-task global rank nor an unconditional broadcast survives.
    * The rank here is the distributed two-phase formulation:
    * range-partition the vocab on the rank key `(c desc, tok)`, number
    * rows within each partition, then add the cumulative row count of
    * all earlier range partitions. The only single-task work is the
    * offsets window over `numParts` rows (bounded by the partition
    * count, not the data). Ids are identical to a global
    * `row_number() OVER (ORDER BY c DESC, tok)` because range
    * partitions tile the global sort order. The id map then joins back
    * to the exploded token stream with NO broadcast hint — AQE
    * broadcasts it at runtime when (and only when) the built side is
    * actually small; re-assembly is the usual sorted collect keyed by
    * doc_id, state bounded by document length.
    */
  def tokenizeToIds(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val numParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // Phase 1 of the rank needs NO window at all: after the range
    // exchange + intra-partition sort, monotonically_increasing_id's
    // lower 33 bits ARE the per-partition record ordinal (sequential
    // by construction), so the per-partition row number costs zero
    // extra exchanges. Range partitions tile the global (c desc, tok)
    // order, so offset + ordinal equals the global row_number —
    // PROVIDED both the counts collect below and the vocab join read
    // the SAME partitioning. RangePartitioner's reservoir-sample seed
    // depends on the RDD id, so two executions of an unpersisted
    // repartitionByRange lineage can derive DIFFERENT boundaries once
    // partitions outgrow the sample size (r9 verdict #1 — the
    // la_gini/budgetSelect drift bug). The eager localCheckpoint
    // freezes one materialized partitioning for both actions;
    // SamplingDriftSpec forces non-exhaustive sampling
    // (sampleSizePerPartition=1) and asserts the ids still equal the
    // naive global row_number. PipelineOpsSpec pins equality at
    // exhaustive-sampling scale.
    val ranked = unigramCounts(docs)
      .repartitionByRange(numParts, col("c").desc, col("tok"))
      .sortWithinPartitions(col("c").desc, col("tok"))
      .select(col("tok"), spark_partition_id().as("pid"),
        (monotonically_increasing_id()
          .bitwiseAND(lit((1L << 33) - 1)) + 1L).as("local_rn"))
      .localCheckpoint(true)
    // Phase 2: per-partition row counts — a numParts-row aggregate,
    // collected once at plan-build time (the same bounded-collect
    // pattern as the 16-row ANN quantizer fits) and re-emitted as a
    // literal offset map: no offsets join in the final plan at all.
    val counts = ranked.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = {
      val pids = counts.keys.toSeq.sorted
      pids.zip(pids.map(counts).scanLeft(0L)(_ + _)).toMap
    }
    val vocab = ranked.select(col("tok"),
      (element_at(typedLit(offsets), col("pid")) + col("local_rn"))
        .cast("int").as("id"))
    docs.select(col("doc_id"), posexplode(tokens(col("text"))))
      .select(col("doc_id"), col("pos"), col("col").as("tok"))
      .join(vocab, Seq("tok"))
      .groupBy("doc_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("id")))),
          x => x.getField("id")), ",").as("ids"),
        count(lit(1)).cast("long").as("n_tokens"))
  }

  /** Per-doc rarity statistics against the corpus unigram table — the
    * rare-word quality signal as EXACT INTEGERS (sum/min of global
    * token frequency, hapax count) so the driver entry hash-matches
    * cross-engine; the float LM score lives in [[unigramLogProb]].
    * Two token-keyed passes: vocab build, then vocab⋈tokens (broadcast
    * when the vocab fits) reduced per doc_id.
    */
  def rarityProjection(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(tokens(col("text"))).as("tok"))
    toks.join(unigramCounts(docs), Seq("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("c")).as("sum_tok_freq"),
        min(col("c")).as("min_tok_freq"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
  }

  /** Per-doc top-k distinctive terms ranked by tf/df — the TF-IDF
    * keyword surface with an EXACT cross-engine ordering: idf's `ln`
    * diverges by 1 ulp between libm implementations (see
    * [[unigramLogProb]]), but ln is monotone, so ranking by the raw
    * ratio tf/df (one IEEE division, bit-identical on any engine)
    * yields the same order as tf·idf with smoothing-free idf — and the
    * emitted columns (tf, df, rank) are all integers. Shape: one
    * (doc, tok) count, one doc-frequency count over the vocab (orders
    * of magnitude smaller than the token stream), an AQE-sized join
    * back, and a doc-keyed rank window (state bounded by per-doc
    * distinct terms).
    */
  def tfIdfTopK(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(col("doc_id"),
        explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy((col("tf").cast("double") / col("df")).desc, col("term"))
    tf.join(df, Seq("term"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("rank").cast("int").as("rank"))
  }

  // --------------------------------------------------- URL curation

  /** Canonicalize a URL for dedup/grouping: lowercase, strip scheme,
    * leading `www.`, query string, and trailing slash — each step a
    * lookaround-free regex that Java regex and RE2 read identically,
    * applied in a fixed order the oracle replays verbatim. Map-only.
    */
  def canonicalUrl(url: Column): Column = {
    val steps = Seq("^https?://" -> "", "^www\\." -> "",
      "\\?.*$" -> "", "/$" -> "")
    steps.foldLeft(lower(url)) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }
  }

  /** Registrable domain of a canonicalized URL (host = text before the
    * first `/`).
    */
  def domainOf(canon: Column): Column = substring_index(canon, "/", 1)

  /** Per-doc average negative log unigram probability — the CCNet-style
    * LM-quality proxy. Kept as a spec'd API rather than an oracle entry:
    * Java Math.log and libm ln disagree by 1 ulp on ~2e-5 of integer
    * inputs (measured), so a cross-engine float hash-match is not
    * achievable; [[rarityProjection]] is the exact-integer driver
    * surface of the same signal.
    */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(tokens(col("text"))).as("tok"))
    val vocab = unigramCounts(docs)
    val total = vocab.agg(sum(col("c")).as("total"))
    toks.join(vocab, Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        avg(log(col("total").cast("double")) -
          log(col("c").cast("double"))).as("avg_neg_logp"))
  }

  /** Per-doc bigram-LM predictability score — the order-sensitive
    * upgrade of [[unigramLogProb]] (a unigram model scores shuffled
    * text identically; a bigram model does not). Trains bigram and
    * bigram-start counts over the corpus itself, scores each bigram by
    * its integer-scaled conditional probability
    * `s = (c12 * 1e6) div c1`, and reports the per-doc mean
    * `lm_u = sum(s) div n` — high for text the corpus-level model
    * predicts well, low for scrambled/outlier docs. All arithmetic is
    * long division and long sums, which commute exactly, so the DuckDB
    * oracle hash-matches bit for bit (no ln(), no float summation-order
    * hazard — the lesson of [[unigramLogProb]]'s 1-ulp problem).
    *
    * Scale: the bigram stream shuffles twice on token-string keys
    * ((w1,w2) then w1) to build the model tables, which are
    * model-sized, not corpus-sized; they join back with no broadcast
    * hint so AQE broadcasts only when they genuinely fit. Per-doc
    * state is one (sum, count) pair of longs.
    */
  def bigramLm(docs: DataFrame): DataFrame = {
    val base = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    val big = base.select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("t")) - 1),
        i => struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val c12 = big.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = big.groupBy("w1").agg(count(lit(1)).as("c1"))
    big.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .select(col("doc_id"), expr("(c12 * 1000000L) div c1").as("s"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(s) div count(*)").as("lm_u"))
  }

  /** HELD-OUT bigram-LM filter score — the CCNet-style arrangement
    * (Wenzek et al. 2020: an LM trained on reference data scores
    * candidate documents) that [[bigramLm]] deliberately isn't:
    * there the model is trained on the same corpus it scores, so a
    * large cluster of near-identical junk scores itself as highly
    * predictable. Here the model tables (bigram counts `c12`, start
    * counts `c1`, vocabulary size `V`) are built ONLY from the rows
    * where `isRef` holds (the caller passes the deterministic md5
    * half-split, kept at the entry next to its SQL twin), and only
    * the complement is scored — with add-1 smoothing so unseen
    * transitions get mass instead of vanishing from the join:
    * `s = ((c12 + 1) * 1e6) div (c1 + V)`, `V` = distinct ref
    * successor-vocabulary + 1 (the OOV bucket). All arithmetic is
    * long division/long sums (commute exactly → bit-identical DuckDB
    * replay; same no-ln rule as [[bigramLm]]).
    *
    * Scale: identical shuffle shape to [[bigramLm]] — two
    * token-keyed model aggregations (model-sized, not corpus-sized),
    * LEFT joins back on the scored half with no broadcast hint so AQE
    * broadcasts the model tables only when they genuinely fit, and
    * `V` arrives as a one-row broadcast. Per-doc state is one
    * (sum, count) pair of longs.
    */
  def heldoutBigramLm(docs: DataFrame, isRef: Column): DataFrame = {
    val base = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), tokens(col("text")).as("t"),
        isRef.as("is_ref"))
      .filter(size(col("t")) >= 2)
    val big = base.select(col("doc_id"), col("is_ref"), explode(transform(
        sequence(lit(1), size(col("t")) - 1),
        i => struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2")))).as("p"))
      .select(col("doc_id"), col("is_ref"),
        col("p.w1").as("w1"), col("p.w2").as("w2"))
    val ref = big.filter(col("is_ref"))
    val c12 = ref.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = ref.groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = ref.agg((countDistinct(col("w2")) + lit(1L)).as("v"))
    big.filter(!col("is_ref"))
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id"),
        expr("((coalesce(c12, 0) + 1) * 1000000) div (coalesce(c1, 0) + v)")
          .as("s"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(s) div count(*)").as("lm_u"))
  }

  /** Guaranteed heavy hitters in two bounded passes — the 100 TB shape
    * for "which n-grams exceed frequency f·N":
    *
    *  1. candidate pass: a Misra–Gries summary (at most `k` counters of
    *     state per partial, O(k·partitions) shuffle rows — the distinct
    *     vocabulary NEVER shuffles);
    *  2. exact recount of only the candidates (broadcast semi join +
    *     keyed count), then the integer threshold gate
    *     `cnt · fracDen ≥ N · fracNum`.
    *
    * The require() pins the soundness condition: MG guarantees every
    * item with frequency > N/(k+1) is a candidate, so the threshold
    * fraction must exceed 1/(k+1) — then pass 2's output EQUALS the
    * exact `HAVING count(*) ≥ f·N` answer (which is how the oracle
    * checks it). Compare [[topKNgrams]]: exact, but its exchange
    * carries every distinct gram once per partition.
    */
  def guaranteedHeavyHitters(docs: DataFrame, n: Int = 3,
      fracNum: Long = 3L, fracDen: Long = 59582L,
      k: Int = 20000): DataFrame = {
    requireMgGuarantee(k, fracNum, fracDen)
    val grams = docs.select(
      explode(ngramsCol(tokens(col("text")), n)).as("gram"))
    val cands = grams
      .agg(graft.functions.MisraGries.misra_gries(col("gram"), k)
        .as("cands"))
      .select(explode(col("cands")).as("gram"))
    heavyHitterRecount(grams, cands, fracNum, fracDen)
  }

  /** Pass 2 of [[guaranteedHeavyHitters]], exposed standalone so the
    * STREAMING candidate build (`st_heavy_hitters` — the MG aggregate
    * as bounded stream state) can share it verbatim: exact recount of
    * only the candidate grams (broadcast semi join — the candidate
    * set is ≤ k rows by construction) and the integer threshold gate.
    * Given a candidate set containing every item of frequency
    * > N/(k+1) — which ANY MG summary guarantees regardless of merge
    * order — the output EQUALS the exact `HAVING cnt·fracDen ≥
    * N·fracNum` answer, which is why one oracle serves the batch,
    * streaming, and any future incremental build.
    */
  def heavyHitterRecount(grams: DataFrame, cands: DataFrame,
      fracNum: Long, fracDen: Long): DataFrame = {
    val total = grams.agg(count(lit(1)).as("n_total"))
    grams.join(broadcast(cands), Seq("gram"), "left_semi")
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * fracDen >= col("n_total") * fracNum)
      .select(col("gram"), col("cnt"))
  }

  /** The [[guaranteedHeavyHitters]] soundness condition, shared with
    * the streaming twin: MG with k counters guarantees presence only
    * above N/(k+1), so the recount threshold fraction must exceed it.
    */
  def requireMgGuarantee(k: Int, fracNum: Long, fracDen: Long): Unit = {
    require(fracNum > 0 && fracDen > 0, "threshold fraction must be positive")
    require((k + 1).toLong * fracNum > fracDen,
      s"MG capacity $k cannot guarantee hitters at $fracNum/$fracDen: " +
        s"need k+1 > fracDen/fracNum = ${fracDen / fracNum}")
  }

  /** Sliding-window document chunking with overlap — the context-window
    * prep for retrieval corpora and long-doc pretraining: windows of
    * `width` tokens starting every `stride` tokens (stride < width ⇒
    * overlapping; the tail chunk may be shorter). Pure column
    * expressions: the window starts come from an integer `sequence` and
    * each chunk is a `slice` + `concat_ws`, so the whole op is one
    * codegen'd map-local Generate — no shuffle, embarrassingly parallel
    * at any corpus size. chunk_id = 0-based window index.
    */
  def chunkOverlap(docs: DataFrame, width: Int, stride: Int): DataFrame = {
    require(width > 0 && stride > 0,
      s"width and stride must be positive: $width, $stride")
    val toks = tokens(col("text"))
    docs.select(col("doc_id"), posexplode(transform(
        sequence(lit(1), size(toks), lit(stride)),
        s => concat_ws(" ", slice(toks, s, lit(width))))))
      .select(col("doc_id"), col("pos").as("chunk_id"),
        col("col").as("chunk"),
        size(split(col("col"), " ")).as("n_chunk_tokens"))
  }

  /** Content-defined chunking (the FastCDC/rsync family idea at token
    * grain): a chunk boundary opens BEFORE token p whenever the rolling
    * hash of the `window` tokens ending at p−1 has its low `maskBits`
    * bits zero — expected chunk length 2^maskBits tokens. Because each
    * boundary decision depends only on LOCAL window content, an edit
    * shifts at most the chunks it touches (fixed-size chunking re-cuts
    * the whole suffix — the chunk-dedup killer), and every chunk's
    * md5 fingerprint is stable across documents that share passages —
    * the storage/chunk-level-dedup primitive a training-data pipeline
    * uses to dedupe near-identical document families cheaply.
    *
    * Scale shape: boundary flags are a map-local `transform` over the
    * token array (the native codegen'd [[graft.functions.RollingHash]]
    * per window — no UDF); chunk ids are a doc-keyed cumsum window and
    * assembly a doc-keyed sorted collect — the spanDedup exchange
    * contract, state bounded by one doc's length. Pure content
    * definition, no min/max clamps: a doc with no qualifying window is
    * ONE chunk (documented trade — clamping would make every boundary
    * depend on the previous one, serializing what is otherwise
    * position-parallel).
    */
  def cdcChunks(docs: DataFrame, window: Int = 4,
      maskBits: Int = 4): DataFrame = {
    require(window > 0 && maskBits >= 1 && maskBits <= 32,
      s"bad cdc params: window=$window maskBits=$maskBits")
    import graft.functions.RollingHash.rolling_hash
    import org.apache.spark.sql.expressions.Window
    val mask = (1L << maskBits) - 1L
    val toks = split(col("text"), " ")
    val flags = transform(sequence(lit(1), size(col("toks"))),
      p => when(p > window &&
          (rolling_hash(array_join(
            slice(col("toks"), p - window, lit(window)), " "))
            .bitwiseAND(lit(mask)) === 0L), 1).otherwise(0))
    val pos = docs.select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        posexplode(arrays_zip(col("toks"), flags.as("flags"))))
      .select(col("doc_id"), col("pos").as("p"),
        col("col.toks").as("tok"), col("col.flags").as("flag"))
    val w = Window.partitionBy("doc_id").orderBy("p")
    pos.withColumn("chunk_idx", sum(col("flag")).over(w).cast("int"))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(count(lit(1)).as("n_tokens"),
        md5(array_join(transform(
          sort_array(collect_list(struct(col("p"), col("tok")))),
          x => x.getField("tok")), " ").cast("binary")).as("fp"))
  }

  /** Gopher-style repetition filters (Rae et al. 2021 §A1.1, adapted to
    * word level): duplicate-word fraction and the share of tokens
    * covered by the most frequent 2-gram, plus the pass/fail gate. The
    * gate compares INTEGERS (`(n−u)·10 ≤ 3·n` ⟺ dup_frac ≤ 0.3) so no
    * engine can land on a float threshold knife-edge; the fractions are
    * single int/int divisions rounded for display. Two shuffles, both
    * keyed by doc_id — the bigram counting explodes ~n_tokens rows per
    * doc and reduces map-side before either exchange.
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val base = docs.select(col("doc_id"), toks.as("ws"),
      size(toks).as("n_tokens"), size(array_distinct(toks)).as("n_uniq"))
    val bigramCounts = base
      .select(col("doc_id"), explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => concat_ws(" ", a, b))).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_bigram_cnt"),
        sum(col("c")).as("n_bigrams"))
    base.select(col("doc_id"), col("n_tokens"), col("n_uniq"))
      .join(bigramCounts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_uniq"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("top_bigram_cnt"), lit(0L)).as("top_bigram_cnt"),
        round((col("n_tokens") - col("n_uniq")).cast("double") /
          col("n_tokens"), 4).as("dup_word_frac"),
        round(coalesce(col("top_bigram_cnt"), lit(0L)) * 2.0 /
          col("n_tokens"), 4).as("top_bigram_frac"),
        ((col("n_tokens") - col("n_uniq")) * 10 <= col("n_tokens") * 3 &&
          coalesce(col("top_bigram_cnt"), lit(0L)) * 20 <=
            col("n_tokens") * 2).cast("int").as("gopher_pass"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * via Importance Resampling"): score every document by the
    * log-likelihood ratio of a TARGET-domain bag-of-features model
    * against the RAW-corpus model, so raw-web documents that "look
    * like" the curated target domain can be up-sampled into a
    * pre-training mix. Features are unigrams, optionally hashed into
    * `hashBuckets` buckets (the paper's hashed n-gram trick — at
    * corpus scale the feature table is bounded by the bucket count,
    * not the open vocabulary). Laplace-smoothed probabilities; the
    * per-FEATURE log-ratio is rounded once to integer micro-nats, so
    * every per-document score is an exact BIGINT sum that commutes
    * across partitions and engines (the `t_bigram_lm` integer-scaling
    * contract — per-doc double sums would round-drift at the oracle).
    *
    * Scale shape: the feature table is ONE token-keyed map-combined
    * aggregate (state ≤ hashBuckets, or vocab when unhashed); totals
    * are a one-row broadcast; scoring joins the exploded token stream
    * against the broadcast feature table and reduces per doc_id with
    * map-side partials. The corpus text never shuffles. Hashing uses
    * the repo's md5-u48 key (NOT xxhash64) so the oracle can replay
    * bucket assignment exactly.
    *
    * Output: (doc_id, source, n_tokens, logw_u, keep) — logw_u the
    * µ-nat log importance weight, keep = 1 iff logw_u ≥ 0 (the doc
    * looks at least as target-like as raw-like).
    */
  def dsirWeights(docs: DataFrame, targetSources: Seq[String],
      hashBuckets: Option[Int] = None): DataFrame = {
    val toks = dsirTokens(docs, hashBuckets)
    val llr = dsirLlrTable(toks, targetSources)
    toks.join(broadcast(llr), Seq("feat"))
      .groupBy(col("doc_id"))
      .agg(first(col("source")).as("source"),
        count(lit(1)).as("n_tokens"),
        sum(col("llr_u")).as("logw_u"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("logw_u"), (col("logw_u") >= 0).cast("int").as("keep"))
  }

  /** md5-u48 feature bucket for a token column — first 48 md5 bits as
    * an integer, mod buckets: engine-replayable, uniform, sign-free.
    */
  def dsirBucket(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok), 1, 12), 16, 10).cast("long") % buckets

  private def dsirTokens(docs: DataFrame,
      hashBuckets: Option[Int]): DataFrame = {
    hashBuckets.foreach(b => require(b > 0, s"hashBuckets must be > 0: $b"))
    val feat: Column = hashBuckets match {
      case Some(b) => dsirBucket(col("tok"), b).cast("string")
      case None => col("tok")
    }
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        explode(tokens(col("text"))).as("tok"))
      .withColumn("feat", feat)
  }

  private def dsirLlrTable(toks: DataFrame,
      targetSources: Seq[String]): DataFrame = {
    require(targetSources.nonEmpty, "targetSources must be non-empty")
    val isT = col("source").isin(targetSources: _*)
    val fc = toks.groupBy("feat")
      .agg(sum(when(isT, 1L).otherwise(0L)).as("ct"),
        sum(when(isT, 0L).otherwise(1L)).as("cr"))
    val tot = fc.agg(sum("ct").as("nt"), sum("cr").as("nr"),
      count(lit(1)).as("v"))
    // double-domain ratio (BIGINT products would overflow at corpus
    // scale: ct·nr ~ 1e25 at 100 TB); both factors are exact integer
    // casts, so each engine performs the identical IEEE mul/div/ln
    fc.crossJoin(broadcast(tot))
      .select(col("feat"),
        round(log(((col("ct") + 1).cast("double") *
            (col("nr") + col("v")).cast("double")) /
          ((col("cr") + 1).cast("double") *
            (col("nt") + col("v")).cast("double"))) * 1e6)
          .cast("long").as("llr_u"))
  }

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken
    * 2003 — the MOSS algorithm): hash every k-token shingle, then in
    * each sliding window of `w` consecutive hashes keep the RIGHTMOST
    * minimal one. Guarantees every shared substring of ≥ w+k−1 tokens
    * contributes at least one common fingerprint (the property random
    * sampling and CDC chunking lack), at expected density 2/(w+1) —
    * the standard plagiarism/near-dup fingerprint family, here as the
    * per-doc summary (n_grams, n_sel, sel_sum/min/max pin the selected
    * multiset for the oracle; join the `sel` internals for pair search).
    *
    * Scale shape: gram hashing is map-local (md5-u48, oracle-
    * replayable); selection is a single sliding-frame aggregate over
    * ONE doc-keyed sort (see [[winnowFingerprints]]) whose exchange
    * the downstream distinct and per-doc summary reuse — window state
    * w rows, per-doc state bounded by the doc's own gram count.
    * Integer-only: no float knife-edges anywhere.
    */
  def winnow(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    val base = winnowBase(docs, k)
    winnowFingerprints(docs, k, w).groupBy("doc_id")
      .agg(count(lit(1)).as("n_sel"), sum("h").as("sel_sum"),
        min("h").as("sel_min"), max("h").as("sel_max"))
      .join(base.select(col("doc_id"), col("ng").as("n_grams")),
        Seq("doc_id"))
      .select(col("doc_id"), col("n_grams"), col("n_sel"),
        col("sel_sum"), col("sel_min"), col("sel_max"))
  }

  /** The selected winnowing fingerprint set — (doc_id, p, h) rows, the
    * join substrate for fingerprint-overlap pair search (group by h,
    * same Σ|posting|² shape as the LSH buckets).
    *
    * Single-pass form: the rightmost-minimal pick for the window
    * starting at position s is `max(struct(-h, p))` over the ROWS
    * frame [s, s+w−1] — struct ordering gives min-h (max −h) with the
    * rightmost tiebreak in ONE sliding-window aggregate on the one
    * doc-keyed sort (the two-phase min + argmax join recomputed the
    * gram pass twice). Rows past the last complete window are filtered
    * (short docs keep their single clipped window at s=1).
    */
  def winnowFingerprints(docs: DataFrame, k: Int = 3,
      w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 2, s"bad winnow params: k=$k w=$w")
    import org.apache.spark.sql.expressions.Window
    val base = winnowBase(docs, k)
    val grams = base.select(col("doc_id"), col("ng"),
      posexplode(transform(sequence(lit(1), col("ng").cast("int")),
        i => conv(substring(md5(
          concat_ws(" ", slice(col("t"), i, lit(k)))), 1, 12), 16, 10)
          .cast("long"))))
      .select(col("doc_id"), col("ng"),
        (col("pos") + 1).cast("long").as("s"), col("col").as("h"))
    val frame = Window.partitionBy("doc_id").orderBy("s")
      .rowsBetween(0, w - 1)
    grams
      .withColumn("pick",
        max(struct((-col("h")).as("nh"), col("s").as("p"))).over(frame))
      .filter(col("s") <= greatest(col("ng") - (w - 1), lit(1L)))
      .select(col("doc_id"), col("pick.p").as("p"),
        (-col("pick.nh")).as("h"))
      .distinct()
  }

  private def winnowBase(docs: DataFrame, k: Int): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= k)
      .withColumn("ng", (size(col("t")) - (k - 1)).cast("long"))

  /** Collected DSIR model: bucket → µ-nat LLR, for map-side scoring.
    * The collect is bounded by `hashBuckets` (the MODEL, not the data —
    * the k-means-centroid collect contract), which is the point of the
    * hashed-feature trick: a 2²⁰-bucket model is ~8 MB and rides the
    * task closure, so a STREAM scores documents with zero joins and
    * zero state.
    */
  def dsirModel(docs: DataFrame, targetSources: Seq[String],
      hashBuckets: Int): Map[Long, Long] =
    dsirLlrTable(dsirTokens(docs, Some(hashBuckets)), targetSources)
      .collect().map(r => r.getString(0).toLong -> r.getLong(1)).toMap

  /** Distributed BPE-style merge learning over the whitespace-token
    * corpus (Sennrich et al. 2016, word-level variant: learned merges
    * are collocations, the WordPiece/BPE loop shape is identical).
    * Each round is (a) one map-combined shuffle counting adjacent
    * token pairs, (b) a 1-row argmax with a total-order tie-break
    * (count desc, pair asc), and (c) a MAP-ONLY merge application —
    * so the per-round cost at corpus scale is one pair-count exchange
    * plus a broadcast of a single merge rule.
    *
    * Merge application is an exact string rewrite both engines share:
    * documents are carried as ' tok1  tok2  ... ' (DOUBLE-space
    * separated, single-space fenced), so replacing ' a  b ' with
    * ' a@@b ' consumes each token's own fence chars and adjacent
    * matches never overlap — plain left-to-right `replace` in Spark
    * and DuckDB then performs the identical leftmost-non-overlapping
    * BPE merge pass with no lookarounds (RE2 has none).
    *
    * The driver-side state is ONE (w1, w2, count) row per round —
    * the kmeans-centroid-collect pattern, bounded by `rounds`.
    */
  private def bpeChain(docs: DataFrame, rounds: Int)
      : (Seq[(Int, String, String, Long)], DataFrame, Seq[DataFrame]) = {
    require(rounds >= 1 && rounds <= 16, s"rounds out of range: $rounds")
    val base = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= ""))
          .cast("long").as("n_before"),
        concat(lit(" "),
          array_join(filter(split(col("text"), " "), x => x =!= ""), "  "),
          lit(" ")).as("s"))
    var rep = base.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cached = Seq[DataFrame](rep)
    val merges = scala.collection.mutable.Buffer[(Int, String, String, Long)]()
    for (r <- 1 to rounds) {
      val toks = rep.select(
          filter(split(trim(col("s")), "  "), x => x =!= "").as("t"))
        .where(size(col("t")) >= 2)
      val top = toks.select(explode(expr(
          "transform(sequence(1, size(t) - 1), " +
            "i -> struct(t[i-1] AS w1, t[i] AS w2))")).as("pr"))
        .select(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w1"), col("w2")).limit(1).collect()
      if (top.nonEmpty) {
        val (w1, w2, c) =
          (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += ((r, w1, w2, c))
        rep = rep.withColumn("s", replace(col("s"),
            lit(s" $w1  $w2 "), lit(s" $w1@@$w2 ")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cached = cached :+ rep
      }
    }
    (merges.toSeq, rep, cached)
  }

  /** The learned merge table: (round, w1, w2, n_pairs), one row per
    * round in learning order. See [[bpeChain]] for the loop shape.
    */
  def bpeLearn(docs: DataFrame, rounds: Int): DataFrame = {
    val (merges, _, cached) = bpeChain(docs, rounds)
    cached.foreach(_.unpersist(false))
    val spark = docs.sparkSession
    import spark.implicits._
    merges.toDF("round", "w1", "w2", "n_pairs")
  }

  /** Apply the `rounds` learned merges and report per-doc compression:
    * (doc_id, n_before, n_after, n_merged). n_merged is exactly the
    * number of merge operations performed on the doc across rounds.
    */
  def bpeApply(docs: DataFrame, rounds: Int): DataFrame = {
    val (_, rep, cached) = bpeChain(docs, rounds)
    val out = rep.select(col("doc_id"), col("n_before"),
        size(filter(split(trim(col("s")), "  "), x => x =!= ""))
          .cast("long").as("n_after"))
      .withColumn("n_merged", col("n_before") - col("n_after"))
      .localCheckpoint(true)
    cached.foreach(_.unpersist(false))
    out
  }

  /** Map-only DSIR score of a text column against a collected model:
    * (n_tokens, logw_u) as an exact integer fold — the stateless
    * streaming-gate form of [[dsirWeights]] (identical scores by
    * construction: same bucket function, same µ-nat table). Buckets
    * absent from the model (tokens genuinely unseen at fit time —
    * impossible when scoring the fit corpus itself) contribute 0.
    */
  def dsirScore(model: Map[Long, Long], buckets: Int,
      text: Column): (Column, Column) = {
    val toks = tokens(text)
    val scores = transform(toks,
      t => coalesce(element_at(typedLit(model), dsirBucket(t, buckets)),
        lit(0L)))
    (size(toks).cast("long"),
      aggregate(scores, lit(0L), (acc, x) => acc + x))
  }

  /** Gopher-style rule-flag quality gate (Rae et al. 2021 §A1.1.2,
    * thresholds adapted to the corpus): five independent boolean rules
    * per document, then per-source survivor accounting. Unlike the
    * scalar [[qualityProjection]] score, the rule flags tell a curator
    * WHICH filter fires — the per-rule failure counts are what a
    * 100 TB curation run publishes to decide threshold moves.
    *
    * All comparisons are EXACT integer cross-multiplications (no float
    * ratio knife-edges): mean word length `3 ≤ (chars−(n−1))/n ≤ 10`
    * becomes `3n ≤ letters ≤ 10n`, the 80% alpha-token floor becomes
    * `5·n_alpha ≥ 4·n`, the 20% distinct-token floor `5·n_uniq ≥ n`.
    * One map-combined aggregate after a map-only projection; output is
    * sources-sized.
    */
  def gopherRules(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val base = docs.select(col("source"),
      size(toks).as("n"),
      (length(col("text")) - (size(toks) - 1)).as("letters"),
      size(filter(toks, t => t.rlike("[a-z]"))).as("n_alpha"),
      stopwordCount(toks).as("n_stop"),
      size(array_distinct(toks)).as("n_uniq"))
    val flagged = base.select(col("source"),
      (col("n") >= 10 && col("n") <= 1000).cast("long").as("r_len"),
      (col("letters") >= col("n") * 3 &&
        col("letters") <= col("n") * 10).cast("long").as("r_wordlen"),
      (col("n_alpha") * 5 >= col("n") * 4).cast("long").as("r_alpha"),
      (col("n_stop") >= 2).cast("long").as("r_stop"),
      (col("n_uniq") * 5 >= col("n")).cast("long").as("r_rep"))
    flagged.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("r_len") * col("r_wordlen") * col("r_alpha") *
          col("r_stop") * col("r_rep")).as("n_pass"),
        sum(lit(1L) - col("r_len")).as("fail_len"),
        sum(lit(1L) - col("r_wordlen")).as("fail_wordlen"),
        sum(lit(1L) - col("r_alpha")).as("fail_alpha"),
        sum(lit(1L) - col("r_stop")).as("fail_stop"),
        sum(lit(1L) - col("r_rep")).as("fail_rep"))
      .withColumn("pass_ppm",
        expr("n_pass * 1000000L div n_docs"))
  }

  /** Cohen's kappa agreement between the repo's two document gates —
    * the five-rule Gopher flag conjunction ([[gopherRules]]) and the
    * scalar quality-score threshold ([[qualityProjection]] score ≥
    * thresholdU on the ×10⁴ grid) — per source. Kappa is the standard
    * "do two labelers agree beyond chance" statistic (Cohen 1960); a
    * curator runs it before swapping one gate for the cheaper other.
    * Exact integers end to end: the 2×2 cell counts are map-combined
    * longs, chance agreement pe = (a₁b₁ + a₀b₀) and the kappa
    * rational ((po·n − pe)·10⁶) / (n² − pe) run in DECIMAL(38,0)
    * (n ≤ ~10⁹ docs keeps every product < 10²⁵), one floor division,
    * NULL when marginals are degenerate (n² = pe ⇒ 0/0). Shape: one
    * map-only flag projection, one sources-sized aggregate.
    */
  def gateKappa(docs: DataFrame, thresholdU: Long = 5000L): DataFrame = {
    val dec = "decimal(38,0)"
    val toks = tokens(col("text"))
    val base = docs.select(col("source"),
      size(toks).as("n"),
      length(col("text")).as("chars"),
      (length(col("text")) - (size(toks) - 1)).as("letters"),
      size(filter(toks, t => t.rlike("[a-z]"))).as("n_alpha"),
      stopwordCount(toks).as("n_stop"),
      size(array_distinct(toks)).as("n_uniq"))
    val flags = base.select(col("source"),
      (col("n") >= 10 && col("n") <= 1000 &&
        col("letters") >= col("n") * 3 &&
        col("letters") <= col("n") * 10 &&
        col("n_alpha") * 5 >= col("n") * 4 &&
        col("n_stop") >= 2 &&
        col("n_uniq") * 5 >= col("n")).cast("long").as("ga"),
      (expr("""CAST(floor(round(
          least(n_stop / n * 2.5, 1.0) * 0.5 +
          least((chars - (n - 1)) / n / 8.0, 1.0) * 0.5, 4)
          * 10000 + 0.5) AS BIGINT)""") >= thresholdU)
        .cast("long").as("gb"))
    flags.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ga")).as("n_pass_gopher"),
        sum(col("gb")).as("n_pass_score"),
        sum(col("ga") * col("gb") +
          (lit(1L) - col("ga")) * (lit(1L) - col("gb"))).as("n_agree"))
      .withColumn("pe",
        col("n_pass_gopher").cast(dec) * col("n_pass_score") +
          (col("n_docs") - col("n_pass_gopher")).cast(dec) *
            (col("n_docs") - col("n_pass_score")))
      .select(col("source"), col("n_docs"), col("n_pass_gopher"),
        col("n_pass_score"), col("n_agree"),
        expr("n_agree * 1000000L div n_docs").as("agree_ppm"),
        when(col("n_docs").cast(dec) * col("n_docs") === col("pe"),
          lit(null).cast("long"))
          .otherwise(expr(
            """CAST(((n_agree * CAST(n_docs AS DECIMAL(38,0)) - pe)
              | * 1000000) div
              | (CAST(n_docs AS DECIMAL(38,0)) * n_docs - pe)
              | AS BIGINT)""".stripMargin))
          .as("kappa_ppm"))
  }

  /** Per-source n-gram diversity: gram occurrences vs distinct gram
    * types vs hapax grams (seen once), with type-token and hapax
    * shares in exact ppm. The de-facto Self-BLEU-style mode-collapse
    * screen for generated/templated corpora — a source whose ttr_ppm
    * craters is emitting the same passages over and over. Two-stage
    * exact distinct (gram-keyed count, then source-keyed reduce): the
    * big shuffle is on (source, gram) with map-side combine; nothing
    * corpus-sized ever sits on one task.
    */
  def ngramDiversity(docs: DataFrame, n: Int): DataFrame = {
    val grams = docs.select(col("source"),
      explode(ngramsCol(tokens(col("text")), n)).as("gram"))
    grams.groupBy("source", "gram").agg(count(lit(1)).as("cnt"))
      .groupBy("source")
      .agg(sum("cnt").as("n_grams"),
        count(lit(1)).as("n_types"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("ttr_ppm", expr("n_types * 1000000L div n_grams"))
      .withColumn("hapax_ppm", expr("n_hapax * 1000000L div n_types"))
  }
}
