package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline (SURVEY §7.5):
  * exact (hash-groupBy), MinHash+LSH banding, SimHash, exact n-gram
  * Jaccard, and embedding-cosine near-dup. Hash functions are seeded and
  * platform-independent so results are deterministic across runs and
  * cluster layouts.
  *
  * Scale notes (100 TB):
  *  - exact dedup is one hash-shuffle on a 64-bit digest, not the text;
  *  - MinHash/SimHash signatures are computed map-side (one pass per
  *    document), candidates come from an LSH-band shuffle whose key
  *    cardinality is tunable (bands × rows); only candidate pairs —
  *    not all O(n²) pairs — are verified;
  *  - oversized LSH buckets (degenerate content) are capped to keep the
  *    per-bucket pair blowup bounded.
  */
object Dedup {

  /** Materialize the bounded result (eager localCheckpoint) and release
    * the shared persisted subframes that fed it — the r8/r9-advisory
    * discipline: a persist returned inside a lazy frame otherwise lives
    * for the whole session. The checkpointed result is pair/report-
    * sized by construction everywhere this is used; its blocks are
    * released by the ContextCleaner when the frame is GC'd.
    */
  private def materializeAndRelease(out: DataFrame,
      shared: DataFrame*): DataFrame = {
    val cp = out.localCheckpoint(true)
    shared.foreach(_.unpersist(false))
    cp
  }

  // ------------------------------------------------------------- exact

  /** Exact dedup: keep the smallest doc_id per identical text. The
    * shuffle key is a 64-bit xxhash of the text, so the wide string
    * column never routes through the exchange.
    */
  def exactDedup(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val h = xxhash64(col(textCol))
    docs
      .groupBy(h.as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** Dedup impact report: per-source survivorship accounting of the
    * exact-dedup pass — documents and tokens that would be removed,
    * with a ppm removal rate — the curation dashboard number ("which
    * sources are mostly duplicates?") a pipeline publishes after every
    * dedup run. Keeper attribution is GLOBAL (min doc_id per text
    * digest), so a doc duplicated across sources counts as removed in
    * the non-keeper's source — exactly the cross-source contamination
    * signal. Scale: text shuffles nowhere — the digest groupBy and the
    * join carry 16-byte md5 keys; the report is sources-sized. The key
    * is 128-bit (not xxhash64) because the oracle groups on FULL text:
    * a 64-bit digest has a ~3% birthday chance of SOME collision at
    * 10⁹ docs, which would silently merge two distinct documents into
    * one cluster and mis-charge the removal counts; at 128 bits the
    * bound is ~10⁻²⁰ — negligible — while text still never shuffles.
    */
  def dedupImpactReport(docs: DataFrame): DataFrame = {
    val h = docs.select(col("doc_id"), col("source"),
      md5(col("text").cast("binary")).as("th"),
      size(split(col("text"), " ")).cast("long").as("ntok"))
    val keep = h.groupBy("th").agg(min("doc_id").as("keeper"))
    h.join(keep, Seq("th"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") =!= col("keeper"), 1L).otherwise(0L))
          .as("n_removed"),
        sum(col("ntok")).as("tokens_total"),
        sum(when(col("doc_id") =!= col("keeper"), col("ntok"))
          .otherwise(0L)).as("tokens_removed"))
      .withColumn("removed_ppm", expr("n_removed * 1000000 div n_docs"))
  }

  /** Incremental exact dedup of an incoming batch against an existing
    * corpus — the merge-on-ingest mode a production pipeline actually
    * runs (the full-corpus [[exactDedup]] re-scan is the bootstrap,
    * not the steady state). The corpus contributes a DIGEST-ONLY side
    * (8-byte xxhash64 keys — its text never shuffles, and at 100 TB
    * the digest table is the thing you keep materialized between
    * ingests); the incoming slice is hashed once and joined, and also
    * dedups within itself with the min-id keeper. Per incoming doc:
    * `new` (kept), `dup_corpus` (digest already known), or `dup_batch`
    * (another incoming doc with the same text keeps it).
    */
  def incrementalDedup(corpus: DataFrame, incoming: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    // one implementation: digests computed inline here, or read from
    // the materialized table via DigestStore directly (the steady-state
    // posture — see DigestStore's Scaladoc). The joins are null-safe
    // (<=>): xxhash64(null) = null, and a plain equi join would
    // silently DROP null-text incoming docs, disagreeing with
    // exactDedup's null-grouping (the ingest-algebra equivalence).
    graft.io.DigestStore.incrementalDedup(
      graft.io.DigestStore.digests(corpus, textCol), incoming,
      textCol, idCol)

  // ----------------------------------------------------------- minhash

  /** FNV-1a 64-bit over a string — deterministic shingle hash. */
  private def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** splitmix64 — seeds the per-function universal hash params. */
  private def splitmix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Unsigned (a_f, b_f) universal-hash parameters for a seed — the
    * exact derivation [[minhashSignature]] uses, exposed so the DuckDB
    * oracle text is generated from one source of truth.
    */
  def minhashParams(numHashes: Int, seed: Long): Seq[(BigInt, BigInt)] = {
    def u(x: Long) = BigInt(java.lang.Long.toUnsignedString(x))
    (0 until numHashes).map { f =>
      (u(splitmix(seed + 2L * f) | 1L), u(splitmix(seed + 2L * f + 1)))
    }
  }

  /** k-shingles of the token array (joined with spaces). */
  private def shingleHashes(toks: Seq[String], k: Int): Array[Long] = {
    if (toks.length < k) Array(fnv1a(toks.mkString(" ")))
    else {
      val out = new Array[Long](toks.length - k + 1)
      var i = 0
      while (i + k <= toks.length) {
        out(i) = fnv1a(toks.slice(i, i + k).mkString(" "))
        i += 1
      }
      out
    }
  }

  /** MinHash signature: numHashes permutations h_i(x) = a_i·x + b_i over
    * the shingle hash set (odd a_i from splitmix64 of the seed).
    */
  private[graft] def minhashSignature(
      toks: Seq[String], numHashes: Int, shingleK: Int,
      seed: Long): Array[Long] = {
    val sh = shingleHashes(toks, shingleK)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var f = 0
    while (f < numHashes) {
      val a = splitmix(seed + 2L * f) | 1L
      val b = splitmix(seed + 2L * f + 1)
      var m = Long.MaxValue
      var i = 0
      while (i < sh.length) {
        val v = a * sh(i) + b
        if (v < m) m = v
        i += 1
      }
      sig(f) = m
      f += 1
    }
    sig
  }

  /** MinHash-LSH candidate pairs with estimated Jaccard.
    *
    * @param bands       LSH bands; rows-per-band = numHashes / bands
    * @param minEstJaccard filter on the signature-agreement estimate
    * @param maxBucket   skip degenerate buckets above this size
    */
  /** Scale shape: the LSH shuffle routes only (doc_id, band, bucket) —
    * 24 bytes/row — never the 32-long signatures; candidate pairs come
    * from a (band, bucket) self-join with oversized buckets excluded
    * up front (degenerate content would otherwise blow up k² per
    * bucket), and signatures are fetched once per surviving pair for
    * the agreement estimate (codegen'd zip_with fold, no UDF).
    */
  /** Per-doc MinHash signature table (doc_id, sig) — the standing
    * NEAR-dup index a production pipeline materializes between ingests
    * (the [[graft.io.DigestStore]] analog for approximate matching):
    * 32 longs = 256 bytes per doc, from which band keys re-derive
    * map-side with no text pass. One tokenize+shingle+hash pass over
    * the input; the text itself never shuffles downstream.
    */
  def signatures(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", numHashes: Int = 32, shingleK: Int = 3,
      seed: Long = 42L): DataFrame = {
    val sigUdf = udf { (toks: Seq[String]) =>
      minhashSignature(toks, numHashes, shingleK, seed)
    }
    docs.select(col(idCol).as("doc_id"),
      sigUdf(split(col(textCol), " ")).as("sig"))
  }

  /** Explode a signature table to its (doc_id, band, bucket) LSH band
    * keys — 24-byte rows, the only thing the candidate join shuffles.
    * `keepSig` carries the signature through (streaming consumers need
    * it alongside, since a stream cannot self-join to fetch it later).
    * Map-only, so it works on batch and streaming frames alike.
    */
  def bandTable(sigs: DataFrame, numHashes: Int = 32, bands: Int = 8,
      keepSig: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val bandUdf = udf { (sig: Seq[Long]) =>
      sig.grouped(rowsPerBand).zipWithIndex.map { case (slice, b) =>
        (b, slice.foldLeft(0xcbf29ce484222325L)((h, v) =>
          (h ^ v) * 0x100000001b3L))
      }.toSeq
    }
    val base = sigs.select(col("doc_id"), col("sig"),
      explode(bandUdf(col("sig"))).as("bb"))
    val shaped = base.select(col("doc_id"), col("sig"),
      col("bb._1").as("band"), col("bb._2").as("bucket"))
    if (keepSig) shaped else shaped.drop("sig")
  }

  /** Signature-agreement Jaccard estimate between two sig columns —
    * k-agreeing-of-numHashes, a dyadic rational (engine-exact). */
  private def estJaccardCol(a: Column, b: Column, numHashes: Int): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / numHashes

  /** @param hotBucketStar how oversized (> maxBucket) buckets join
    *   candidate generation: `false` (default) excludes them entirely
    *   — the degenerate-content guard, with the documented recall
    *   trade that a VIRAL NEAR-DUP FAMILY (one press release
    *   syndicated k times: every band bucket holds all k members)
    *   vanishes from candidates, and exact/URL dedup cannot catch it
    *   because the copies are near, not equal. `true` adds STAR edges
    *   for hot buckets — every member pairs with the bucket's MINIMUM
    *   doc_id only — so each hot bucket contributes k−1 rows instead
    *   of k(k−1)/2: the family stays CONNECTED (one hub) for the
    *   connected-components keeper pass at strictly linear volume,
    *   and est-Jaccard verification still gates every star edge.
    *   Measured under the planted adversary (SCALE.md r13): drop =
    *   258 pairs with the 250-family invisible; star = the family
    *   fully connected for ~249 extra verified edges; uncapped =
    *   31,383 pairs (k²/2).
    */
  def minhashCandidates(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", numHashes: Int = 32, bands: Int = 8,
      shingleK: Int = 3, seed: Long = 42L, minEstJaccard: Double = 0.5,
      maxBucket: Int = 64, hotBucketStar: Boolean = false): DataFrame = {
    // materialize-once: the signature projection (32 permutations ×
    // all shingles per doc) feeds THREE plan arms — banding + both
    // sides of the per-pair signature fetch. CacheManager dedupes by
    // canonical plan, so repeated calls share one entry.
    val signed = signatures(docs, textCol, idCol, numHashes, shingleK, seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = bandTable(signed, numHashes, bands)
    val smallBuckets = banded.groupBy("band", "bucket")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n").between(2, maxBucket))
      .select("band", "bucket")
    val inBucket = banded.join(smallBuckets, Seq("band", "bucket"))
    val fullPairs = inBucket.as("ba")
      .join(inBucket.as("bb"),
        col("ba.band") === col("bb.band") &&
          col("ba.bucket") === col("bb.bucket") &&
          col("ba.doc_id") < col("bb.doc_id"))
      .select(col("ba.doc_id").as("doc_a"), col("bb.doc_id").as("doc_b"))
    val pairs = (if (!hotBucketStar) fullPairs
      else {
        // hub = bucket-min doc_id; every other member pairs with the
        // hub only (doc_id > hub, so (doc_a, doc_b) stays ordered) —
        // k−1 rows per hot bucket, never k²
        val hubs = banded.groupBy("band", "bucket")
          .agg(count(lit(1)).as("__n"), min("doc_id").as("hub"))
          .filter(col("__n") > maxBucket)
          .select("band", "bucket", "hub")
        fullPairs.unionByName(
          banded.join(hubs, Seq("band", "bucket"))
            .filter(col("doc_id") > col("hub"))
            .select(col("hub").as("doc_a"), col("doc_id").as("doc_b")))
      }).distinct()
    materializeAndRelease(pairs
      .join(signed.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")),
        "doc_a")
      .join(signed.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")),
        "doc_b")
      .withColumn("est_jaccard",
        estJaccardCol(col("sig_a"), col("sig_b"), numHashes))
      .filter(col("est_jaccard") >= minEstJaccard)
      .select("doc_a", "doc_b", "est_jaccard"), signed)
  }

  /** Incremental NEAR-dup ingest — the MinHash-LSH analog of
    * [[incrementalDedup]], the steady-state mode a production pipeline
    * actually runs: the standing corpus contributes its materialized
    * SIGNATURE table only (`corpusSigs`, from [[signatures]] — 256
    * bytes/doc; corpus text is never re-read, and band keys re-derive
    * from the signatures map-side with no text pass). The incoming
    * batch is signed once; candidates come from (band, bucket) equi
    * joins — batch×corpus and batch×batch — with oversized buckets
    * excluded PER SIDE (each side's own population vs `maxBucket`,
    * the standard degenerate-content cap), and survivors verify on
    * the signature-agreement estimate (dyadic k/numHashes —
    * engine-exact).
    *
    * Per incoming doc: `near_dup_corpus` (best corpus match at est ≥
    * τ — corpus matches take precedence, mirroring incrementalDedup's
    * dup_corpus), else `near_dup_batch` (a SMALLER-id batch doc
    * matches at est ≥ τ — min-id keeper, the batch-internal
    * convention), else `new`. `match_id`/`est_jaccard` carry the best
    * match (est desc, id asc — a total order, so the pick is
    * deterministic).
    *
    * Scale shape: per-ingest cost is O(batch) band rows joining a
    * band-bucketed index scan — never O(corpus); the only wide rows
    * are the per-surviving-pair signature fetches.
    */
  def incrementalNearDup(corpusSigs: DataFrame, incoming: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      numHashes: Int = 32, bands: Int = 8, shingleK: Int = 3,
      seed: Long = 42L, minEstJaccard: Double = 0.5,
      maxBucket: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val incSigs = signatures(incoming, textCol, idCol, numHashes,
        shingleK, seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def capped(bandsDf: DataFrame): DataFrame =
      bandsDf.join(
        bandsDf.groupBy("band", "bucket").agg(count(lit(1)).as("__n"))
          .filter(col("__n") <= maxBucket).select("band", "bucket"),
        Seq("band", "bucket"))
    val cBands = capped(bandTable(corpusSigs, numHashes, bands))
      .withColumnRenamed("doc_id", "corpus_id")
    val iBands = capped(bandTable(incSigs, numHashes, bands))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("est").desc, col("match_id").asc)
    def best(cands: DataFrame, otherSigs: DataFrame): DataFrame =
      cands
        .join(incSigs.select(col("doc_id"), col("sig").as("si")), "doc_id")
        .join(otherSigs.select(col("doc_id").as("match_id"),
          col("sig").as("sm")), "match_id")
        .withColumn("est", estJaccardCol(col("si"), col("sm"), numHashes))
        .filter(col("est") >= minEstJaccard)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("doc_id"), col("match_id"), col("est"))
    val corpusBest = best(
      iBands.join(cBands, Seq("band", "bucket"))
        .select(col("doc_id"), col("corpus_id").as("match_id")).distinct()
        .select("doc_id", "match_id"),
      corpusSigs)
    val batchBest = best(
      iBands.as("a").join(iBands.as("b"),
          col("a.band") === col("b.band") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.doc_id") > col("b.doc_id"))
        .select(col("a.doc_id").as("doc_id"),
          col("b.doc_id").as("match_id")).distinct(),
      incSigs)
    materializeAndRelease(incSigs.select("doc_id")
      .join(corpusBest.select(col("doc_id"), col("match_id").as("cm"),
        col("est").as("ce")), Seq("doc_id"), "left")
      .join(batchBest.select(col("doc_id"), col("match_id").as("bm"),
        col("est").as("be")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("cm").isNotNull, "near_dup_corpus")
          .when(col("bm").isNotNull, "near_dup_batch")
          .otherwise("new").as("status"),
        when(col("cm").isNotNull, col("cm")).otherwise(col("bm"))
          .as("match_id"),
        round(when(col("cm").isNotNull, col("ce")).otherwise(col("be")), 4)
          .as("est_jaccard")), incSigs)
  }

  // --------------------------------------------------------------- kmv

  /** KMV (k-minimum-values) bottom-k distinct sketches per corpus
    * slice, joined pairwise into the shingle-overlap estimates the
    * sketch exists for — "how much of source A's content also appears
    * in source B" without ever comparing documents. This is the
    * corpus-level complement of the per-document dedup family above:
    * MinHash asks whether two DOCUMENTS are near-identical; KMV asks
    * how much two whole CORPUS SLICES share (CommonCrawl-vs-C4-style
    * auditing before mixing sources into a training run).
    *
    * Estimator (Beyer et al. 2007): with K = the k smallest distinct
    * hashes of A ∪ B (= bottom-k of kmv(A) ∪ kmv(B) — bottom-k sketches
    * are closed under union), J(A,B) ≈ |K ∩ kmv(A) ∩ kmv(B)| / |K|.
    * Reported as an exact ppm integer so the oracle comparison is
    * hash-stable.
    *
    * Scale shape: the only data-sized exchange is the slice-keyed
    * aggregation, and [[graft.functions.BoundedMinSetAgg]] caps every
    * map-side partial at k longs BEFORE the exchange — per (partition,
    * slice) at most k × 8 bytes moves, independent of corpus size. The
    * pairwise join runs on n_slices rows (one per source), so the
    * inequality self-join is a broadcast over a table that fits in one
    * page; all array work is O(k) per pair.
    */
  def kmvOverlap(docs: DataFrame, sliceCol: String = "source",
      textCol: String = "text", k: Int = 128,
      shingleK: Int = 3): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val sh = udf { (text: String) =>
      if (text == null) Array.empty[Long]
      else shingleHashes(text.split(" ").toSeq, shingleK)
    }
    val sketches = docs
      .select(col(sliceCol).as("slice"), explode(sh(col(textCol))).as("h"))
      .groupBy("slice")
      .agg(graft.functions.BoundedMinSet
        .bounded_min_set(col("h"), k).as("kmv"))
    sketches.select(col("slice").as("slice_a"), col("kmv").as("ka"))
      .join(sketches.select(col("slice").as("slice_b"), col("kmv").as("kb")),
        col("slice_a") < col("slice_b"))
      .withColumn("ku",
        slice(array_sort(array_union(col("ka"), col("kb"))), 1, k))
      .select(col("slice_a"), col("slice_b"),
        size(col("ku")).as("k_used"),
        size(array_intersect(array_intersect(col("ku"), col("ka")),
          col("kb"))).cast("long").as("n_common"))
      .withColumn("jaccard_ppm", expr("n_common * 1000000 div k_used"))
  }

  // ----------------------------------------------------------- simhash

  /** 64-bit SimHash over token FNV hashes. */
  private[graft] def simhash64(toks: Seq[String]): Long = {
    val acc = new Array[Int](64)
    toks.foreach { t =>
      val h = fnv1a(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** SimHash near-dup candidates: 4 bands of 16 bits — any shared band
    * makes a candidate (catches Hamming distance ≤ 3 with high recall);
    * candidates verified by exact Hamming distance.
    */
  def simhashCandidates(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", maxHamming: Int = 8,
      maxBucket: Int = 64): DataFrame = {
    val shUdf = udf { (toks: Seq[String]) => simhash64(toks) }
    val signed = docs.select(col(idCol).as("doc_id"),
      shUdf(split(col(textCol), " ")).as("simhash"))
    val banded = signed.select(col("doc_id"), col("simhash"),
      explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bucket",
        expr("(simhash >> (band * 16)) & 65535"))
    val grouped = banded.groupBy("band", "bucket")
      .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
    val pairUdf = udf { (members: Seq[org.apache.spark.sql.Row]) =>
      val sorted = members.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      for {
        i <- sorted.indices
        j <- (i + 1) until sorted.length
      } yield (sorted(i)._1, sorted(j)._1,
        java.lang.Long.bitCount(sorted(i)._2 ^ sorted(j)._2))
    }
    grouped.select(explode(pairUdf(col("members"))).as("p"))
      .select(col("p._1").as("doc_a"), col("p._2").as("doc_b"),
        col("p._3").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ----------------------------------------- exact n-gram Jaccard

  /** Per-doc sorted distinct n-gram hash sets: (doc_id, grams, n_grams).
    * Gram = xxhash64 of n space-joined tokens (8-byte keys through every
    * downstream exchange instead of gram strings; same result barring
    * 2^-64 collisions). All codegen'd array expressions — no explode, no
    * UDF.
    */
  private def gramSets(docs: DataFrame, n: Int, textCol: String,
      idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .select(col("doc_id"), array_sort(array_distinct(expr(
        s"transform(sequence(1, greatest(size(toks) - ${n - 1}, 1)), " +
          s"i -> xxhash64(array_join(slice(toks, i, $n), ' ')))"))).as("grams"))
      .withColumn("n_grams", size(col("grams")))

  /** Exact token-n-gram Jaccard pairs ≥ threshold — AllPairs/PPJoin-style
    * prefix + length filtering (Bayardo et al., WWW'07), then exact
    * verification on the full gram sets.
    *
    * Why not a naive gram self-join: frequent shingles produce join
    * groups that blow up quadratically (a gram shared by k docs emits
    * k² pair rows) — unbounded skew at corpus scale. With the prefix
    * filter, only the first `L = n_grams - floor(t·n_grams) + 1` grams
    * of each doc (under the global hash order) participate in the join:
    * any pair with true Jaccard ≥ t MUST share a prefix gram, so the
    * result is still exact, but the join volume shrinks ~(1-t)² and is
    * further capped by the length-ratio predicate (|B|·t ≤ |A| when
    * |A| ≤ |B|). Verification is one array_intersect over the two
    * sorted gram arrays per surviving candidate — no second shuffle of
    * the gram table.
    *
    * Float safety: prefix length uses floor(t·n)+1-complement (one
    * longer than the ceil-based textbook bound when t·n is integral) so
    * binary-rounding of t can only ever lengthen the prefix, never drop
    * a true pair.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3,
      minJaccard: Double = 0.8): DataFrame = {
    // materialize-once: the gram-set projection feeds FOUR plan arms
    // (prefix self-join both sides + verify both sides); persisting it
    // computes the tokenize+hash+sort work once instead of four times,
    // MEMORY_AND_DISK spills rather than evicting at corpus scale —
    // then the cache entry is RELEASED once the (pair-sized) result is
    // checkpointed, so the call leaves no session-lived state (r9
    // advisory leak pattern).
    val sets = gramSets(docs, n, "text", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    materializeAndRelease(
      verifyPairsNgram(jaccardCandidates(sets, minJaccard), sets,
        minJaccard), sets)
  }

  /** AllPairs candidate generation shared by [[ngramJaccardPairs]] and
    * [[jaccardThresholdCurve]]: prefix self-join + length-ratio cut,
    * both LOSSLESS for true J ≥ minJaccard.
    */
  /** AllPairs prefix length `n_grams - floor(t·n_grams) + 1` as a
    * column expression — the ONE definition of the prefix rule, shared
    * by candidate generation ([[jaccardCandidates]],
    * [[ngramContainmentPairs]]) and the df-cap audit helper
    * ([[maxPrefixDocFreq]]): if the rule is ever re-tuned, the audit
    * pins the same quantity by construction (r10 advisory — a private
    * copy in the helper would silently drift).
    */
  private def prefixLenCol(threshold: Double) =
    (col("n_grams") - floor(col("n_grams") * lit(threshold)) + 1)
      .cast("int")

  private def jaccardCandidates(sets: DataFrame, minJaccard: Double,
      maxDocFreq: Option[Int] = None): DataFrame = {
    val raw = sets.select(col("doc_id"), col("n_grams"),
      explode(slice(col("grams"), lit(1), prefixLenCol(minJaccard)))
        .as("g"))
    // At LOW thresholds the prefix is a large fraction of each doc's
    // grams, so common shingles land in MANY prefixes and the
    // self-join pays Σ prefix-df² on them — measured 56× cost at 10×
    // data (sf1, t=0.5) before the cap. `maxDocFreq` drops grams whose
    // prefix doc-frequency exceeds the cap from CANDIDATE GENERATION
    // (per-gram df table equi-joined back, the ngramContainmentPairs
    // pattern); verification stays exact, so a true pair is lost only
    // when every gram it shares inside both prefixes is hot — the
    // standard bounded-recall trade.
    val prefix = maxDocFreq match {
      case Some(cap) =>
        require(cap >= 2, s"maxDocFreq out of range: $cap")
        val df = raw.groupBy("g").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select("g")
        raw.join(df, "g")
      case None => raw
    }
    val a = prefix.as("pa")
    val b = prefix.as("pb")
    a.join(b,
        col("pa.g") === col("pb.g") &&
          col("pa.doc_id") < col("pb.doc_id") &&
          // length filter: J ≥ t ⟹ t·|B| ≤ |A| and t·|A| ≤ |B|
          // (0.5 slack on integer sizes absorbs float rounding, safe side)
          col("pb.n_grams") * lit(minJaccard) <= col("pa.n_grams") + lit(0.5) &&
          col("pa.n_grams") * lit(minJaccard) <= col("pb.n_grams") + lit(0.5))
      .select(col("pa.doc_id").as("doc_a"), col("pb.doc_id").as("doc_b"))
      .distinct()
  }

  /** Threshold-sensitivity curve for exact n-gram Jaccard dedup: how
    * many pairs each threshold choice adds or removes — the histogram
    * of exact Jaccard DECILES over all pairs with J ≥ minJaccard,
    * plus the top-down cumulative (cum_pairs at bucket b = pairs a
    * threshold of b/10 would keep). The audit a curator runs BEFORE
    * pinning the dedup threshold: a fat bucket just under the current
    * cut means the decision is knife-edged. Buckets are exact integer
    * cross-multiplications ((n_inter·10) div union; the ≥ gate is
    * 2·n_inter ≥ union) — no float knife-edge, oracle replays bit for
    * bit. Cost note: the AllPairs prefix/length bounds are set by the
    * LOWEST threshold in the curve (prefix length grows as (1−t)·n),
    * so the curve costs what a single run at minJaccard costs; the
    * ≤ 6-row histogram window is bucket-bounded.
    */
  def jaccardThresholdCurve(docs: DataFrame, n: Int = 3,
      minJaccard: Double = 0.5,
      maxDocFreq: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    pairSimsThen(docs, n, minJaccard, maxDocFreq, tNum = 1, tDen = 2) {
      sims =>
        sims.groupBy(expr("(n_inter * 10L) div un").as("bucket"))
          .agg(count(lit(1)).as("n_pairs"))
          .withColumn("cum_pairs",
            sum("n_pairs").over(Window.orderBy(col("bucket").desc)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    }
  }

  /** Exact pair-similarity plumbing shared by [[jaccardThresholdCurve]]
    * and [[lshPlan]]: AllPairs candidates at `minJaccard` (lossless for
    * true J ≥ minJaccard), exact intersect/union per pair, then the
    * integer cross-multiplied gate n_inter·tDen ≥ un·tNum (the rational
    * form of J ≥ tNum/tDen — no float knife-edge). `f` consumes the
    * (doc_a, doc_b, n_inter, un) frame while the gram sets stay
    * persisted; the result is materialized and the persist released
    * before returning (no session-lived state).
    */
  private def pairSimsThen(docs: DataFrame, n: Int, minJaccard: Double,
      maxDocFreq: Option[Int], tNum: Long, tDen: Long)(
      f: DataFrame => DataFrame): DataFrame = {
    val sets = gramSets(docs, n, "text", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sims = jaccardCandidates(sets, minJaccard, maxDocFreq)
      .join(sets.select(col("doc_id").as("doc_a"), col("grams").as("ga"),
        col("n_grams").as("n_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("grams").as("gb"),
        col("n_grams").as("n_b")), "doc_b")
      .withColumn("n_inter",
        size(array_intersect(col("ga"), col("gb"))).cast("long"))
      .withColumn("un", col("n_a") + col("n_b") - col("n_inter"))
      .filter(col("n_inter") * lit(tDen) >= col("un") * lit(tNum))
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("un"))
    materializeAndRelease(f(sims), sets)
  }

  /** MinHash-LSH (bands, rows) parameter planner: for every way to
    * spend a 128-minhash signature budget (r rows/band × b bands,
    * r·b = 128), integrate the banding S-curve
    * P(s) = 1 − (1 − sʳ)ᵇ against the corpus's MEASURED pair-similarity
    * histogram and report the expected false-candidate mass below the
    * target threshold t = 1/2 and the expected missed-pair mass at or
    * above it. The standard design step (Leskovec/Rajaraman/Ullman,
    * MMDS ch. 3) usually done against an assumed similarity
    * distribution — here it is weighted by what the corpus actually
    * contains, so a corpus whose near-dup mass hugs the threshold gets
    * a steeper (higher-r) pick than one with only exact-ish dups.
    * `chosen = 1` marks the config(s) minimizing fp+fn.
    *
    * Determinism: the S-curve is evaluated in FIXED POINT (denominator
    * 10¹², s from the integer percent bucket), every power via
    * square-and-floor — (x·y) div 10¹² in DECIMAL — so both engines
    * replay the identical integer recurrence; no pow(), no doubles.
    * µ-pair masses are DECIMAL(38,0)-weighted sums floored once at the
    * end.
    *
    * Scope: the histogram covers the pairs AllPairs can measure
    * losslessly (J ≥ minJaccard = 0.3). Below-band FP mass is excluded
    * by construction, and negligible for the configs that matter: at
    * (r=8, b=16), P(0.3) ≈ 16·0.3⁸ ≈ 10⁻³. Scale shape: the pair stage
    * is the threshold-curve's prefix join (its cost = one run at
    * minJaccard; `maxDocFreq` is the same production df knob — and at
    * t=0.3 the prefix is 70% of every doc's grams, so the knob is not
    * optional at scale: uncapped measured 112.5 s isolated at sf1 vs
    * 5.1 s at cap 16, with ZERO pairs lost at verify scale per the
    * shared uncapped oracle); at corpus scale a planner runs on a
    * hash-sample of docs besides — the histogram is a design-time
    * readout, not a per-run pass. Past the
    * pair stage everything is ≤100 histogram rows × 6 configs.
    */
  def lshPlan(docs: DataFrame, n: Int = 3, minJaccard: Double = 0.3,
      maxDocFreq: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val D = 1000000000000L
    def sq(src: String) =
      expr(s"cast(cast($src as decimal(20,0)) * $src div ${D}L as bigint)")
    pairSimsThen(docs, n, minJaccard, maxDocFreq, tNum = 3, tDen = 10) {
      sims =>
        val hist = sims
          .groupBy(expr("(n_inter * 100L) div un").as("s_pct"))
          .agg(count(lit(1)).as("n_pairs"))
        val configs = hist.sparkSession.range(0, 1)
          .select(explode(array(Seq(1, 2, 4, 8, 16, 32).map(lit(_)): _*))
            .as("r"))
          .withColumn("b", expr("cast(128 div r as int)"))
        val g = hist.crossJoin(broadcast(configs))
          .withColumn("p1", expr("s_pct * 10000000000L"))
          .withColumn("p2", sq("p1")).withColumn("p4", sq("p2"))
          .withColumn("p8", sq("p4")).withColumn("p16", sq("p8"))
          .withColumn("p32", sq("p16"))
          .withColumn("q1", expr(s"${D}L - (CASE r WHEN 1 THEN p1 " +
            "WHEN 2 THEN p2 WHEN 4 THEN p4 WHEN 8 THEN p8 " +
            "WHEN 16 THEN p16 ELSE p32 END)"))
          .withColumn("q2", sq("q1")).withColumn("q4", sq("q2"))
          .withColumn("q8", sq("q4")).withColumn("q16", sq("q8"))
          .withColumn("q32", sq("q16")).withColumn("q64", sq("q32"))
          .withColumn("q128", sq("q64"))
          .withColumn("pc", expr(s"${D}L - (CASE b WHEN 4 THEN q4 " +
            "WHEN 8 THEN q8 WHEN 16 THEN q16 WHEN 32 THEN q32 " +
            "WHEN 64 THEN q64 ELSE q128 END)"))
        def mass(cond: String, p: String) =
          sum(expr(s"CASE WHEN $cond THEN cast(n_pairs as decimal(18,0)) " +
            s"* ($p) ELSE cast(0 as decimal(18,0)) END"))
        g.groupBy("r", "b")
          .agg(sum("n_pairs").as("n_pairs_obs"),
            mass("s_pct < 50", "pc").as("fpw"),
            mass("s_pct >= 50", s"${D}L - pc").as("fnw"),
            mass("s_pct >= 50", "pc").as("cw"))
          .select(col("r"), col("b"), col("n_pairs_obs"),
            expr("cast(fpw div 1000000L as bigint)").as("fp_lo_upairs"),
            expr("cast(fnw div 1000000L as bigint)").as("fn_hi_upairs"),
            expr("cast(cw div 1000000L as bigint)").as("caught_hi_upairs"))
          .withColumn("err_upairs",
            expr("fp_lo_upairs + fn_hi_upairs"))
          .withColumn("chosen",
            (col("err_upairs") ===
              min("err_upairs").over(Window.partitionBy())).cast("int"))
    }
  }

  /** Audit helper for the capped-curve correctness gate's DATA-DEPENDENT
    * assumption: `dd_threshold_curve_capped` verifies the
    * maxDocFreq-capped plan against the UNCAPPED exact oracle, which is
    * only an identity while no prefix gram's doc-frequency exceeds the
    * cap at verify scale (then the df filter passes everything and
    * capped ≡ uncapped). This returns the max prefix-gram df so a spec
    * can assert the assumption against the committed testdata — a
    * future regen with a hotter gram distribution then fails with a
    * POINTED message (documented bounded-recall trade, regenerate or
    * re-tune the cap) instead of an opaque oracle-hash red.
    */
  def maxPrefixDocFreq(docs: DataFrame, n: Int = 3,
      minJaccard: Double = 0.5): Long = {
    val sets = gramSets(docs, n, "text", "doc_id")
    sets.select(col("doc_id"),
        explode(slice(col("grams"), lit(1), prefixLenCol(minJaccard)))
          .as("g"))
      .groupBy("g").agg(count(lit(1)).as("df"))
      .agg(max(col("df"))).collect()(0).getLong(0)
  }

  /** Exact n-gram CONTAINMENT pairs: C(sub→super) = |sub ∩ super| /
    * |sub| ≥ t — the ASYMMETRIC near-dup relation symmetric Jaccard
    * misses (a tweet quoted inside an article scores J ≈ 0 but
    * C = 1.0): the quote-inclusion / partial-plagiarism detector of a
    * curation pipeline.
    *
    * Prefix filter for containment (AllPairs adapted): if C ≥ t, the
    * first `n_sub - floor(t·n_sub) + 1` grams of the SUB side (global
    * hash order) must hit the super side's full set, so only the sub
    * prefix explodes; verification is exact on the full gram sets.
    * Unlike Jaccard there is no length-ratio cap — the super side
    * legitimately dwarfs the sub — so the super side joins its FULL
    * posting lists: at corpus scale a hot shingle's posting list is
    * the skew hazard, and `maxDocFreq` is the production knob — grams
    * whose doc-frequency exceeds the cap are dropped from CANDIDATE
    * GENERATION on both sides before the join (a gram shared by k
    * docs emits O(k·prefix-hits) candidate rows, quadratic in k when
    * the sub prefix also carries it — "in the house" at 10⁹ docs is
    * a multi-million-row posting list). Verification stays EXACT on
    * the full gram sets, so capping only loses candidates whose
    * ENTIRE sub-side prefix is hot — the standard bounded-recall
    * trade (hot shingles are stopword runs that near-clones never
    * rely on exclusively). The frequency filter is a per-gram df
    * table equi-joined back (one row per gram — linear, never
    * pair-producing), not a broadcast: the hot-gram set is small but
    * the SAFE side of the estimate is to keep it off the driver. The
    * oracle-checked entry runs uncapped so the SQL replay is exact;
    * the capped bench twin (`dd_ngram_containment_capped`) times the
    * knob side by side.
    */
  def ngramContainmentPairs(docs: DataFrame, n: Int = 3,
      minContainment: Double = 0.9,
      maxDocFreq: Option[Int] = None): DataFrame = {
    val sets = gramSets(docs, n, "text", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val subAll = sets.select(col("doc_id").as("doc_sub"),
      explode(slice(col("grams"), lit(1), prefixLenCol(minContainment)))
        .as("g"))
    val supAll = sets.select(col("doc_id").as("doc_super"),
      explode(col("grams")).as("g"))
    val (sub, sup) = maxDocFreq match {
      case Some(cap) =>
        require(cap >= 1, s"maxDocFreq out of range: $cap")
        val ok = supAll.groupBy("g")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select("g")
        (subAll.join(ok, Seq("g")), supAll.join(ok, Seq("g")))
      case None => (subAll, supAll)
    }
    val cands = sub.join(sup, Seq("g"))
      .filter(col("doc_sub") =!= col("doc_super"))
      .select("doc_sub", "doc_super").distinct()
    materializeAndRelease(cands
      .join(sets.select(col("doc_id").as("doc_sub"), col("grams").as("gs"),
        col("n_grams").as("n_sub")), "doc_sub")
      .join(sets.select(col("doc_id").as("doc_super"),
        col("grams").as("gp")), "doc_super")
      .withColumn("containment",
        round(size(array_intersect(col("gs"), col("gp"))) / col("n_sub"), 4))
      .filter(col("containment") >= minContainment)
      .select("doc_sub", "doc_super", "containment"), sets)
  }

  /** Winnowing-fingerprint pair search (the MOSS detection step over
    * [[graft.text.TextAnalysis.winnowFingerprints]]): candidate pairs
    * share at least `minShared` selected fingerprints, scored by
    * shared / min(|fp_a|, |fp_b|) in exact ppm. Winnowing's guarantee
    * makes this a RECALL statement — any pair sharing a token run of
    * ≥ w+k−1 shares a fingerprint — at ~2/(w+1) the volume of full
    * gram-set comparison (the Jaccard/containment ops), which is the
    * point at corpus scale: the pair join runs over the winnowed ~40%,
    * not every gram.
    *
    * Scale shape: fingerprint posting lists group on the 48-bit hash
    * (16-byte rows, never text); `maxDocFreq` drops boilerplate
    * fingerprints before the self-join (the LSH bucket-cap / df-cap
    * guard — pair volume is Σ df² over surviving lists); per-doc
    * fingerprint counts join back AQE-sized. All-integer scoring.
    */
  def winnowPairs(docs: DataFrame, k: Int = 3, w: Int = 4,
      minShared: Int = 2, maxDocFreq: Int = 64): DataFrame = {
    require(minShared >= 1 && maxDocFreq >= 1,
      s"bad winnowPairs params: minShared=$minShared maxDocFreq=$maxDocFreq")
    val ph = graft.text.TextAnalysis.winnowFingerprints(docs, k, w)
      .select("doc_id", "h").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cnt = ph.groupBy("doc_id").agg(count(lit(1)).as("nf"))
    val ok = ph.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq).select("h")
    val okPh = ph.join(ok, Seq("h"))
    val pairs = okPh.select(col("h"), col("doc_id").as("doc_a"))
      .join(okPh.select(col("h"), col("doc_id").as("doc_b")), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    materializeAndRelease(pairs
      .join(cnt.select(col("doc_id").as("doc_a"), col("nf").as("nf_a")),
        "doc_a")
      .join(cnt.select(col("doc_id").as("doc_b"), col("nf").as("nf_b")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        col("nf_a"), col("nf_b"),
        expr("CAST(n_shared * 1000000 div least(nf_a, nf_b) AS BIGINT)")
          .as("score_ppm")), ph)
  }

  /** Exact-Jaccard verification of candidate (doc_a, doc_b) pairs against
    * precomputed gram sets. Used by [[ngramJaccardPairs]] and by
    * pipelines that need LSH candidates re-verified exactly before
    * destructive dedup.
    */
  private def verifyPairsNgram(pairs: DataFrame, sets: DataFrame,
      minJaccard: Double): DataFrame =
    pairs
      .join(sets.select(col("doc_id").as("doc_a"), col("grams").as("ga"),
        col("n_grams").as("n_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("grams").as("gb"),
        col("n_grams").as("n_b")), "doc_b")
      .withColumn("n_inter", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("jaccard",
        round(col("n_inter") / (col("n_a") + col("n_b") - col("n_inter")), 4))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")

  /** Exact n-gram Jaccard for externally supplied candidate pairs
    * (e.g. MinHash-LSH output): joins each (doc_a, doc_b) with its gram
    * sets and keeps pairs whose TRUE Jaccard clears the threshold —
    * the estimate-only shortcut destroys non-duplicates at high variance
    * (32 hashes ⟹ σ≈0.07 at J=0.8).
    */
  def verifyCandidatesNgram(docs: DataFrame, pairs: DataFrame, n: Int = 3,
      minJaccard: Double = 0.8, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    verifyPairsNgram(pairs.select("doc_a", "doc_b"),
      gramSets(docs, n, textCol, idCol), minJaccard)

  // ------------------------------------- embedding cosine near-dup

  /** Cosine of two numeric arrays — the fused native expression
    * ([[graft.functions.CosineSimilarity]]): one pass, zero intermediate
    * arrays, bit-identical to the composed zip_with/aggregate fold it
    * replaced (and to DuckDB's list_cosine_similarity — the oracles
    * prove it).
    */
  def cosineCol(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosine_similarity(a, b)

  /** Brute-force cosine near-dup pairs above a threshold. O(n²/2) —
    * the verification baseline; the LSH route in [[graft.sim.Similarity]]
    * is the scale path.
    *
    * Guarded: refuses inputs above `maxRows` (bounded-count probe, no
    * full scan) so the cartesian plan cannot reach cluster scale by
    * accident — route large corpora through
    * [[graft.sim.Similarity.lshTopK]] candidates + exact re-rank, or
    * raise the limit deliberately.
    */
  def cosineNearDup(embeddings: DataFrame, minCosine: Double,
      maxRows: Long = 100000L): DataFrame = {
    require(graft.Guards.atMost(embeddings, maxRows),
      s"cosineNearDup is an O(n²) baseline: input exceeds $maxRows rows; " +
        "use LSH candidates + exact verify at scale, or raise maxRows")
    val a = embeddings.select(col("vec_id").as("vec_a"),
      transform(col("embedding"), _.cast("double")).as("ea"))
    val b = embeddings.select(col("vec_id").as("vec_b"),
      transform(col("embedding"), _.cast("double")).as("eb"))
    a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", round(cosineCol(col("ea"), col("eb")), 6))
      .filter(col("cosine") >= minCosine)
      .select("vec_a", "vec_b", "cosine")
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    * embedding space with a coarse quantizer, compare cosine only
    * WITHIN each cell, and drop every vector that has a smaller-id
    * neighbor within `minCosine` in its cell. The within-cell
    * restriction is the scale story: pair cost falls from n² to
    * Σ|cell|² with |cell| ≈ n/nlist, cells are the shuffle keys, and no
    * cross-partition pair exists by construction. Missed cross-cell
    * dups are the accepted recall trade (the paper's too) — raise
    * nlist to shrink cells, multi-assign for recall.
    *
    * The keep rule is a single pass (smaller id within threshold ⇒
    * drop), not iterative clustering, so the decision — and therefore
    * the DuckDB oracle — needs no fixpoint. The threshold compares RAW
    * cosines (sequential fold, bit-equal cross-engine); nothing is
    * rounded before the comparison, so there is no knife-edge.
    */
  def semDedup(quantizer: graft.sim.Similarity.IvfQuantizer,
      embeddings: DataFrame, minCosine: Double): DataFrame = {
    val assigned = quantizer.assign(embeddings)
    val a = assigned.select(col("cell"), col("vec_id").as("vec_a"),
      col("e").as("ea"))
    val b = assigned.select(col("cell").as("cell_b"),
      col("vec_id").as("vec_b"), col("e").as("eb"))
    val dropped = a.join(b,
        col("cell") === col("cell_b") && col("vec_a") < col("vec_b"))
      .filter(cosineCol(col("ea"), col("eb")) >= minCosine)
      .select(col("vec_b").as("vec_id")).distinct()
    assigned.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cell"))
  }

  /** Embedding-based benchmark decontamination: drop any corpus vector
    * whose cosine against ANY held-out eval vector reaches `minCosine`
    * — the semantic complement of the n-gram [[decontaminate]] (which
    * catches verbatim overlap; this catches paraphrases).
    *
    * Scale shape = [[semDedup]]'s: BOTH sides are assigned to the same
    * coarse-quantizer cells and comparisons happen within a cell only,
    * so the join volume is Σ|corpus-cell|·|eval-cell|, never
    * |corpus|·|eval|. Cross-cell contamination is out of reach by
    * construction — the accepted recall trade of every IVF-bounded
    * method; raise nlist/nprobe offline if the eval set demands more.
    */
  def embedDecontaminate(quantizer: graft.sim.Similarity.IvfQuantizer,
      corpus: DataFrame, eval: DataFrame, minCosine: Double): DataFrame = {
    val ca = quantizer.assign(corpus)
    val ea = quantizer.assign(eval)
      .select(col("cell").as("cell_e"), col("e").as("ee"))
    val contaminated = ca.join(ea, col("cell") === col("cell_e"))
      .filter(cosineCol(col("e"), col("ee")) >= minCosine)
      .select("vec_id").distinct()
    ca.join(contaminated, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cell"))
  }

  // ------------------------------------- duplicate-cluster resolution

  /** Connected components over candidate duplicate pairs — the dedup
    * endgame: pairwise matches (from MinHash/SimHash/n-gram/cosine)
    * become clusters, and one canonical document survives per cluster.
    * Transitivity matters: A~B and B~C must collapse to ONE keeper even
    * when A~C was never emitted as a pair.
    *
    * Algorithm: min-label propagation with pointer jumping. Each vertex
    * starts labeled with itself; every round it takes the min label over
    * itself and its neighbors, then shortcuts through its label's label
    * (path halving). The jump step makes convergence O(log diameter)
    * rounds instead of O(diameter) — duplicate chains of length 2^r
    * collapse in ~r rounds, so a pathological 1M-doc chain needs ~20
    * rounds, not 1M. Each round is two shuffles on (Long, Long) rows;
    * labels persist round-over-round and the loop exits on the first
    * fixpoint (an `isEmpty` probe on the changed set — a driver-side
    * LOOP, not driver-side DATA).
    *
    * @param vertices one column of vertex ids (docs with no pair are
    *                 singleton clusters of themselves)
    * @param pairs    candidate pairs (aCol, bCol); direction irrelevant
    * @return (id, cluster_id) — cluster_id = min vertex id reachable
    */
  def connectedComponents(vertices: DataFrame, pairs: DataFrame,
      aCol: String = "doc_a", bCol: String = "doc_b",
      idCol: String = "doc_id", maxIter: Int = 50): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val fwd = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    val edges = fwd.union(fwd.select(col("dst").as("src"),
        col("src").as("dst")))
      .persist(MEMORY_AND_DISK)
    // localCheckpoint (not persist): each round's plan references the
    // previous round TWICE (the pointer-jump self-join), so an
    // unbroken lineage grows 2^rounds — checkpointing materializes the
    // round and truncates the plan to a leaf, keeping every iteration's
    // optimizer/AQE work O(1) in the round number.
    var labels = vertices.select(col(idCol).as("v"))
      .distinct()
      .withColumn("lbl", col("v"))
      .localCheckpoint()
    // Convergence via the exact label-sum invariant (r15 opt, guide
    // §2.4): every step is per-vertex NON-INCREASING — neighborMin is
    // least(lbl, min neighbor lbl) and the pointer jump replaces lbl=u
    // with label(u) ≤ u — and both steps preserve the vertex set, so
    // jumped == labels ⟺ sum(lbl) unchanged. The old check was
    // `jumped.except(labels).isEmpty`: a full (v,lbl)-keyed DISTINCT
    // exchange of both node tables per round, replacing it with one
    // map-combined single-row aggregate over the already-checkpointed
    // round result. DECIMAL(38,0) keeps the sum exact at any node
    // count (a double sum could miss a small label drop at scale).
    def lblSum(df: DataFrame): java.math.BigDecimal = {
      val r = df.agg(sum(col("lbl").cast("decimal(38,0)"))).collect()(0)
      if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
    }
    var curSum = lblSum(labels)
    var converged = false
    var it = 0
    // (r15 opt continuation — measured NEGATIVE result, kept on record
    // so nobody retries it: replacing neighborMin's eager checkpoint
    // with a lazy persist that the jump's checkpoint materializes "in
    // one job" LOST in alternating fresh-JVM A/B — sim_dbscan 1.11×,
    // dd_keeper_quality 1.14×, dd_cluster_components 1.25×, consistent
    // across reps; raw target/attrib/r15opt2_ab_sf01.jsonl. Mechanism:
    // cache population is not synchronized, so the self-join's two
    // concurrent scans RACE and recompute the whole neighbor-min
    // subplan instead of deduping it — the eager checkpoint's extra
    // job is cheaper than the duplicated compute plus cache-write
    // overhead. The two-checkpoint round below is the measured-best
    // shape.)
    while (!converged && it < maxIter) {
      // neighbor min: label(v) <- min(label(v), min_{(u,v) in E} label(u))
      val nbrMin = edges.join(labels, edges("src") === labels("v"))
        .select(col("dst").as("nv"), col("lbl").as("nlbl"))
        .groupBy("nv").agg(min("nlbl").as("nlbl"))
      val neighborMin = labels
        .join(nbrMin, labels("v") === nbrMin("nv"), "left")
        .select(labels("v").as("v"),
          least(labels("lbl"), coalesce(col("nlbl"), labels("lbl")))
            .as("lbl"))
        .localCheckpoint()
      // pointer jump: label(v) <- label(label(v)) — labels are vertex
      // ids, so the lookup is a self-join; left join + coalesce keeps
      // vertices whose label row is themselves
      val jumped = neighborMin.as("x")
        .join(neighborMin.as("y"), col("x.lbl") === col("y.v"), "left")
        .select(col("x.v").as("v"),
          coalesce(col("y.lbl"), col("x.lbl")).as("lbl"))
        .localCheckpoint()
      val newSum = lblSum(jumped)
      converged = newSum.compareTo(curSum) == 0
      curSum = newSum
      labels = jumped
      it += 1
    }
    edges.unpersist()
    labels.select(col("v").as(idCol), col("lbl").as("cluster_id"))
  }


  /** Resolve documents into duplicate clusters and mark the canonical
    * keeper (smallest doc_id) per cluster: the destructive-dedup
    * decision table. Composes [[connectedComponents]] over any pair
    * source — verified n-gram pairs, MinHash candidates, SimHash bands.
    */
  def clusterDedup(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    connectedComponents(docs.select(idCol), pairs, idCol = idCol)
      .withColumn("is_keep",
        (col("cluster_id") === col(idCol)).cast("int"))

  /** Intra-document repeated-window cleanup — the within-doc
    * counterpart of the cross-doc [[graft.dedup.SpanDedup]] pass (C4
    * applies both): a k-gram occurrence is a DUP if the identical gram
    * already started at an earlier position in the SAME document, and
    * every token covered by a dup gram is dropped (first occurrences
    * always survive, so no doc empties). Output keeps the original
    * token count, the dropped count, and the reassembled clean text.
    *
    * Deliberately the LINEAR relational formulation, not a per-row
    * array scan: an `array_position`-style higher-order rewrite is
    * O(len²) per document, which a 100k-token doc turns into 10¹⁰
    * comparisons on one task. Here every stage is an explode plus a
    * window/join keyed by (doc_id, gram) or doc_id — per-key state
    * bounded by the doc's own length, text reassembled once per doc
    * via the usual sorted collect.
    */
  def intraDocClean(docs: DataFrame, k: Int = 4): DataFrame = {
    require(k >= 2, s"gram width must be >= 2: $k")
    val toks = graft.text.TextAnalysis.tokens(col("text"))
    val base = docs.select(col("doc_id"), toks.as("w"))
    // 1-based token positions to match the 1-based slice() gram starts
    val tok = base
      .select(col("doc_id"), posexplode(col("w")).as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("tok"))
    val grams = base.filter(size(col("w")) >= k)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("w")) - (k - 1)),
          i => concat_ws(" ", slice(col("w"), i, lit(k)))))
          .as(Seq("p0", "g")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("g"))
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id", "g")
    val dups = grams.withColumn("fp", min(col("p")).over(wg))
      .filter(col("p") > col("fp"))
    val covered = dups
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + (k - 1))).as("pos"))
      .distinct()
    val kept = tok.join(covered, Seq("doc_id", "pos"), "left_anti")
    val reassembled = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("text_clean"))
    base.select(col("doc_id"), size(col("w")).as("n_tokens"))
      .join(reassembled, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - col("n_kept")).cast("long").as("n_dropped"),
        col("text_clean"))
  }

  /** Quality-aware keeper policy: instead of the min-id rule, keep the
    * HIGHEST-scoring member of each duplicate cluster (ties to the
    * lower id) — the production choice when near-dups differ in
    * quality and the canonical copy should be the best one, not the
    * first-crawled one. One cluster-keyed rank window (state bounded
    * by cluster size, which the pair-generation stage already bounds)
    * over a component×score join — no new corpus-wide machinery.
    */
  def keeperByQuality(components: DataFrame, scores: DataFrame,
      idCol: String = "doc_id",
      scoreCol: String = "quality_score"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col(scoreCol).desc, col(idCol))
    components.select(col(idCol), col("cluster_id"))
      .join(scores.select(col(idCol), col(scoreCol)), Seq(idCol))
      .withColumn("is_keep", (row_number().over(w) === 1).cast("int"))
  }

  /** Benchmark decontamination: flag corpus documents sharing any
    * word n-gram with a held-out benchmark/eval set — the standard
    * train-set hygiene pass before pretraining. Grams shuffle as md5
    * digests (32 bytes), never as text; the benchmark gram set is the
    * small side of the join (broadcast/AQE), so cost is one exploded
    * pass over the corpus. Deterministic — a pure function of the
    * texts — and fully replayable in SQL (the `dd_decontaminate`
    * oracle). Docs shorter than `n` words produce no grams and are
    * clean by definition.
    *
    * @param isBenchmark predicate column marking the held-out set
    * @param n gram width in words (8 is the common contamination bar)
    */
  def decontaminate(docs: DataFrame, isBenchmark: Column,
      n: Int = 8): DataFrame = {
    val ws = graft.text.TextAnalysis.tokens(col("text"))
    val grams = docs.select(col("doc_id"), isBenchmark.as("is_bench"),
        ws.as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), col("is_bench"),
        explode(transform(sequence(lit(1), size(col("w")) - (n - 1)),
          i => concat_ws(" ", slice(col("w"), i, lit(n))))).as("g"))
      .select(col("doc_id"), col("is_bench"), md5(col("g")).as("h"))
    val benchGrams = grams.filter(col("is_bench")).select("h").distinct()
    val hits = grams.filter(!col("is_bench"))
      .join(benchGrams, Seq("h"))
      .groupBy("doc_id").agg(countDistinct(col("h")).as("n_shared"))
    docs.select(col("doc_id"), isBenchmark.as("is_bench"))
      .filter(!col("is_bench"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).cast("int")
          .as("contaminated"))
  }

  /** Bloom-filter decontamination: screen the corpus against a
    * held-out eval set via an m-bit Bloom filter instead of a full
    * text join — at 100 TB you broadcast the (m/8)-byte bitmap to
    * every executor and never shuffle the corpus at all. Expressed
    * relationally: the filter is the DISTINCT set of j md5-derived
    * bit positions over the eval texts (<= m rows, broadcast); a
    * corpus doc is flagged when ALL j of its bits are present.
    * One-sided by construction — every true member is flagged; the
    * `exact` column (md5 membership) accounts the false-positive
    * overhang, which a second exact pass on the tiny flagged slice
    * would clear.
    */
  def bloomDecontaminate(docs: DataFrame, isEval: Column,
      bitsPerKey: Int = 5, j: Int = 3, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(j >= 1 && bitsPerKey >= 1,
      s"need j >= 1, bitsPerKey >= 1; got j=$j bitsPerKey=$bitsPerKey")
    // m scales with the eval-set size (floor 64) so the FP rate is a
    // constant of bitsPerKey, not of corpus scale — a fixed m
    // saturates once n_eval * j approaches it and flags everything.
    // The count is a one-row broadcast, not a driver action.
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol), isEval.as("is_eval"))
    val mRow = base.filter(col("is_eval"))
      .agg(greatest(lit(64L), lit(bitsPerKey.toLong) * count(lit(1)))
        .as("m"))
    def bit(i: Int): Column =
      conv(substring(md5(concat_ws(":", lit(i), col(textCol))), 1, 8),
        16, 10).cast("long") % col("m")
    val bitsArr = array((0 until j).map(bit): _*)
    val tagged = base.crossJoin(broadcast(mRow))
      .select(col("doc_id"), col(textCol), col("is_eval"),
        bitsArr.as("bits"))
    val bloom = tagged.filter(col("is_eval"))
      .select(explode(col("bits")).as("bit")).distinct()
    val evalHashes = tagged.filter(col("is_eval"))
      .select(md5(col(textCol)).as("th")).distinct()
      .withColumn("ex", lit(1))
    val hits = tagged.filter(!col("is_eval"))
      .select(col("doc_id"), md5(col(textCol)).as("th"),
        explode(col("bits")).as("bit"))
      .join(broadcast(bloom), Seq("bit"))
      .groupBy(col("doc_id"), col("th"))
      .agg(count(lit(1)).as("n_bits_hit"))
      .filter(col("n_bits_hit") === j)
    hits.join(broadcast(evalHashes), Seq("th"), "left")
      .select(col("doc_id"), col("n_bits_hit"),
        coalesce(col("ex"), lit(0)).as("exact"))
  }

  /** The broadcastable Bloom state as ONE row — (m, bit-position
    * array, eval md5 array) — the shape a stream-static probe needs:
    * a stateless crossJoin(broadcast(...)) instead of a stateful
    * stream join. Same scaled-m derivation as [[bloomDecontaminate]].
    */
  def bloomBroadcastRow(evalDocs: DataFrame, bitsPerKey: Int = 5,
      j: Int = 3, textCol: String = "text"): DataFrame = {
    val mRow = evalDocs
      .agg(greatest(lit(64L), lit(bitsPerKey.toLong) * count(lit(1)))
        .as("m"))
    def bit(i: Int): Column =
      conv(substring(md5(concat_ws(":", lit(i), col(textCol))), 1, 8),
        16, 10).cast("long") % col("m")
    evalDocs.crossJoin(broadcast(mRow))
      .select(col("m"),
        explode(array((0 until j).map(bit): _*)).as("bit"),
        md5(col(textCol)).as("th"))
      .groupBy("m")
      .agg(array_sort(collect_set(col("bit"))).as("bloom_bits"),
        array_sort(collect_set(col("th"))).as("eval_md5s"))
  }

  /** Map-local Bloom probe against a [[bloomBroadcastRow]] — works on
    * a batch frame or a streaming one (stateless: no aggregation, no
    * watermark; append-mode safe). Emits flagged docs only, with the
    * exact-membership audit column.
    */
  def bloomProbe(docs: DataFrame, bloomRow: DataFrame, j: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    def bit(i: Int): Column =
      conv(substring(md5(concat_ws(":", lit(i), col(textCol))), 1, 8),
        16, 10).cast("long") % col("m")
    docs.crossJoin(broadcast(bloomRow))
      .filter((0 until j).map(i =>
        array_contains(col("bloom_bits"), bit(i))).reduce(_ && _))
      .select(col(idCol).cast("long").as("doc_id"),
        array_contains(col("eval_md5s"), md5(col(textCol)))
          .cast("int").as("exact"))
  }

  /** Cross-source contamination matrix: for every source pair, the
    * count of distinct token-n-grams present in BOTH — the corpus-QA
    * readout that catches one ingest feed republishing another (or an
    * eval source leaking into a train source) BEFORE doc-level dedup
    * is asked to clean it up pair by pair. Reported per pair:
    * `n_shared` (distinct grams in both), each side's distinct-gram
    * vocabulary (`n_a`/`n_b`), and the overlap coefficient
    * `n_shared / min(n_a, n_b)` in exact integer ppm (the containment
    * normalization — robust when one source dwarfs the other).
    *
    * Scale shape: grams shuffle as 8-byte xxhash64 keys, never text
    * (the gramSets contract); the ONLY corpus-sized stage is the
    * (gram, source) DISTINCT. After it, every gram appears at most
    * |sources| times, so the self-join's per-key fan-out is bounded by
    * |sources|² BY CONSTRUCTION — no df cap needed, unlike doc-keyed
    * posting joins where one boilerplate gram explodes quadratically
    * in the number of DOCS. Both aggregates are map-combined; the
    * result is sources²-sized. The deduped gram set feeds three plan
    * arms (two join sides + the per-source vocabulary count), so it is
    * eagerly checkpointed once.
    */
  def sourceOverlap(docs: DataFrame, n: Int = 3,
      textCol: String = "text", srcCol: String = "source"): DataFrame = {
    val grams = docs
      .select(col(srcCol).as("source"), split(col(textCol), " ").as("toks"))
      .select(col("source"), explode(expr(
        s"transform(sequence(1, greatest(size(toks) - ${n - 1}, 1)), " +
          s"i -> xxhash64(array_join(slice(toks, i, $n), ' ')))")).as("g"))
      .distinct()
      .localCheckpoint(true)
    val perSrc = grams.groupBy("source")
      .agg(count(lit(1)).as("n_grams"))
    val shared = grams.as("a")
      .join(grams.as("b"),
        col("a.g") === col("b.g") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(perSrc.select(col("source").as("source_a"),
        col("n_grams").as("n_a")), "source_a")
      .join(perSrc.select(col("source").as("source_b"),
        col("n_grams").as("n_b")), "source_b")
      .select(col("source_a"), col("source_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        expr("n_shared * 1000000L div least(n_a, n_b)").as("overlap_ppm"))
  }
}
