package graft.sim

import graft.dedup.Dedup.cosineCol
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §7.5): brute-force cosine top-k as the correctness baseline,
  * and a random-hyperplane LSH-bucketed variant as the scale path (probe
  * only vectors sharing a signature prefix bucket instead of all n).
  */
object Similarity {

  /** Brute-force cosine top-k: every query vector against the full
    * corpus. The corpus side is broadcast when small; at scale the
    * queries×corpus product is the bottleneck — use [[lshTopK]].
    *
    * Guarded: refuses corpora above `maxCorpusRows` (column-pruned
    * bounded-count probe, memoized per plan — [[graft.Guards]]) so the
    * broadcast-product plan stays a small-corpus fallback —
    * [[lshTopK]] / [[ivfTopK]] are the scale paths.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      maxCorpusRows: Long = 100000L): DataFrame = {
    require(graft.Guards.atMost(corpus, maxCorpusRows),
      s"bruteForceTopK broadcasts the corpus and scores |q|x|c| pairs: " +
        s"corpus exceeds $maxCorpusRows rows; use lshTopK/ivfTopK at scale")
    val q = queries.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("eq"))
    val c = corpus.select(col("vec_id").as("cand_id"),
      transform(col("embedding"), _.cast("double")).as("ec"))
    val scored = q.join(broadcast(c), col("query_id") =!= col("cand_id"))
      .withColumn("cosine", cosineCol(col("eq"), col("ec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("cand_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Matryoshka-style truncation audit (Kusupati et al. 2022): how
    * much of the exact full-dimension top-k survives when retrieval
    * runs on only the FIRST `prefixDims` coordinates — the overlap
    * histogram (n_hits 0..k → n_queries) between brute-force top-k on
    * the full vectors and on the prefix slice, over the guarded query
    * subset. The go/no-go measurement before shipping truncated
    * embeddings as the cheap first-stage retriever (4× less compute
    * and shuffle per query at prefix 16 of 64). Both sides reuse
    * [[bruteForceTopK]] (exact, corpus-size guarded — at scale swap
    * the prefix side for ivfTopK over sliced vectors; the audit shape
    * is unchanged); all outputs are integers, so the oracle's full
    * replay must land on the identical histogram.
    */
  def truncationRecall(emb: DataFrame, prefixDims: Int, k: Int,
      nQueries: Long): DataFrame = {
    require(prefixDims >= 1, s"prefixDims out of range: $prefixDims")
    val full = bruteForceTopK(emb.filter(col("vec_id") < nQueries), emb, k)
      .select("query_id", "cand_id")
    val tr = emb.select(col("vec_id"),
      slice(col("embedding"), 1, prefixDims).as("embedding"))
    val hits = bruteForceTopK(tr.filter(col("vec_id") < nQueries), tr, k)
      .select(col("query_id"), col("cand_id"), lit(1).as("hit"))
    full.join(hits, Seq("query_id", "cand_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("hit"), lit(0))).cast("int").as("n_hits"))
      .groupBy("n_hits").agg(count(lit(1)).as("n_queries"))
  }

  /** Deterministic pseudo-random hyperplane component for (seed, plane,
    * dim) — splitmix64 mapped to ±1.
    */
  private def planeSign(seed: Long, plane: Int, dim: Int): Double = {
    var x = seed + plane.toLong * 1315423911L + dim.toLong * 2654435761L +
      0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x = x ^ (x >>> 31)
    if ((x & 1L) == 0L) 1.0 else -1.0
  }

  /** The deterministic ±1 sign grid for a table's hyperplanes —
    * sign(plane)(dim) exactly as [[hyperplaneSig]] derives it. Public so
    * the DuckDB oracle embeds the identical constants.
    */
  def planeSignTable(planes: Int, dims: Int, seed: Long): Seq[Seq[Int]] =
    Seq.tabulate(planes, dims)((p, d) => planeSign(seed, p, d).toInt)

  /** Random-hyperplane signature: `planes` sign bits packed in a Long. */
  private[sim] def hyperplaneSig(vec: Seq[Double], planes: Int, seed: Long): Long = {
    var sig = 0L
    var p = 0
    while (p < planes) {
      var acc = 0.0
      var d = 0
      while (d < vec.length) {
        acc += vec(d) * planeSign(seed, p, d)
        d += 1
      }
      if (acc >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Fitted IVF coarse quantizer: just the `nlist` centroid vectors —
    * small enough to broadcast in a closure, serializable, reusable
    * across any number of query sets without re-running k-means.
    */
  final case class IvfQuantizer(centers: Array[Array[Double]]) {

    /** Cell id + squared distance ranking for one vector.
      *
      * Hot path: this runs once per corpus vector per assignment pass,
      * O(nlist·dims) each — at nlist ≈ √n it IS the assignment cost
      * (measured r11: the old tuple-allocating sortBy form spent
      * ~11.6 µs per center distance, 33 s for a 20k × 142-center pass,
      * and dominated sim_dbscan_scaled's runtime). Primitive-array
      * top-k insertion instead: copy the boxed row once, then
      * allocation-free strict-< insertion, which reproduces the old
      * stable sortBy's (distance, center-id) order exactly — on a tie
      * the earlier center wins, so probe sets are bit-identical to the
      * previous implementation and the DuckDB replays
      * (`ORDER BY d2, cell`) are unaffected.
      */
    private[graft] def nearestCells(e: Seq[Double], nprobe: Int): Seq[Int] = {
      val ea = new Array[Double](e.length)
      var x = 0
      while (x < ea.length) { ea(x) = e(x); x += 1 }
      val k = math.min(nprobe, centers.length)
      val bestD = Array.fill(k)(Double.PositiveInfinity)
      val bestI = new Array[Int](k)
      var i = 0
      while (i < centers.length) {
        val c = centers(i)
        var d = 0.0
        var j = 0
        while (j < ea.length) { val t = ea(j) - c(j); d += t * t; j += 1 }
        if (d < bestD(k - 1)) {
          var p = k - 1
          while (p > 0 && d < bestD(p - 1)) {
            bestD(p) = bestD(p - 1); bestI(p) = bestI(p - 1); p -= 1
          }
          bestD(p) = d; bestI(p) = i
        }
        i += 1
      }
      bestI.toSeq
    }

    /** Assign each vector to its single nearest cell (inverted-list
      * build: at scale this is the table's partition/bucket layout).
      */
    def assign(embeddings: DataFrame): DataFrame = {
      val cellUdf = udf { (e: Seq[Double]) => nearestCells(e, 1).head }
      embeddings.select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("e"))
        .withColumn("cell", cellUdf(col("e")))
    }

  }

  /** Deterministic coarse quantizer: centers are the `nlist` corpus
    * vectors with the smallest `md5(vec_id)` — the hash-sampled subset a
    * k-means|| init would draw, but reproducible bit-for-bit on any
    * engine (cell id = md5 rank). Same inverted-list layout and probe
    * path as the k-means quantizer; recall is slightly lower because
    * centers are sample points rather than means, in exchange for a
    * fully replayable assignment (the sim_ivf_topk DuckDB oracle
    * re-derives the centers with the same hash ranking).
    */
  def hashSampledQuantizer(embeddings: DataFrame, nlist: Int = 16): IvfQuantizer = {
    val centers = embeddings
      .select(md5(col("vec_id").cast("string").cast("binary")).as("h"),
        transform(col("embedding"), _.cast("double")).as("e"))
      .orderBy(col("h")).limit(nlist)
      .select(col("e")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(centers.nonEmpty, "empty corpus — cannot derive a quantizer")
    IvfQuantizer(centers)
  }

  /** Fit the IVF coarse quantizer ONCE (MLlib k-means, seeded, random
    * init + few iterations) — production shape: fit offline on a
    * sample, then reuse the centroids for every batch of queries and
    * for the inverted-list table layout. [[ivfTopK]] overloads take the
    * fitted quantizer so repeated query sets never refit.
    */
  def fitQuantizer(embeddings: DataFrame, nlist: Int = 16,
      seed: Long = 42L): IvfQuantizer = {
    val base = embeddings.select(
        transform(col("embedding"), _.cast("double")).as("e"))
      .withColumn("features", array_to_vector(col("e")))
    val fitted = new KMeans().setK(nlist).setSeed(seed)
      .setInitMode("random").setMaxIter(8)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(base)
    IvfQuantizer(fitted.clusterCenters.map(_.toArray))
  }

  /** IVF-style approximate top-k: the coarse quantizer assigns every
    * vector to one of `nlist` cells; each query probes its `nprobe`
    * nearest cells and exact cosine re-ranks only those candidates. At
    * scale the inverted lists are the partition layout — a query
    * touches nprobe/nlist of the corpus instead of all of it.
    *
    * Self-contained form: fits the quantizer inline on the input.
    * Reuse across query sets goes through [[fitQuantizer]] +
    * the quantizer overload.
    */
  def ivfTopK(embeddings: DataFrame, k: Int, nlist: Int = 16,
      nprobe: Int = 4, seed: Long = 42L): DataFrame =
    ivfTopK(fitQuantizer(embeddings, nlist, seed), embeddings, k, nprobe)

  /** A BUILT IVF index: the fitted coarse quantizer plus the corpus's
    * cell assignment, materialized ONCE (eager localCheckpoint —
    * lineage truncated, blocks freed by the ContextCleaner when the
    * index is GC'd, never a session-lifetime persist) and shared by
    * every consumer: retrieval ([[ivfTopK]]), hard-negative mining
    * ([[pairMargin]]), and any other within-cell pass. One assignment
    * pass over the embeddings instead of one per consumer — the
    * production posture, where the inverted-list table IS the stored
    * index layout. Carries `label` when the input has one (margin
    * mining needs it; retrieval ignores it).
    */
  final case class IvfIndex(quantizer: IvfQuantizer, assigned: DataFrame) {
    /** cell → shard count for cells above [[DefaultCellCap]], computed
      * at most once per index (one narrow map-combined aggregate over
      * the checkpointed assignment, ≤nlist result rows) and shared by
      * every ivfTopK call against this index.
      */
    lazy val oversizedDefault: Map[Int, Int] =
      oversizedCells(assigned, DefaultCellCap)
  }

  /** Per-cell occupancy cap for the cell-keyed joins (r14 verdict #3 —
    * the IVF analog of minhashCandidates' maxBucket/star mode). The
    * refit sampling rule keeps cells ≈ n/nlist while the quantizer is
    * CURRENT, but between refits a hot mode lands on one stale center
    * and the cell-keyed join sends the whole |cell|² product to ONE
    * reducer — measured first-hand at 20k vectors: 73M rows ≈ 73 GB
    * through a single task, 44 GB spill, killed at 45 min
    * (AdversarialAnn scaladoc). On a cluster that is a dead executor.
    *
    * The structural bound: cells whose join-input occupancy exceeds
    * `cellCap` are GRID-SHARDED — each side of the join is split into
    * nsh = ⌈occ/cap⌉ deterministic hash shards, the left side
    * replicated across the right's shard axis and vice versa, and the
    * join key widens from (cell) to (cell, sa, sb). Every pair meets
    * in exactly one (sa, sb) bucket, so the RESULT IS BIT-IDENTICAL to
    * the unsharded join (no recall change, no oracle change) while
    * per-task input drops from |cell| to ≈cap rows per side and the
    * |cell|² product spreads over nsh² tasks. Replication cost is
    * |cell|·nsh extra shuffled rows per side — zero for cells at or
    * under the cap, which on a refit quantizer is all of them (the
    * common path keeps the EXACT legacy single-key plan: the shard
    * machinery engages only when an oversized cell exists).
    *
    * Honest limit: total within-cell work stays Σ|cell|² — the cap
    * de-serializes the stage (no dead executor, AQE-sized tasks); it
    * does not make a stale layout cheap. The refit rule remains the
    * first-line defense; the cap is the between-refits safety net.
    *
    * Default sizing (measured, r15): 4096 bounds per-task pairs at
    * ≈16.8M — seconds of cosine work at embedding dims — while NOT
    * binding on the suite's deliberate pinned-16 quantizer baselines
    * at sf1 (mean cell ≈2.5k rows): a first cut at 2048 engaged the
    * shard path on sim_dbscan_p2/sim_mmr_ivf@sf1 and cost them
    * 1.47–1.54× (isolated A/B) for protection those benign rows do
    * not need. A genuinely hot cell (the 8.7k-row stale-arm clump,
    * any production mode collapse) still shards.
    */
  val DefaultCellCap: Int = 4096

  /** cell → ⌈occupancy/cap⌉ for cells whose join-input rows exceed
    * `cap`. Driver-side map is bounded by the number of OVERSIZED
    * cells (≤ nlist, in practice a handful) — never data-sized.
    */
  private[graft] def oversizedCells(assigned: DataFrame, cap: Int): Map[Int, Int] = {
    require(cap >= 1, s"cellCap out of range: $cap")
    assigned.groupBy("cell").agg(count(lit(1)).as("k"))
      .filter(col("k") > cap)
      .select(col("cell").cast("int"), col("k"))
      .collect()
      .map(r => r.getInt(0) -> math.ceil(r.getLong(1).toDouble / cap).toInt)
      .toMap
  }

  /** Build the shared index: one assignment pass, eagerly
    * materialized. `nlist` guidance: ≈ √n — Σ|cell|² pair volume for
    * the within-cell consumers stays ≈ n^1.5 (SCALE.md, pair-margin
    * row).
    */
  def buildIndex(quantizer: IvfQuantizer, embeddings: DataFrame): IvfIndex = {
    val base = quantizer.assign(embeddings)
    val full =
      if (embeddings.columns.contains("label"))
        base.join(embeddings.select(col("vec_id"), col("label")), "vec_id")
      else base
    IvfIndex(quantizer, full.localCheckpoint(true))
  }

  /** IVF top-k against a PRE-FITTED quantizer (no k-means job): builds
    * the shared index inline — the assignment feeds BOTH the query arm
    * and the candidate arm, so materializing it once halves the assign
    * work even standalone — then probes and re-ranks.
    */
  def ivfTopK(quantizer: IvfQuantizer, embeddings: DataFrame, k: Int,
      nprobe: Int): DataFrame =
    ivfTopK(buildIndex(quantizer, embeddings), k, nprobe, DefaultCellCap)

  /** Quantizer form with an explicit cell cap (overloads cannot share
    * default arguments in Scala — the default lives on the
    * self-contained form only).
    */
  def ivfTopK(quantizer: IvfQuantizer, embeddings: DataFrame, k: Int,
      nprobe: Int, cellCap: Int): DataFrame =
    ivfTopK(buildIndex(quantizer, embeddings), k, nprobe, cellCap)

  /** IVF top-k from a BUILT index: probes each query's `nprobe`
    * nearest cells, exact cosine re-ranks; the corpus-side inverted
    * lists come from the index's materialized assignment. Cells above
    * `cellCap` are grid-sharded (see [[DefaultCellCap]]) — identical
    * results, bounded per-task join input.
    */
  def ivfTopK(index: IvfIndex, k: Int, nprobe: Int): DataFrame =
    ivfTopK(index, k, nprobe, DefaultCellCap)

  def ivfTopK(index: IvfIndex, k: Int, nprobe: Int,
      cellCap: Int): DataFrame = {
    val quantizer = index.quantizer
    val assigned = index.assigned.select("vec_id", "e", "cell")
    val probeUdf = udf { (e: Seq[Double]) =>
      quantizer.nearestCells(e, nprobe)
    }
    val queries = assigned
      .select(col("vec_id").as("query_id"), col("e").as("eq"),
        explode(probeUdf(col("e"))).as("cell"))
    val corpus = assigned.select(col("vec_id").as("cand_id"),
      col("e").as("ec"), col("cell"))
    val over =
      if (cellCap == DefaultCellCap) index.oversizedDefault
      else oversizedCells(assigned, cellCap)
    val joined =
      if (over.isEmpty)
        // the common (refit-quantizer) path: every cell is at or under
        // the cap — keep the exact legacy single-key plan
        queries.join(corpus, Seq("cell"))
      else {
        val nshUdf = udf { (cell: Int) => over.getOrElse(cell, 1) }
        val q2 = queries
          .withColumn("nsh", nshUdf(col("cell")))
          .withColumn("sa",
            pmod(xxhash64(col("query_id")), col("nsh")).cast("int"))
          .withColumn("sb", explode(sequence(lit(0), col("nsh") - 1)))
          .drop("nsh")
        val c2 = corpus
          .withColumn("nsh", nshUdf(col("cell")))
          .withColumn("sb",
            pmod(xxhash64(col("cand_id")), col("nsh")).cast("int"))
          .withColumn("sa", explode(sequence(lit(0), col("nsh") - 1)))
          .drop("nsh")
        q2.join(c2, Seq("cell", "sa", "sb")).drop("sa", "sb")
      }
    // (query, cand) pairs are UNIQUE by construction — the corpus side
    // is single-assign (one cell per cand) and nearestCells returns
    // distinct probe cells, so a pair meets in at most one cell (and in
    // the sharded path in exactly one (sa, sb) bucket). The legacy
    // dropDuplicates("query_id","cand_id") here was therefore a no-op
    // dedup whose exchange carried BOTH dims-long double arrays per
    // pair row — the fattest shuffle of the whole retrieval plan (r15
    // opt, guide §2.3: shuffle keys and scores, not payloads; the
    // dbscan eps-join has skipped the same no-op since r14). Cosine is
    // computed map-side straight off the join, so the only pair-sized
    // exchange left is the window's, over (query_id, cand_id, cosine).
    val cands = joined
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine", cosineCol(col("eq"), col("ec")))
      .select("query_id", "cand_id", "cosine")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("cand_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Density-based clustering (DBSCAN, Ester et al. 1996) over the
    * cell-bucketed eps-graph — the clustering family member k-means
    * can't cover (k-means wants convex, count-known clusters; DBSCAN
    * finds arbitrary-shape dense regions and labels sparse points
    * NOISE — the "junk cloud vs. coherent topic islands" readout of an
    * embedding-space audit). Eps-neighborhood = cosine ≥ `minCosine`
    * within the vector's coarse-quantizer cell (the SemDeDup bounded-
    * recall trade: cross-cell neighbors are out of reach by
    * construction; pair cost is Σ|cell|², never n²). The trade is
    * MEASURED, not asserted: `sim_dbscan_recall` publishes the
    * single-assign edge recall and `sim_dbscan_recall_curve` the
    * multi-probe remedy (testdata: ~20% at p=1 → ~48% at p=2 → ~90%
    * at p=4 probes for the loose τ=0.3 band, pair volume growing ~p²)
    * — pick the probe budget from the curve like nprobe from
    * sim_ivf_probe_curve. core = ≥ `minPts` neighbors; clusters =
    * connected components of the core-core subgraph (min-reachable-id
    * labels via [[graft.dedup.Dedup.connectedComponents]] — pointer-
    * jumped, capped, convergence-checked); border = non-core with a
    * core neighbor, attached to its minimum core cluster id; the rest
    * is noise (cluster −1). Raw-cosine threshold compare (no rounding
    * before the gate) keeps the DuckDB replay knife-edge-free.
    *
    * `minPts` CONVENTION (deliberate, r10 advisory): it counts
    * eps-NEIGHBORS EXCLUDING the point itself (the degree filter runs
    * over `s =!= t` edges), whereas Ester et al. define core via
    * |N_eps(p)| ≥ minPts WITH p included — so `minPts = k` here equals
    * the paper's `minPts = k + 1`. The DuckDB oracle replays the same
    * exclusive-degree rule, and every registered entry passes the same
    * value to both sides, so results are consistent; callers porting a
    * paper-tuned minPts should subtract one.
    */
  def dbscan(quantizer: IvfQuantizer, embeddings: DataFrame,
      minCosine: Double, minPts: Int, probes: Int = 1,
      cellCap: Int = DefaultCellCap): DataFrame = {
    require(minPts >= 1, s"minPts out of range: $minPts")
    require(probes >= 1 && probes <= quantizer.centers.length,
      s"probes out of range: $probes")
    // multi-probe assignment (r10): each vector joins its `probes`
    // nearest cells — the measured recall knob from
    // sim_dbscan_recall_curve (20%→48%→90% edge recall at 1/2/4 on
    // testdata; pair volume grows ~p²). DISTINCT collapses pairs that
    // co-occur in several probed cells.
    val probeUdf = udf { (v: Seq[Double]) =>
      quantizer.nearestCells(v, probes)
    }
    // materialize the multi-probe assignment ONCE: it feeds both sides
    // of the eps self-join AND the noise remainder, and without the
    // barrier Spark re-evaluates the O(n·nlist·dims) assignment UDF in
    // every consumer — at nlist ≈ √n the redundant passes dominate the
    // whole clustering (measured r11: 2×33 s of an 80 s edge job).
    // Same buildIndex pattern; state is the 4n assignment rows.
    // (r15 opt note — measured NEGATIVE result, kept on record so
    // nobody retries it: carrying the vector column as array<float>
    // through the eps-pair rows (4 B/dim instead of 8; cosine widens
    // per element, bit-identical) LOST in alternating fresh-JVM A/B —
    // dd_semdedup@sf1 4.3→6.5 s (1.48–1.64×), sim_dbscan_p2@sf1
    // 1.09–1.31× — with PLAN-IDENTICAL physical plans both arms: the
    // within-cell cosine loop is CPU-bound on cache-resident rows, so
    // the per-element f2d conversion costs more than the halved row
    // bytes save. Raw: target/attrib/r15opt_simcc_ab{,2}.jsonl.)
    val assigned = embeddings.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("e"))
      .withColumn("cell", explode(probeUdf(col("e"))))
      .localCheckpoint(true)
    val a = assigned.select(col("cell"), col("vec_id").as("s"),
      col("e").as("ea"))
    val b = assigned.select(col("cell").as("cb"), col("vec_id").as("t"),
      col("e").as("eb"))
    // per-cell occupancy cap (r14 verdict #3, see [[DefaultCellCap]]):
    // occupancy here counts ASSIGNMENT rows (multi-probe replication
    // included — that is the join's actual input); oversized cells
    // grid-shard both sides so the eps self-join's |cell|² product
    // spreads over nsh² tasks instead of serializing one reducer.
    // Results are bit-identical — every (s,t) pair meets in exactly
    // one (sa,sb) bucket — so the common small-cell path keeps the
    // legacy single-key plan.
    val over = oversizedCells(assigned, cellCap)
    // both directions of every in-cell eps-pair; feeds degree, the
    // core subgraph, AND border attachment — one materialization
    val joinedAB =
      if (over.isEmpty)
        a.join(b, col("cell") === col("cb") && col("s") =!= col("t"))
      else {
        val nshUdf = udf { (cell: Int) => over.getOrElse(cell, 1) }
        val a2 = a
          .withColumn("nsh", nshUdf(col("cell")))
          .withColumn("sa", pmod(xxhash64(col("s")), col("nsh")).cast("int"))
          .withColumn("sb_all", explode(sequence(lit(0), col("nsh") - 1)))
          .drop("nsh")
        val b2 = b
          .withColumn("nsh", nshUdf(col("cb")))
          .withColumn("sb", pmod(xxhash64(col("t")), col("nsh")).cast("int"))
          .withColumn("sa_all", explode(sequence(lit(0), col("nsh") - 1)))
          .drop("nsh")
        a2.join(b2, col("cell") === col("cb") &&
          col("sa") === col("sa_all") && col("sb_all") === col("sb") &&
          col("s") =!= col("t"))
      }
    val rawEdges = joinedAB
      .filter(cosineCol(col("ea"), col("eb")) >= minCosine)
      .select("s", "t")
    // single-assign pairs are already unique — skip the dedup shuffle
    val edges = (if (probes > 1) rawEdges.distinct() else rawEdges)
      .localCheckpoint(true)
    val core = edges.groupBy("s").agg(count(lit(1)).as("nn"))
      .filter(col("nn") >= minPts).select(col("s").as("vec_id"))
    // one direction only (r15 opt): `edges` holds BOTH orders of every
    // eps pair, and connectedComponents unions the swap itself — the
    // old both-order feed made every undirected edge appear FOUR times
    // in the CC rounds' join input. s<t halves every CC round's
    // edge⋈label join and neighbor-min aggregate; min-labels are
    // duplicate-insensitive, so the labeling is identical.
    val ce = edges
      .filter(col("s") < col("t"))
      .join(core.select(col("vec_id").as("s")), Seq("s"))
      .join(core.select(col("vec_id").as("t")), Seq("t"))
      .select(col("s").as("doc_a"), col("t").as("doc_b"))
    val clab = graft.dedup.Dedup.connectedComponents(core, ce,
      idCol = "vec_id")
    val border = edges
      .join(core.select(col("vec_id").as("s")), Seq("s"), "left_anti")
      .join(clab.select(col("vec_id").as("t"), col("cluster_id")),
        Seq("t"))
      .groupBy(col("s").as("vec_id"))
      .agg(min(col("cluster_id")).as("cluster"))
    val coreOut = clab.select(col("vec_id"), lit("core").as("role"),
      col("cluster_id").as("cluster"))
    val borderOut = border.select(col("vec_id"), lit("border").as("role"),
      col("cluster"))
    val noise = assigned.select("vec_id").distinct()
      .join(clab.select("vec_id"), Seq("vec_id"), "left_anti")
      .join(border.select("vec_id"), Seq("vec_id"), "left_anti")
      .select(col("vec_id"), lit("noise").as("role"),
        lit(-1L).as("cluster"))
    coreOut.unionAll(borderOut).unionAll(noise)
  }

  /** MMR diversified top-k (Carbonell & Goldstein 1998): greedy
    * re-rank of a bounded candidate pool balancing relevance against
    * redundancy — pick argmax λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)
    * k times. The de-duplicating retrieval step every RAG/search
    * pipeline runs after ANN: plain top-k returns near-duplicate
    * neighbors; MMR spends the k slots on DISTINCT relevant results.
    *
    * λ fixed at 0.5 (exactly representable — both λ and 1−λ are one
    * float product each, so the score arithmetic replays bit-equal in
    * the oracle); ties broken by cand_id (total order). Each greedy
    * step is a bounded join: remaining pool × selected set (≤ k rows
    * per query), a (query, cand) max-sim aggregate, and a per-query
    * top-1 window — all state bounded by poolSize, never the corpus.
    * The pool here comes from the guarded brute-force scorer so the
    * DuckDB oracle can replay candidate generation exactly; at corpus
    * scale feed the pool from [[ivfTopK]]/[[lshTopK]] candidates
    * instead (the greedy stage is source-agnostic).
    */
  def mmrTopK(embeddings: DataFrame, k: Int = 3, poolSize: Int = 8,
      nQueries: Int = 10, maxCorpusRows: Long = 100000L): DataFrame = {
    require(k >= 1 && poolSize >= k,
      s"bad mmr params: k=$k poolSize=$poolSize")
    require(graft.Guards.atMost(embeddings, maxCorpusRows),
      s"mmrTopK's brute pool scores |q|x|c| pairs: corpus exceeds " +
        s"$maxCorpusRows rows; feed the pool from ivfTopK at scale")
    val e = embeddings.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("e"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("e").as("eq"))
    val c = e.select(col("vec_id").as("cand_id"), col("e").as("ec"))
    val wRel = Window.partitionBy("query_id")
      .orderBy(col("rel").desc, col("cand_id"))
    val pool = q.join(broadcast(c), col("query_id") =!= col("cand_id"))
      .withColumn("rel", cosineCol(col("eq"), col("ec")))
      .withColumn("rk", row_number().over(wRel))
      .filter(col("rk") <= poolSize)
      .select("query_id", "cand_id", "rel", "ec")
    mmrGreedy(pool, k)
  }

  /** Embedding-level cross-split contamination audit (r12) — the
    * SEMANTIC leg of the decontamination family: exact membership is
    * the bloom gate (`st_bloom_decontam`), shared n-grams are
    * `t_split_leakage`, and this catches the eval example that is a
    * PARAPHRASE or near-duplicate of a training example — the leak
    * neither of those sees, and the one that actually inflates evals
    * (Yang et al. 2023, "Rethinking benchmark and contamination...").
    *
    * Split: the corpus's own md5-even/odd halves (the
    * `t_lm_heldout`/`t_split_leakage` convention — `hashBucket % 2`,
    * replayed identically in DuckDB). Candidates: the [[dbscan]]
    * machinery — one multi-probe assignment pass at the √n-cell
    * quantizer (eagerly checkpointed, it feeds both split sides), a
    * cell-keyed train×eval join, exact cosine ≥ minCos on candidates
    * only. Per flagged eval vector: its BEST train neighbor (max
    * cosine, ties to the lower train id) and the candidate count.
    *
    * Recall caveat (the semdedup posture): candidates are limited to
    * pairs sharing a probed cell, so recall follows the MEASURED
    * dbscan curve (`sim_dbscan_scaled_recall`: 83% at p=4 for ≥0.3
    * pairs on testdata — higher for the tighter threshold here, since
    * closer pairs co-cell more often). An audit that must be
    * exhaustive at small scale composes with [[bruteForceTopK]];
    * at 100 TB the cell-bounded form is the runnable one.
    */
  def crossSplitLeakage(embeddings: DataFrame, minCos: Double = 0.4,
      nprobe: Int = 4, cellCap: Int = DefaultCellCap): DataFrame = {
    val nlist = math.ceil(math.sqrt(embeddings.count().toDouble)).toInt
    val quant = hashSampledQuantizer(embeddings, nlist)
    val probeUdf = udf { (v: Seq[Double]) => quant.nearestCells(v, nprobe) }
    val asg = embeddings.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("e"),
        (graft.pipeline.Sampling.hashBucket("vec_id") % 2).as("side"))
      .select(col("vec_id"), col("e"), col("side"),
        explode(probeUdf(col("e"))).as("cell"))
      .localCheckpoint(true)
    // same per-cell occupancy cap as ivfTopK/dbscan (r14 verdict #3):
    // the train×eval join is cell-keyed too, and a stale-layout hot
    // cell would serialize it identically. Occupancy counted over BOTH
    // halves (conservative — binds a little early, never late).
    val over = oversizedCells(asg, cellCap)
    val tr = asg.filter(col("side") === 0)
      .select(col("cell"), col("vec_id").as("train_id"), col("e").as("et"))
    val ev = asg.filter(col("side") === 1)
      .select(col("cell"), col("vec_id").as("eval_id"), col("e").as("ee"))
    val joinedTE =
      if (over.isEmpty) tr.join(ev, "cell")
      else {
        val nshUdf = udf { (cell: Int) => over.getOrElse(cell, 1) }
        val t2 = tr.withColumn("nsh", nshUdf(col("cell")))
          .withColumn("sa",
            pmod(xxhash64(col("train_id")), col("nsh")).cast("int"))
          .withColumn("sb", explode(sequence(lit(0), col("nsh") - 1)))
          .drop("nsh")
        val e2 = ev.withColumn("nsh", nshUdf(col("cell")))
          .withColumn("sb",
            pmod(xxhash64(col("eval_id")), col("nsh")).cast("int"))
          .withColumn("sa", explode(sequence(lit(0), col("nsh") - 1)))
          .drop("nsh")
        t2.join(e2, Seq("cell", "sa", "sb")).drop("sa", "sb")
      }
    val scored = joinedTE
      .select(col("eval_id"), col("train_id"),
        cosineCol(col("et"), col("ee")).as("cos"))
      .distinct() // multi-probe co-cells; cos is bit-identical per pair
      .filter(col("cos") >= minCos)
    val byEval = Window.partitionBy("eval_id")
    scored
      .withColumn("rn", row_number().over(
        byEval.orderBy(col("cos").desc, col("train_id"))))
      .withColumn("n_cands", count(lit(1)).over(byEval))
      .filter(col("rn") === 1)
      .select(col("eval_id"), col("train_id"),
        round(col("cos"), 6).as("cos"), col("n_cands"))
  }

  /** MMR with the pool fed from the IVF index (r10 verdict #3 — the
    * AT-SCALE path the [[mmrTopK]] docstring promises): candidate
    * generation is [[ivfTopK]]'s bucketed inverted-list join (the
    * corpus appears ONLY there — no broadcast crossJoin, no Guards
    * gate needed), the per-query top-`poolSize` candidates join back
    * their embedding vectors, and the SAME greedy re-rank runs over
    * the bounded pool. Recall inherits the IVF operating point
    * (nprobe from the measured curve — `sim_ivf_probe_curve` /
    * [[autoNprobe]]); queries landing in sparse cells may pool fewer
    * than `poolSize` candidates and then yield fewer than `k` ranks —
    * the honest ANN-fed behavior, replayed identically by the oracle.
    */
  def mmrTopKIvf(quantizer: IvfQuantizer, embeddings: DataFrame,
      k: Int = 3, poolSize: Int = 8, nQueries: Int = 10,
      nprobe: Int = 4): DataFrame = {
    val e = embeddings.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("e"))
    val cands = ivfTopK(quantizer, embeddings, k = poolSize,
        nprobe = nprobe)
      .filter(col("query_id") < nQueries)
      .select("query_id", "cand_id")
    val pool = cands
      .join(e.select(col("vec_id").as("query_id"), col("e").as("eq")),
        "query_id")
      .join(e.select(col("vec_id").as("cand_id"), col("e").as("ec")),
        "cand_id")
      .withColumn("rel", cosineCol(col("eq"), col("ec")))
      .select("query_id", "cand_id", "rel", "ec")
    mmrGreedy(pool, k)
  }

  /** The greedy MMR re-rank over ANY (query_id, cand_id, rel, ec)
    * pool — source-agnostic (brute [[mmrTopK]], IVF [[mmrTopKIvf]], or
    * any retriever). Pool is eagerly materialized once
    * (nQueries·poolSize rows) and feeds every step; each step is a
    * pool-bounded join + max-sim aggregate + per-query top-1 window.
    */
  private def mmrGreedy(pool0: DataFrame, k: Int): DataFrame = {
    val wRel = Window.partitionBy("query_id")
      .orderBy(col("rel").desc, col("cand_id"))
    val pool = pool0.localCheckpoint(true)
    var selected = pool
      .withColumn("rk", row_number().over(wRel))
      .filter(col("rk") === 1)
      .select(col("query_id"), col("cand_id"), col("rel"), col("ec"),
        lit(1).as("rank"))
    for (step <- 2 to k) {
      val remaining = pool.join(
        selected.select("query_id", "cand_id"),
        Seq("query_id", "cand_id"), "left_anti")
      val maxsim = remaining
        .join(selected.select(col("query_id"), col("ec").as("es")),
          Seq("query_id"))
        .withColumn("sim", cosineCol(col("ec"), col("es")))
        .groupBy("query_id", "cand_id")
        .agg(max(col("sim")).as("maxsim"))
      val wScore = Window.partitionBy("query_id")
        .orderBy(col("score").desc, col("cand_id"))
      val pick = pool.join(maxsim, Seq("query_id", "cand_id"))
        .withColumn("score",
          lit(0.5) * col("rel") - lit(0.5) * col("maxsim"))
        .withColumn("rk", row_number().over(wScore))
        .filter(col("rk") === 1)
        .select(col("query_id"), col("cand_id"), col("rel"), col("ec"),
          lit(step).as("rank"))
      selected = selected.unionByName(pick)
    }
    selected.select(col("query_id"), col("rank"), col("cand_id"),
      round(col("rel"), 6).as("rel"))
  }

  /** Pick the operating nprobe from a measured recall curve (r9
    * verdict #8 stretch — the knee of the `sim_ivf_probe_curve`
    * measurement): the SMALLEST nprobe whose recall is within
    * `slackPpm` of the best measured recall. Rationale: IVF cost is
    * linear in nprobe (each probe scans one more inverted list), while
    * recall saturates — beyond the knee a doubling of the probe budget
    * buys less than the slack, so the knee is the right default
    * operating point; callers with a hard recall SLO pass their own
    * slack. Driver-side over the (arms-sized, ≤ a handful of rows)
    * curve — the model-sized-collect contract.
    */
  def autoNprobe(curve: Seq[(Int, Long)], slackPpm: Long = 20000L): Int =
    curvePick(curve, slackPpm)

  /** The ONE curve-driven knob picker (r10 verdict #8): every
    * bounded-recall parameter in the repo — IVF `nprobe`
    * ([[autoNprobe]] / `sim_auto_nprobe`), DBSCAN assignment probes
    * ([[autoProbes]] / `sim_dbscan_auto`), and any future LSH
    * band/table count — is chosen from its MEASURED (knob, recall_ppm)
    * curve by this same audited rule: the SMALLEST knob value whose
    * recall is within `slackPpm` of the best measured arm. Cost is
    * monotone in the knob (linear for nprobe, ~quadratic in pair
    * volume for DBSCAN probes) while recall saturates, so the knee is
    * the right default operating point; callers with a hard recall SLO
    * pass their own slack. Driver-side over an arms-sized (≤ handful
    * of rows) curve — the model-sized-collect contract. The SQL twin
    * of this rule is a min-over-slack filter over the same UNION ALL'd
    * arm chains, so an off-by-one on either side hash-fails the auto
    * entries.
    */
  def curvePick(curve: Seq[(Int, Long)], slackPpm: Long = 20000L): Int = {
    require(curve.nonEmpty, "empty recall curve")
    require(slackPpm >= 0, s"slackPpm out of range: $slackPpm")
    val best = curve.map(_._2).max
    curve.sortBy(_._1)
      .collectFirst { case (p, r) if r >= best - slackPpm => p }.get
  }

  /** DBSCAN assignment-probe pick from the measured
    * `sim_dbscan_recall_curve` — same rule, named for the knob.
    */
  def autoProbes(curve: Seq[(Int, Long)], slackPpm: Long = 20000L): Int =
    curvePick(curve, slackPpm)

  /** LSH-bucketed approximate top-k: vectors sharing any of the `tables`
    * signature buckets are candidates; exact cosine re-ranks. Recall is
    * tunable via planes/tables; each table is one shuffle key, so cost
    * scales with bucket occupancy instead of n².
    *
    * Degenerate buckets (near-identical vectors all hashing to one
    * signature) are excluded above `maxBucket` members BEFORE the pair
    * self-join — the same guard [[graft.dedup.Dedup.minhashCandidates]]
    * uses — so one hot bucket can't reintroduce the k² pair blowup the
    * bucketing exists to avoid.
    */
  def lshTopK(embeddings: DataFrame, k: Int, planes: Int = 12,
      tables: Int = 4, seed: Long = 42L,
      maxBucket: Int = 1024): DataFrame = {
    val sigUdf = udf { (vec: Seq[Double], table: Int) =>
      hyperplaneSig(vec, planes, seed + table * 0x51ab61c3L)
    }
    val base = embeddings.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("e"))
    val tablesDf = base
      .withColumn("tbl", explode(sequence(lit(0), lit(tables - 1))))
      .withColumn("bucket", sigUdf(col("e"), col("tbl")))
    val smallBuckets = tablesDf.groupBy("tbl", "bucket")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n").between(2, maxBucket))
      .select("tbl", "bucket")
    val inBucket = tablesDf.join(smallBuckets, Seq("tbl", "bucket"))
    val a = inBucket.select(col("tbl"), col("bucket"),
      col("vec_id").as("query_id"), col("e").as("eq"))
    val b = inBucket.select(col("tbl").as("tbl_b"), col("bucket").as("bucket_b"),
      col("vec_id").as("cand_id"), col("e").as("ec"))
    val cands = a.join(b,
        col("tbl") === col("tbl_b") && col("bucket") === col("bucket_b") &&
          col("query_id") =!= col("cand_id"))
      .select("query_id", "cand_id", "eq", "ec")
      .dropDuplicates("query_id", "cand_id")
      .withColumn("cosine", cosineCol(col("eq"), col("ec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("cand_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  // --------------------------------------------- product quantization

  /** Product-quantization codebook: the embedding space split into `m`
    * subspaces of `dsub` dims, each with its own `ksub` centroids —
    * `centers(s)(c)` is centroid c of subspace s. A vector compresses to
    * m small codes (m bytes at ksub ≤ 256): a 64-dim float vector (256 B)
    * becomes 8 B — 32× less memory/IO, which is what makes a 100 TB
    * embedding corpus scannable. Distances against raw queries are
    * computed asymmetrically (ADC): the query stays full-precision, the
    * candidate is its reconstructed centroids, so error stays one-sided.
    */
  final case class PqCodebook(dsub: Int,
      centers: Array[Array[Array[Double]]]) {
    def m: Int = centers.length
    def ksub: Int = centers(0).length

    /** Nearest-centroid code per subspace (squared L2, ties to the
      * smallest centroid id — the oracle's ORDER BY d2, c).
      */
    private[sim] def encodeOne(e: Seq[Double]): Array[Int] = {
      val codes = new Array[Int](m)
      var s = 0
      while (s < m) {
        var best = Double.MaxValue
        var bestC = 0
        var c = 0
        while (c < centers(s).length) {
          val ctr = centers(s)(c)
          var d2 = 0.0
          var j = 0
          while (j < dsub) {
            val t = e(s * dsub + j) - ctr(j); d2 += t * t; j += 1
          }
          if (d2 < best) { best = d2; bestC = c }
          c += 1
        }
        codes(s) = bestC
        s += 1
      }
      codes
    }

    /** Per-subspace minimum squared distance to the assigned codeword —
      * the quantization error behind [[Similarity.pqDistortion]]. Same
      * loop as [[encodeOne]] (strict-< keeps the ORDER BY d2, c tie
      * rule), returning the error instead of the code.
      */
    private[sim] def quantizationError(e: Seq[Double]): Array[Double] = {
      val errs = new Array[Double](m)
      var s = 0
      while (s < m) {
        var best = Double.MaxValue
        var c = 0
        while (c < centers(s).length) {
          val ctr = centers(s)(c)
          var d2 = 0.0
          var j = 0
          while (j < dsub) {
            val t = e(s * dsub + j) - ctr(j); d2 += t * t; j += 1
          }
          if (d2 < best) best = d2
          c += 1
        }
        errs(s) = best
        s += 1
      }
      errs
    }

    /** Asymmetric (ADC) squared distance: raw query sub-vectors vs the
      * candidate's code centroids. Per-subspace d2 is a sequential
      * left fold over dims, accumulated subspace-ascending — exactly
      * the fold order the DuckDB oracle replays, so the doubles are
      * bit-equal cross-engine.
      */
    private[sim] def adcDistance(q: Seq[Double], codes: Seq[Int]): Double = {
      var acc = 0.0
      var s = 0
      while (s < m) {
        val ctr = centers(s)(codes(s))
        var d2 = 0.0
        var j = 0
        while (j < dsub) {
          val t = q(s * dsub + j) - ctr(j); d2 += t * t; j += 1
        }
        acc += d2
        s += 1
      }
      acc
    }
  }

  /** Deterministic PQ codebook via the same hash-sampling trick as
    * [[hashSampledQuantizer]]: subspace s's centroids are the s-slices
    * of the `ksub` corpus vectors with smallest md5(vec_id), centroid id
    * = md5 rank. Fully replayable from the table itself (the
    * `sim_pq_adc` oracle re-derives them); swap in k-means sub-codebooks
    * offline for better recall with the same encode/ADC path.
    */
  def hashSampledPqCodebook(embeddings: DataFrame, m: Int = 8,
      ksub: Int = 16): PqCodebook = {
    val sampled = embeddings
      .select(md5(col("vec_id").cast("string").cast("binary")).as("h"),
        transform(col("embedding"), _.cast("double")).as("e"))
      .orderBy(col("h")).limit(ksub)
      .select(col("e")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(sampled.nonEmpty, "empty corpus — cannot derive a codebook")
    val dims = sampled(0).length
    require(dims % m == 0, s"m=$m must divide dims=$dims")
    val dsub = dims / m
    PqCodebook(dsub, Array.tabulate(m, sampled.length)((s, c) =>
      sampled(c).slice(s * dsub, (s + 1) * dsub)))
  }

  /** PQ codebook distortion audit: per subspace, the mean and max
    * squared quantization error (distance from each vector's sub-slice
    * to its ASSIGNED codeword) — the number that tells you which
    * subspace's codebook is under-fitted BEFORE recall degrades
    * downstream (Jégou et al. 2011 tune PQ by exactly this figure).
    * Map-only scoring (codebook rides the task closure) + one m-row
    * aggregate; means round to 1e-6 at SLICE level (m rows — the
    * t_entropy argument), max is comparison-based and exact.
    */
  def pqDistortion(codebook: PqCodebook,
      embeddings: DataFrame): DataFrame = {
    val errs = udf { (e: Seq[Double]) => codebook.quantizationError(e) }
    embeddings
      .select(transform(col("embedding"), _.cast("double")).as("e"))
      .select(posexplode(errs(col("e"))).as(Seq("s", "d2")))
      .groupBy("s")
      .agg(count(lit(1)).as("n_vecs"),
        round(avg("d2"), 6).as("mean_d2"),
        round(max("d2"), 6).as("max_d2"))
  }

  /** PQ-encode a corpus: (vec_id, codes[m]). At scale this is the
    * materialized compressed index — the raw embeddings never need to
    * be read again for scanning.
    */
  def pqEncode(codebook: PqCodebook, embeddings: DataFrame): DataFrame = {
    val enc = udf { (e: Seq[Double]) => codebook.encodeOne(e) }
    embeddings
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("e"))
      .withColumn("codes", enc(col("e")))
      .select("vec_id", "codes")
  }

  /** ADC top-k: scan the PQ-encoded corpus once per query batch,
    * ranking by asymmetric distance (ascending). The scan reads m-byte
    * codes instead of full vectors — the 32× IO cut is the scale story;
    * compose with [[ivfTopK]]'s cell layout to also cut the scanned
    * FRACTION (IVF-PQ: probe nprobe cells, ADC-scan only their codes).
    */
  def pqAdcTopK(codebook: PqCodebook, queries: DataFrame,
      corpus: DataFrame, k: Int): DataFrame = {
    val dist = udf { (q: Seq[Double], codes: Seq[Int]) =>
      codebook.adcDistance(q, codes)
    }
    val encoded = pqEncode(codebook, corpus)
      .select(col("vec_id").as("cand_id"), col("codes"))
    val q = queries.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("eq"))
    val scored = q.join(encoded, col("query_id") =!= col("cand_id"))
      .withColumn("adc", dist(col("eq"), col("codes")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc"), col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"),
        round(col("adc"), 6).as("adc_dist"), col("rank"))
  }

  /** IVF-PQ top-k: the composed billion-scale ANN layout (Jégou et al.
    * 2011) — the coarse quantizer prunes the scanned FRACTION (each
    * query probes `nprobe` of `nlist` inverted lists) and PQ codes cut
    * the per-candidate IO 32× (ADC distance against m-byte codes, the
    * raw candidate vectors are never read). At 100 TB the inverted
    * lists are the table's partition layout and `codes` is the only
    * column the scan touches; the ADC ranking is asymmetric so the
    * query stays full-precision. Compose with an exact re-rank of the
    * top candidates when recall of the raw metric matters.
    */
  def ivfPqTopK(quantizer: IvfQuantizer, codebook: PqCodebook,
      queries: DataFrame, corpus: DataFrame, k: Int,
      nprobe: Int = 4): DataFrame = {
    val assigned = quantizer.assign(corpus)
      .select(col("vec_id").as("cand_id"), col("cell"))
    val encoded = pqEncode(codebook, corpus)
      .select(col("vec_id").as("cand_id"), col("codes"))
    val lists = assigned.join(encoded, Seq("cand_id"))
    val probeUdf = udf { (e: Seq[Double]) =>
      quantizer.nearestCells(e, nprobe)
    }
    val q = queries.select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("eq"))
      .withColumn("cell", explode(probeUdf(col("eq"))))
    val dist = udf { (qv: Seq[Double], codes: Seq[Int]) =>
      codebook.adcDistance(qv, codes)
    }
    val cands = q.join(lists, Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .dropDuplicates("query_id", "cand_id")
      .withColumn("adc", dist(col("eq"), col("codes")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc"), col("cand_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"),
        round(col("adc"), 6).as("adc_dist"), col("rank"))
  }

  /** Per-label centroids in long format (label, dim, centroid, n_vecs):
    * posexplode → per-(label, dim) mean — one shuffle keyed on
    * (label, dim), partial aggregation map-side, no vector assembly on
    * the driver. The building block for IVF coarse quantizers and
    * class-prototype analysis; long format keeps it relational (and
    * DuckDB-oracle checkable) instead of opaque arrays.
    */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(round(avg(col("v").cast("double")), 6).as("centroid"),
        count(lit(1)).as("n_vecs"))

  /** Hard-negative mining margins for contrastive training prep: per
    * anchor vector, the best same-label cosine (hardest positive proxy)
    * and best different-label cosine (hardest NEGATIVE — the pair a
    * contrastive loss most needs) among its coarse-cell neighbors,
    * plus the ×10⁴ integer margin between them. Small margins mark the
    * anchors worth mining; negative margins mark label noise.
    *
    * Scale shape: the SemDeDup trade — pair generation is WITHIN-CELL
    * only (cells are the shuffle keys, Σ|cell|² not n²), the per-anchor
    * reduction is a map-combinable max/count aggregate, and the margin
    * is computed from bit-equal cosine folds so the integer grid is
    * engine-exact (the dd_semdedup threshold precedent).
    */
  def pairMargin(quantizer: IvfQuantizer, embeddings: DataFrame): DataFrame =
    pairMargin(buildIndex(quantizer, embeddings))

  /** Margin mining from a BUILT index (shared cell assignment with
    * [[ivfTopK]] — one assign pass serves retrieval and mining).
    */
  def pairMargin(index: IvfIndex): DataFrame = {
    require(index.assigned.columns.contains("label"),
      "pairMargin needs a label column — build the index from a labelled table")
    val asg = index.assigned
    val a = asg.select(col("vec_id").as("anchor_id"), col("cell"),
      col("label").as("la"), col("e").as("ea"))
    val b = asg.select(col("vec_id").as("cand_id"), col("cell"),
      col("label").as("lb"), col("e").as("eb"))
    a.join(b, Seq("cell")).filter(col("anchor_id") =!= col("cand_id"))
      .withColumn("cos", graft.dedup.Dedup.cosineCol(col("ea"), col("eb")))
      .groupBy(col("anchor_id"), col("cell"), col("la"))
      .agg(max(when(col("la") === col("lb"), col("cos"))).as("pos_cos"),
        sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("n_pos"),
        max(when(col("la") =!= col("lb"), col("cos"))).as("neg_cos"),
        sum(when(col("la") =!= col("lb"), 1L).otherwise(0L)).as("n_neg"))
      .filter(col("pos_cos").isNotNull && col("neg_cos").isNotNull)
      .select(col("anchor_id").cast("long").as("anchor_id"),
        col("cell").cast("int").as("cell"), col("la").as("label"),
        col("n_pos"), col("n_neg"),
        expr("CAST(floor((pos_cos - neg_cos) * 10000 + 0.5) AS BIGINT)")
          .as("margin_u"))
  }

  /** Inter-slice semantic affinity: pairwise cosine between label
    * centroids — the dataset-audit matrix answering "which data slices
    * overlap semantically?" (near-1 pairs are merge/contamination
    * candidates; near-0 pairs are genuinely distinct domains).
    *
    * Scale shape: the corpus reduces to the labels×dims centroid table
    * ([[labelCentroids]] — one (label, dim) exchange of map-combined
    * partial avgs); everything after operates on ≤ labels rows, so the
    * pair join is bounded at labels² regardless of corpus size. The
    * dot/norm folds run left-to-right over ROUNDED centroid values on
    * both engines, so the rounded cosine is engine-exact.
    */
  def centroidAffinity(embeddings: DataFrame): DataFrame = {
    val byLabel = labelCentroids(embeddings)
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("dim"), col("centroid"))))
        .as("cs"))
      .select(col("label"), expr("transform(cs, x -> x.centroid)").as("c"))
    val a = byLabel.select(col("label").as("label_a"), col("c").as("ca"))
    val b = byLabel.select(col("label").as("label_b"), col("c").as("cb"))
    a.join(b, col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"),
        round(expr(
          """aggregate(zip_with(ca, cb, (x, y) -> x * y), 0D, (a, v) -> a + v)
             / (sqrt(aggregate(ca, 0D, (a, v) -> a + v * v))
                * sqrt(aggregate(cb, 0D, (a, v) -> a + v * v)))"""), 6)
          .as("cosine"))
  }

  /** Embedding norm audit: per-vector L2 norm on the ×10⁴ integer grid
    * plus an outlier flag against 1.5× the corpus median — catches
    * broken encoders (zero vectors, exploding norms) before vectors
    * enter an index. All comparisons are pure integer arithmetic
    * (norm_u·4 > 3·(2·median) with 2·median exact by interpolation), so
    * the flag has no float knife-edge anywhere. The median aggregates
    * the integer grid — bounded state for unit-ish-norm embeddings —
    * and broadcasts back as one row; the norm pass is map-only.
    */
  def normAudit(embeddings: DataFrame): DataFrame = {
    val normed = embeddings.select(col("vec_id"), col("label"),
      expr("""CAST(floor(sqrt(aggregate(embedding, 0D,
           (a, v) -> a + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))
           * 10000 + 0.5) AS BIGINT)""").as("norm_u"))
    val med = normed.agg(
      expr("CAST(2 * percentile(norm_u, 0.5D) AS BIGINT)").as("med2"))
    normed.crossJoin(broadcast(med))
      .select(col("vec_id"), col("label"), col("norm_u"),
        (col("norm_u") * 4 > col("med2") * 3).cast("int").as("outlier_hi"),
        (col("norm_u") * 4 < col("med2")).cast("int").as("outlier_lo"))
  }

  /** Sign (Achlioptas/Johnson–Lindenstrauss) random projection of the
    * embedding corpus to `outDims` integer components: the cheap dense
    * dimensionality reduction run before brute-force rerank or as a
    * compact sketch column. proj(v, k) = Σ_j sign(j, k) · q_j on the
    * ×10⁴ integer element grid, with sign(j, k) the SIGN BIT of the
    * native splitmix64 of the flat matrix index — so the projection is
    * exact long arithmetic end to end and the oracle replays the sign
    * matrix in mod-2⁶⁴ HUGEINT SQL (SplitMix64Sql).
    *
    * Scale shape: the sign matrix is dims×outDims rows built from
    * `spark.range` (KBs — broadcast), the element explode is map-local,
    * and the single exchange is the map-combined (vec_id, k) sum:
    * rows·outDims partial aggregates, never the dense matrix.
    */
  def signRandomProjection(embeddings: DataFrame, outDims: Int,
      dims: Int = 64): DataFrame = {
    require(outDims >= 1 && outDims <= 256, s"outDims out of range: $outDims")
    require(dims >= 1 && dims <= 65536, s"dims out of range: $dims")
    import graft.functions.SplitMix64.splitmix64
    val spark = embeddings.sparkSession
    val signs = spark.range(0, dims.toLong * outDims).select(
      expr(s"id div $outDims + 1").as("j"),
      expr(s"id % $outDims").as("k"),
      when(splitmix64(col("id")) >= 0, 1L).otherwise(-1L).as("sgn"))
    val el = embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), (col("pos") + 1).as("j"),
        expr("CAST(floor(CAST(v AS DOUBLE) * 10000 + 0.5) AS BIGINT)")
          .as("q"))
    el.join(broadcast(signs), "j")
      .groupBy(col("vec_id").cast("long").as("vec_id"), col("k"))
      .agg(sum(col("sgn") * col("q")).as("proj_u"))
  }

  /** Lloyd's k-means over the embedding corpus — the cluster layout
    * behind SemDeDup-style curation (dedup within topic cells),
    * IVF list assignment, and domain bucketing. Fully deterministic so
    * a SQL oracle replays it bit-for-bit:
    *
    *  - init = [[hashSampledQuantizer]] (centers = the k corpus vectors
    *    with smallest md5(vec_id), cell id = md5 rank);
    *  - each refit rounds centroid coordinates to 1e-6, collapsing the
    *    engine-dependent FP summation order of `avg` below the rounding
    *    grid (the same boundary-rounding contract every cosine oracle
    *    in this file relies on);
    *  - empty cells inherit the previous iteration's center (k-means
    *    never resurrects a lost cell here — reproducible beats clever);
    *  - assignment ties break on the lower cell id.
    *
    * Scale shape: per iteration, assignment is MAP-ONLY (the k×dims
    * centroid array travels in the task closure) and the refit is one
    * exchange of map-side-combined (cell, dim) partial sums — k·dims
    * rows total, collected once on the driver (bounded by k·dims, not
    * by data; same bounded-collect contract as the quantizer fits).
    * The corpus itself never shuffles, so iterations cost k·dims·P
    * network bytes regardless of corpus size — the standard distributed
    * Lloyd's layout.
    */
  def kmeansAssign(embeddings: DataFrame, k: Int = 8,
      iters: Int = 2): DataFrame = {
    val q = kmeansFit(embeddings, k, iters)
    val d2Udf = udf { (e: Seq[Double], cell: Int) =>
      val c = q.centers(cell)
      var d = 0.0
      var j = 0
      while (j < e.length) { val t = e(j) - c(j); d += t * t; j += 1 }
      d
    }
    q.assign(embeddings)
      .select(col("vec_id"), col("cell"),
        round(d2Udf(col("e"), col("cell")), 6).as("d2"))
  }

  /** The Lloyd's fit loop shared by [[kmeansAssign]] and
    * [[kmeansSilhouette]]: hash-sampled init, `iters` refits, each
    * collecting only the k·dims (cell, dim) means.
    */
  private def kmeansFit(embeddings: DataFrame, k: Int,
      iters: Int): IvfQuantizer = {
    var quant = hashSampledQuantizer(embeddings, nlist = k)
    for (_ <- 1 to iters) {
      val refit = quant.assign(embeddings)
        .select(col("cell"), posexplode(col("e")).as(Seq("dim", "v")))
        .groupBy("cell", "dim")
        .agg(round(avg(col("v")), 6).as("c"))
        .collect()
      val centers = quant.centers.map(_.clone())
      refit.foreach { r =>
        centers(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      }
      quant = IvfQuantizer(centers)
    }
    quant
  }

  /** Simplified (centroid-based) silhouette per cluster cell — the
    * clustering-quality eval: per vector a = d² to its own centroid,
    * b = d² to the second-nearest, s = (b−a)/max(a,b) ∈ [0, 1]. Each
    * vector's s rounds to an integer ppm BEFORE the per-cell mean
    * (order-free integer sums — the nDCG/PSI contract), so the k-row
    * report hash-matches the oracle that replays the same fit.
    * Map-only scoring (centroids ride the task closure) + one k-row
    * aggregate; the corpus never shuffles.
    */
  def kmeansSilhouette(embeddings: DataFrame, k: Int = 8,
      iters: Int = 2): DataFrame = {
    val q = kmeansFit(embeddings, k, iters)
    val abUdf = udf { (e: Seq[Double]) =>
      val ds = q.centers.zipWithIndex.map { case (c, i) =>
        var d = 0.0
        var j = 0
        while (j < e.length) { val t = e(j) - c(j); d += t * t; j += 1 }
        (d, i)
      }.sortBy(_._1) // stable: distance ties resolve to the lower cell
      (ds(0)._2, ds(0)._1, ds(1)._1)
    }
    embeddings
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("e"))
      .select(col("vec_id"), abUdf(col("e")).as("ab"))
      .select(col("ab._1").as("cell"), col("ab._2").as("a"),
        col("ab._3").as("b"))
      .select(col("cell"),
        when(greatest(col("a"), col("b")) === 0.0, 0L)
          .otherwise(round((col("b") - col("a")) /
            greatest(col("a"), col("b")) * 1e6).cast("long"))
          .as("s_ppm"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"),
        sum("s_ppm").as("sum_s"),
        min("s_ppm").as("min_s_ppm"),
        max("s_ppm").as("max_s_ppm"))
      .select(col("cell"), col("n_vecs"),
        expr("sum_s div n_vecs").as("mean_s_ppm"),
        col("min_s_ppm"), col("max_s_ppm"))
  }

  /** 1-bit (sign) binary quantization codes: dims=64 floats pack into
    * TWO 32-bit halves (lo = dims 1–32, hi = 33–64) — 64-bit codes
    * would put dim 64 on bit 63, where `1 << 63` overflows signed
    * BIGINT and DuckDB's checked arithmetic errors; two halves keep
    * every shift ≤ 31 on both engines. 256× smaller than float32
    * vectors; Hamming distance = popcount(xor) per half — the
    * binary-quantization storage tier below int8/PQ.
    */
  private def signBitCodes(embeddings: DataFrame): DataFrame = {
    // r11 ADVICE: element_at past the array end yields NULL, which the
    // IF silently maps to a 0 bit — a shorter vector got WRONG codes
    // and dims beyond 64 were silently ignored. Enforce the suite's
    // dims=64 convention per row with raise_error (codegen'd branch,
    // no extra action) so a mis-shaped corpus fails loudly.
    def half(offset: String) =
      "IF(size(e) = 64, aggregate(transform(sequence(1, 32), i -> " +
        s"IF(element_at(e, i$offset) > CAST(0 AS DOUBLE), " +
        "shiftleft(CAST(1 AS BIGINT), i - 1), CAST(0 AS BIGINT))), " +
        "CAST(0 AS BIGINT), (a, x) -> a + x), " +
        "raise_error('signBitCodes requires dims=64 embeddings'))"
    embeddings
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      .select(col("vec_id"),
        expr(half("")).as("lo"),
        expr(half(" + 32")).as("hi"))
  }

  /** Hamming top-k over the sign-bit codes: the query side broadcasts
    * (bounded query set), candidates stay map-local, the per-query
    * rank is a WindowGroupLimit — the brute cosine entry's plan shape
    * at 1/256th the bytes per comparison. Codes are map-only column
    * algebra (codegen'd aggregate/shift — no UDF).
    */
  def hammingTopK(queries: DataFrame, corpus: DataFrame,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = signBitCodes(queries).select(col("vec_id").as("query_id"),
      col("lo").as("qlo"), col("hi").as("qhi"))
    val c = signBitCodes(corpus).select(col("vec_id").as("cand_id"),
      col("lo").as("clo"), col("hi").as("chi"))
    c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        expr("bit_count(qlo ^ clo) + bit_count(qhi ^ chi)").as("hamming"))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("hamming"), col("cand_id"))))
      .filter(col("rank") <= k)
  }

  /** Greedy k-center coreset selection (Gonzalez 1985; the coverage
    * objective behind core-set active learning, Sener & Savarese
    * 2018): start from the lowest vec_id and repeatedly add the vector
    * FARTHEST from the already-selected set (max over candidates of
    * min-d² to selected, ties to the lower vec_id) — a 2-approximation
    * of the k-center optimum, and the third leg of the selection
    * suite: MMR ranks relevance-diverse, protoPrune drops redundant,
    * k-center COVERS the embedding space with k exemplars.
    *
    * Determinism: distances are sequential IEEE folds over the exact
    * float-to-double casts (the kmeans contract), comparisons agree
    * cross-engine, ties break on vec_id; the reported d2 rounds to
    * 1e-6 at OUTPUT only.
    *
    * Scale shape: k−1 map-only scans of the ONE eagerly-checkpointed
    * (vec_id, e) projection (selected centers ride the task closure),
    * each reduced by a top-1 heap (TakeOrderedAndProject — no global
    * sort) to a single driver row; driver state is k·dims. At corpus
    * scale, selection runs after an IVF/sample preselection — the
    * standard coreset arrangement — so k scans price a pool, not
    * 100 TB.
    */
  def kCenterSelect(embeddings: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 1, s"k out of range: $k")
    val base = embeddings
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("e"))
      .localCheckpoint(true)
    val firstRows = base.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id"), col("e")).take(1)
    require(firstRows.nonEmpty, "k-center pool is empty")
    val first = firstRows(0)
    var selected = Vector((first.getLong(0), first.getSeq[Double](1).toArray))
    var out = Vector((1, first.getLong(0), 0.0))
    // r11 ADVICE: on a pool smaller than k (or one whose remainder is
    // exact duplicates of the selected set) the greedy max min-d² goes
    // to 0 and every further step would re-emit an already-selected
    // point — stop at the honest coreset size instead.
    var exhausted = false
    while (!exhausted && selected.length < k) {
      val centers = selected.map(_._2)
      val minD2 = udf { (e: Seq[Double]) =>
        var best = Double.MaxValue
        centers.foreach { c =>
          var d = 0.0
          var j = 0
          while (j < e.length) { val t = e(j) - c(j); d += t * t; j += 1 }
          if (d < best) best = d
        }
        best
      }
      val pick = base.select(col("vec_id"), col("e"),
          minD2(col("e")).as("d2"))
        .orderBy(col("d2").desc, col("vec_id")).limit(1).head()
      if (pick.getDouble(2) == 0.0) exhausted = true
      else {
        selected :+= ((pick.getLong(0), pick.getSeq[Double](1).toArray))
        out :+= ((selected.length, pick.getLong(0), pick.getDouble(2)))
      }
    }
    val spark = embeddings.sparkSession
    import spark.implicits._
    out.toDF("step", "vec_id", "d2")
      .select(col("step"), col("vec_id"),
        round(col("d2"), 6).as("d2_at_selection"))
  }

  /** Prototypicality pruning (Sorscher et al. 2022, "Beyond neural
    * scaling laws"): on an abundant corpus, the examples CLOSEST to
    * their cluster centroid — the most prototypical, most redundant
    * ones — are the right ones to drop; the hard tail carries the
    * information. Per vector: the [[kmeansAssign]] cell and µ-scaled
    * centroid distance, plus `pruned = 1` for the fraction
    * pruneNum/pruneDen of each cell that sits STRICTLY below the
    * cell's distance cutoff (ties AT the cutoff are kept, so at most
    * the target fraction prunes — deterministic, no rank lottery).
    *
    * Scale shape: the cutoff comes from a (cell, d2_u) VALUE-GRID
    * histogram (map-combined count) + a per-cell cumulative window
    * over that grid — state is distinct distance values per cell,
    * never the corpus (the la_quantiles contract). A per-vector rank
    * window would sort the whole corpus across k partitions — the
    * skew trap this form exists to avoid. The assignment is eagerly
    * checkpointed ONCE because both the histogram and the final join
    * consume it (the [[dbscan]] lesson: without the barrier the
    * assignment UDF re-evaluates per consumer).
    */
  def protoPrune(embeddings: DataFrame, k: Int = 8, iters: Int = 2,
      pruneNum: Long = 3, pruneDen: Long = 10): DataFrame = {
    require(pruneNum >= 0 && pruneDen > 0 && pruneNum <= pruneDen,
      s"prune fraction out of range: $pruneNum/$pruneDen")
    val a = kmeansAssign(embeddings, k, iters)
      .withColumn("d2_u", expr("cast(round(d2 * 1000000) as bigint)"))
      .select("vec_id", "cell", "d2_u")
      .localCheckpoint(true)
    val byCell = Window.partitionBy("cell")
    val cut = a.groupBy("cell", "d2_u").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(byCell.orderBy("d2_u")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum("c").over(byCell))
      .filter(col("cum") * lit(pruneDen) >= col("n") * lit(pruneNum))
      .groupBy("cell").agg(min("d2_u").as("cutoff"))
    a.join(broadcast(cut), "cell")
      .select(col("vec_id"), col("cell"), col("d2_u"),
        (col("d2_u") < col("cutoff")).cast("int").as("pruned"))
  }

  /** Symmetric int8 quantization per vector (q = floor(x·127/amax),
    * exact ±127 at the extremes) — the 4x storage compression applied
    * to an ANN corpus before PQ-level budgets are needed. Map-only
    * column algebra; floor of the identical IEEE quotient is
    * engine-stable, and the zero vector degrades to all-zero codes
    * instead of a division by zero.
    */
  def int8Quantize(embeddings: DataFrame): DataFrame = {
    val e = col("embedding").cast("array<double>")
    val amax = array_max(transform(e, x => abs(x)))
    val codes = when(amax === 0.0,
        transform(e, _ => lit(0)))
      .otherwise(transform(e,
        x => floor(x * lit(127.0) / amax).cast("int")))
    embeddings.select(col("vec_id"),
      round(amax, 6).as("amax"),
      array_join(codes.cast("array<string>"), ",").as("q_codes"))
  }

  /** Top principal component of the embedding corpus by EXACT INTEGER
    * power iteration — the dominant-variance direction behind
    * whitening, drift monitoring, and "is one axis eating the
    * embedding space" anisotropy audits (Ethayarajh 2019).
    *
    * Everything is deterministic integer arithmetic so a SQL oracle
    * replays it bit for bit: elements land on the ×10⁴ grid; the
    * centered covariance numerator S_ij = n·Σqᵢqⱼ − ΣqᵢΣqⱼ is exact
    * DECIMAL(38,0); S rescales to ±10⁶ by truncating division (sign
    * split so Spark's `div` and DuckDB's floor `//` agree on
    * negatives); each iteration is one d²-row matrix-vector join with
    * BIGINT sums and a max-norm rescale (the HITS contract, extended
    * to signed values).
    *
    * Scale shape: the ONLY corpus-sized pass is the upper-triangle
    * pair generation — map-local flatten over each row's array with
    * map-side combine into the d(d+1)/2-key aggregate (never a
    * corpus self-join); the covariance table is eagerly checkpointed
    * (d² rows) so the 3 iterations replay a 4096-row lineage, not the
    * corpus.
    */
  def pcaTop1(embeddings: DataFrame, iters: Int = 3,
      dims: Int = 64): DataFrame =
    pcaParts(embeddings, iters, dims)._2
      .select(col("j").cast("long").as("dim"), col("v").as("v_u"))

  /** Variance-explained share of the top principal component — the
    * anisotropy audit: lambda1_est = vᵀSv div |v|² (Rayleigh numerator
    * per unit v, exact two-step floor so every product stays inside
    * DECIMAL(38,0)), share_ppm = lambda1_est·10⁶ div tr(S). Joins the
    * checkpointed 64×64 covariance with the 64-row eigenvector —
    * nothing corpus-sized beyond [[pcaTop1]]'s single pass.
    */
  def anisotropy(embeddings: DataFrame, iters: Int = 3,
      dims: Int = 64): DataFrame = {
    val dec = "decimal(38,0)"
    val (raw, v) = pcaParts(embeddings, iters, dims)
    val vsv = raw
      .join(v.select(col("j").as("i"), col("v").as("va")), "i")
      .join(v.select(col("j"), col("v").as("vb")), "j")
      .agg(sum(col("va").cast(dec) * col("s") * col("vb")).as("num"))
    val nrm = v.agg(sum(col("v").cast(dec) * col("v")).as("n2"))
    val tr = raw.filter(col("i") === col("j")).agg(sum("s").as("trace"))
    vsv.crossJoin(nrm).crossJoin(tr)
      .select(
        when(col("num") < 0, -expr("abs(num) div n2"))
          .otherwise(expr("num div n2")).as("lam"),
        col("trace"))
      .select(col("lam").as("lambda1_est"),
        col("trace").cast("long").as("trace_s"),
        when(col("lam") < 0,
          -expr(s"abs(CAST(lam AS $dec) * 1000000) div trace"))
          .otherwise(expr(s"CAST(lam AS $dec) * 1000000 div trace"))
          .as("share_ppm"))
  }

  /** The shared internals of [[pcaTop1]]/[[anisotropy]]: the exact
    * centered covariance numerator table S (i, j, s: DECIMAL(38,0))
    * and the iterated max-norm eigenvector (j, v). The covariance is
    * eagerly checkpointed so every consumer replays 64×64 rows, not
    * the corpus.
    */
  private def pcaParts(embeddings: DataFrame, iters: Int,
      dims: Int): (DataFrame, DataFrame) = {
    require(iters >= 1 && iters <= 10, s"iters out of range: $iters")
    val dec = "decimal(38,0)"
    val spark = embeddings.sparkSession
    val pairs = embeddings.select(explode(expr(
      """flatten(transform(sequence(1, size(embedding)), i ->
        |  transform(sequence(CAST(i AS INT), size(embedding)), j ->
        |    named_struct('i', i, 'j', j,
        |      'p', CAST(floor(CAST(element_at(embedding, i) AS DOUBLE)
        |                      * 10000 + 0.5) AS BIGINT)
        |         * CAST(floor(CAST(element_at(embedding, j) AS DOUBLE)
        |                      * 10000 + 0.5) AS BIGINT)))))""".stripMargin))
      .as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"), col("e.p").as("p"))
    val upper = pairs.groupBy("i", "j").agg(sum("p").as("sqq"))
    val fullM = upper.union(upper.filter(col("i") =!= col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("sqq")))
    val sums = embeddings
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .select((col("pos") + 1).as("j"),
        expr("CAST(floor(CAST(v AS DOUBLE) * 10000 + 0.5) AS BIGINT)")
          .as("q"))
      .groupBy("j").agg(sum("q").as("sq"))
    val n = embeddings.agg(count(lit(1)).as("n"))
    val raw = fullM
      .join(sums.select(col("j").as("i"), col("sq").as("sqi")), "i")
      .join(sums.select(col("j"), col("sq").as("sqj")), "j")
      .crossJoin(broadcast(n))
      .select(col("i"), col("j"),
        (col("n").cast(dec) * col("sqq").cast(dec) -
          col("sqi").cast(dec) * col("sqj").cast(dec)).as("s"))
      // the corpus pass ends HERE: every consumer (rescale, the
      // iterations, anisotropy's quadratic form and trace) replays
      // these d² stored rows
      .localCheckpoint(true)
    val mx = raw.agg(max(abs(col("s"))).as("m"))
    // sign-split truncating division: div floors toward zero on the
    // POSITIVE magnitude in both engines (DuckDB replays via // on
    // the absolute value), so negative entries cannot diverge between
    // Spark's truncate-div and a floor-div oracle
    val cv = raw.crossJoin(broadcast(mx))
      .select(col("i"), col("j"),
        when(col("s") < 0, -expr("abs(s * 1000000) div m"))
          .otherwise(expr("abs(s * 1000000) div m")).as("c"))
    var v = spark.range(1, dims + 1)
      .select(col("id").as("j"), lit(1000000L).as("v"))
    for (_ <- 1 to iters) {
      val w = cv.join(v, "j")
        .groupBy(col("i")).agg(sum(col("c") * col("v")).as("w"))
      val mw = w.agg(max(abs(col("w"))).as("mw"))
      v = w.crossJoin(broadcast(mw))
        .select(col("i").as("j"),
          when(col("w") < 0,
            -expr(s"abs(CAST(w AS $dec) * 1000000) div mw"))
            .otherwise(expr(s"abs(CAST(w AS $dec) * 1000000) div mw"))
            .as("v"))
    }
    (raw, v)
  }
}
