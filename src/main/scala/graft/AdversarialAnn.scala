package graft

import graft.sim.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-scale ANN evidence run (r13 verdict #6 — completes the
  * adversarial trilogy next to [[AdversarialDedup]] and
  * [[AdversarialGraph]]): the IVF family's cost model assumes cell
  * occupancy tracks n/nlist, so Σ|cell|² ≈ n²/nlist ≈ n^1.5 at
  * nlist ≈ √n. CLUSTERED embeddings are the adversary: a corpus where
  * one region holds 30%+ of all vectors (the "everyone embedded the
  * same press release" / mode-collapse pathology) concentrates the
  * cell-keyed joins behind `sim_ivf_topk` and `sim_dbscan` into one
  * inverted list, and the within-cell candidate volume degenerates
  * toward (0.3·n)².
  *
  * What decides the outcome is WHERE the quantizer's centers come
  * from:
  *
  *   - STALE (the trap): centers drawn from the corpus BEFORE the
  *     clump arrived — the production hazard of an index layout fit
  *     on last month's distribution. The whole clump lands on its one
  *     nearest old center; max cell ≈ clump size.
  *   - REFIT (the defense): [[Similarity.hashSampledQuantizer]] draws
  *     centers from the CURRENT corpus by md5 rank, so the clump gets
  *     ≈ 30% of the centers and splits across them; max cell stays
  *     near n/nlist however hot the mode is. This is why the repo's
  *     default quantizer is data-sampled and corpus-sized (√n), not
  *     pinned.
  *
  * Both arms run the PRODUCTION code paths (ivfTopK k=5/nprobe=4 and
  * dbscan τ=0.3/minPts=2/p=4 — the curve-picked sim_dbscan operating
  * point) on the SAME frozen clumped corpus, with the structural
  * stats (max cell, Σ|cell|²) and a recall audit (IVF top-5 overlap
  * vs guarded brute force on the original query subset) so the
  * defense is priced in recall as well as seconds. Ground truth: the
  * planted clump must come back as ONE dense DBSCAN cluster in the
  * defense arm — the answer the trap arm pays quadratically for.
  *
  * Run once per revisit (not in the bench sweep — the stale arm is a
  * deliberate trap):
  *
  *   sbt "runMain graft.AdversarialAnn"   # sf0.1 embeddings (2k)
  *
  * SIZE IS DELIBERATE (measured the hard way): a first cut ran this
  * at the 10× corpus (20k vectors, clump 8,571) and the stale arm's
  * hot cell did exactly what the 100 TB argument says it does — the
  * cell-keyed join sent the ENTIRE clump product to ONE reducer task
  * (73M rows × ~1 KB of carried embedding arrays ≈ 73 GB through a
  * single partition; observed 44 GB of shuffle spill, one core busy,
  * wedged for 45+ minutes before being killed). On a cluster that is
  * a dead executor, not a slow row. So, like AdversarialDedup, the
  * committed evidence runs at a size where the trap COMPLETES and the
  * COUNTS (max cell, Σ|cell|²) make the scale argument — the k²
  * blow-up is structural, and its single-reducer delivery is now a
  * first-hand observation recorded here rather than a claim. Results
  * are committed in SCALE.md + target/adversarial_ann.json.
  */
object AdversarialAnn {

  /** r15 (r14 verdict #3): `capped-only` mode — run ONLY the stale
    * arm WITH the per-cell occupancy cap, at whatever corpus the dir
    * provides. This is the replay of the r14 first-hand kill (20k
    * vectors, 73 GB through one reducer, dead at 45 min) with the
    * structural bound in place:
    *
    *   sbt "runMain graft.AdversarialAnn /root/repo/target/sf1 capped-only"
    *
    * Done-criterion evidence: the previously-killed shape COMPLETES,
    * per-key join input is measured ≤ cap (hash-split slack), and the
    * capped results are bit-identical to the unsharded semantics (the
    * grid shard is a partitioning of the same pair space). JSON lands
    * in target/adversarial_ann_cap.json (sf0.1 default run) /
    * target/adversarial_ann_cap20x.json (capped-only at 10×).
    */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cappedOnly = args.lift(1).contains("capped-only")
    val spark = graft.io.Tables.configure(SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.io.Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding", "label")
    val n = emb.count()
    // clump/(n + clump) = 30% → clump = 3n/7; vectors are the base
    // vector plus ±5e-4 deterministic per-dim jitter (distinct but
    // tightly clustered — cosine ≈ 1 inside the clump)
    val clumpN = (3L * n) / 7L
    val base = emb.orderBy("vec_id").select(
        transform(col("embedding"), _.cast("double")).as("e"))
      .head().getSeq[Double](0)
    val baseArr = array(base.map(lit): _*)
    val clump = spark.range(clumpN).select(
      (col("id") + 10000000L).as("vec_id"),
      transform(sequence(lit(0), lit(base.length - 1)),
        j => (element_at(baseArr, j + 1) +
          (pmod(xxhash64(col("id"), j), lit(1000)) - 500)
            .cast("double") / lit(1e6)).cast("float")).as("embedding"),
      lit(0).as("label"))
    val adv = emb.unionByName(clump).localCheckpoint(true)
    val total = n + clumpN
    val nlist = math.ceil(math.sqrt(total.toDouble)).toInt

    // STALE = centers from the pre-clump corpus (same md5-rank rule,
    // yesterday's data); REFIT = centers from the corpus as it is now
    val stale = Similarity.hashSampledQuantizer(emb, nlist)
    val refit = Similarity.hashSampledQuantizer(adv, nlist)

    val protectedIds = spark.sparkContext.getPersistentRDDs.keySet
    def timed(label: String)(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val c = f
      val dt = (System.nanoTime() - t0) / 1e9
      // blocking between arms — the AdversarialGraph/Dedup hygiene
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => protectedIds.contains(id) }
        .values.foreach(_.unpersist(blocking = true))
      System.err.println(f"[advann] $label: $c rows in $dt%.2f s")
      (c, dt)
    }

    // structural profile per quantizer: single-assign occupancy — the
    // quantity the cell-keyed joins square
    def cellStats(q: Similarity.IvfQuantizer): (Long, Long) = {
      val occ = q.assign(adv).groupBy("cell").agg(count(lit(1)).as("k"))
        .agg(max("k").as("mx"), sum(col("k") * col("k")).as("ss")).head()
      (occ.getLong(0), occ.getLong(1))
    }
    val (staleMax, staleSS) = cellStats(stale)

    // r15 (r14 verdict #3): the per-cell occupancy cap, exercised on
    // the SAME trap. Cap chosen to BIND on the stale layout — 4× the
    // balanced occupancy, so a refit layout (max cell ≈ n/nlist·small
    // skew) never shards while the stale hot cell must. The measured
    // per-key bound below reruns the join's own shard rule (xxhash64
    // mod nsh) over the real corpus occupancy and takes the max
    // (cell, shard) key — the quantity one reducer task actually
    // builds its side of the join from.
    val capVal = math.max(64L, 4L * total / nlist).toInt
    val staleAssigned = stale.assign(adv)
    val overCap = Similarity.oversizedCells(staleAssigned, capVal)
    val nshMax = if (overCap.isEmpty) 0 else overCap.values.max
    val nshUdf = udf { (c: Int) => overCap.getOrElse(c, 1) }
    val maxKeyRows = staleAssigned
      .withColumn("nsh", nshUdf(col("cell")))
      .withColumn("sb", pmod(xxhash64(col("vec_id")), col("nsh")))
      .groupBy("cell", "sb").agg(count(lit(1)).as("rows"))
      .agg(max("rows")).head().getLong(0)
    assert(overCap.nonEmpty,
      s"cap $capVal did not bind on the stale layout (max cell $staleMax)")
    assert(maxKeyRows <= (capVal * 13L) / 10L,
      s"sharded key exceeded cap+30% hash slack: $maxKeyRows > $capVal")

    if (cappedOnly) {
      // the r14 first-hand kill, replayed WITH the bound: stale arm
      // only, cap binding, at whatever corpus size the dir provides
      // (target/sf1 embeddings = the 20k shape that died at 45 min).
      val (_, tIvfCap) = timed("ivfTopK stale+cap") {
        Similarity.ivfTopK(stale, adv, k = 5, nprobe = 4,
          cellCap = capVal).count()
      }
      def capJson(dbPart: String): String =
        s"""{"corpus":$total,"clump":$clumpN,"nlist":$nlist,""" +
          s""""cap":$capVal,"stale_max_cell":$staleMax,""" +
          s""""nsh_max":$nshMax,"max_key_rows":$maxKeyRows,""" +
          s""""ivf_capped_sec":$tIvfCap$dbPart,"sf":"$sfDir"}"""
      val out = java.nio.file.Paths.get("target/adversarial_ann_cap20x.json")
      // durable after the ivf leg — a wall-clock kill mid-dbscan keeps it
      try java.nio.file.Files.write(out, capJson("").getBytes("UTF-8"))
      catch { case _: Throwable => () }
      // dbscan's timed action IS the clump-recovery aggregate (one
      // pass — a second full pass at this size is the old 45-min bill)
      var clumpNC = 0L
      var clumpMX = 0L
      val (_, tDbCap) = timed("dbscan stale+cap (clump recovery agg)") {
        val row = Similarity.dbscan(stale, adv, minCosine = 0.3,
            minPts = 2, probes = 4, cellCap = capVal)
          .filter(col("vec_id") >= 10000000L && col("cluster") =!= -1L)
          .groupBy("cluster").agg(count(lit(1)).as("k"))
          .agg(count(lit(1)).as("nc"),
            coalesce(max("k"), lit(0L)).as("mx")).head()
        clumpNC = row.getLong(0); clumpMX = row.getLong(1)
        clumpMX
      }
      // the stale layout holds the clump in ONE cell, so the capped
      // eps-graph still sees the whole clique — recovery must be total
      assert(clumpMX * 10 >= clumpN * 9,
        s"clump not recovered under cap: largest $clumpMX of $clumpN")
      val json = capJson(
        s""","dbscan_capped_sec":$tDbCap,"clump_clusters":$clumpNC,""" +
          s""""clump_largest":$clumpMX""")
      println(json)
      try java.nio.file.Files.write(out, json.getBytes("UTF-8"))
      catch { case _: Throwable => () }
      spark.stop()
      return
    }

    val (refitMax, refitSS) = cellStats(refit)

    val (_, tIvfStale) = timed("ivfTopK stale quantizer") {
      Similarity.ivfTopK(stale, adv, k = 5, nprobe = 4).count()
    }
    val (_, tIvfRefit) = timed("ivfTopK refit quantizer") {
      Similarity.ivfTopK(refit, adv, k = 5, nprobe = 4).count()
    }

    // recall audit on the ORIGINAL query subset (the clump's own
    // neighbors are trivially intra-clump): IVF top-5 overlap vs the
    // guarded exact brute force, as sim_ivf_recall measures it
    def recallPpm(q: Similarity.IvfQuantizer): Long = {
      val ivf = Similarity.ivfTopK(q, adv, k = 5, nprobe = 4)
        .filter(col("query_id") < 20)
        .select(col("query_id"), col("cand_id"), lit(1).as("hit"))
      val brute = Similarity.bruteForceTopK(
          adv.filter(col("vec_id") < 20), adv, k = 5)
        .select("query_id", "cand_id")
      val row = brute.join(ivf, Seq("query_id", "cand_id"), "left")
        .agg(sum(coalesce(col("hit"), lit(0))).as("h"),
          count(lit(1)).as("n")).head()
      // a corpus whose vec_id space doesn't start at 0 yields an empty
      // query subset — report the degenerate -1 instead of dividing
      // by zero after the expensive arms already ran
      val r =
        if (row.isNullAt(1) || row.getLong(1) == 0L) -1L
        else row.getLong(0) * 1000000L / row.getLong(1)
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => protectedIds.contains(id) }
        .values.foreach(_.unpersist(blocking = true))
      r
    }
    val staleRecall = recallPpm(stale)
    val refitRecall = recallPpm(refit)

    // DBSCAN at the curve-picked default (τ=0.3, minPts=2, p=4): the
    // defense arm must RECOVER the planted clump as one dense cluster;
    // the trap arm pays the (0.3n)² eps-graph for the same answer
    val (_, tDbStale) = timed("dbscan stale quantizer") {
      Similarity.dbscan(stale, adv, minCosine = 0.3, minPts = 2,
        probes = 4).count()
    }
    // IDENTICAL work in both timed arms (a first cut folded the
    // clump-recovery audit aggregation into the refit arm, inflating
    // the defense's dbscan_sec against the trap's); the audit then
    // runs UNTIMED on a fresh call — dbscan is deterministic, and
    // timed()'s between-arm unpersist would have dropped any
    // checkpoint blocks carried out of the block anyway
    val (_, tDbRefit) = timed("dbscan refit quantizer") {
      Similarity.dbscan(refit, adv, minCosine = 0.3, minPts = 2,
        probes = 4).count()
    }
    val byCluster = Similarity.dbscan(refit, adv, minCosine = 0.3,
        minPts = 2, probes = 4)
      .filter(col("vec_id") >= 10000000L && col("cluster") =!= -1L)
      .groupBy("cluster").agg(count(lit(1)).as("k"))
      .agg(count(lit(1)).as("nc"), max("k").as("mx")).head()
    val clumpClusters = byCluster.getLong(0)
    val clumpLargest = byCluster.getLong(1)

    // the structural envelope the defense must hold: data-sampled
    // centers split the mode, so max occupancy stays near n/nlist
    // (generous 20× slack for sampling variance) while the stale
    // layout provably concentrates it (≥80% of the clump in one cell)
    assert(staleMax >= (clumpN * 8) / 10,
      s"trap did not land: stale max cell $staleMax < 0.8×clump $clumpN")
    assert(refitMax <= 20L * total / nlist,
      s"defense violated its occupancy bound: $refitMax > ${20L * total / nlist}")
    assert(refitSS * 4 <= staleSS,
      s"refit Σ|cell|² $refitSS not ≤ ¼ of stale $staleSS")
    // the defense must actually FIND the clump: one dominant cluster
    // covering ≥90% of planted members
    assert(clumpLargest * 10 >= clumpN * 9,
      s"clump not recovered: largest cluster $clumpLargest of $clumpN")

    // r15 (r14 verdict #3): the capped stale arms, timed next to the
    // uncapped trap arms above, plus BIT-IDENTITY of results — the
    // grid shard partitions the same pair space, so capped output must
    // equal unsharded output exactly (both directions of exceptAll).
    val (_, tIvfCapArm) = timed("ivfTopK stale+cap") {
      Similarity.ivfTopK(stale, adv, k = 5, nprobe = 4,
        cellCap = capVal).count()
    }
    val ivfCapDiff = {
      val capped = Similarity.ivfTopK(stale, adv, k = 5, nprobe = 4,
        cellCap = capVal)
      val un = Similarity.ivfTopK(stale, adv, k = 5, nprobe = 4,
        cellCap = Int.MaxValue)
      val d = capped.exceptAll(un).count() + un.exceptAll(capped).count()
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => protectedIds.contains(id) }
        .values.foreach(_.unpersist(blocking = true))
      d
    }
    val (_, tDbCapArm) = timed("dbscan stale+cap") {
      Similarity.dbscan(stale, adv, minCosine = 0.3, minPts = 2,
        probes = 4, cellCap = capVal).count()
    }
    val dbCapDiff = {
      val capped = Similarity.dbscan(stale, adv, minCosine = 0.3,
        minPts = 2, probes = 4, cellCap = capVal)
      val un = Similarity.dbscan(stale, adv, minCosine = 0.3,
        minPts = 2, probes = 4, cellCap = Int.MaxValue)
      val d = capped.exceptAll(un).count() + un.exceptAll(capped).count()
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => protectedIds.contains(id) }
        .values.foreach(_.unpersist(blocking = true))
      d
    }
    assert(ivfCapDiff == 0,
      s"capped ivfTopK diverged from unsharded semantics: $ivfCapDiff rows")
    assert(dbCapDiff == 0,
      s"capped dbscan diverged from unsharded semantics: $dbCapDiff rows")

    val json = s"""{"corpus":$total,"clump":$clumpN,"nlist":$nlist,""" +
      s""""stale":{"max_cell":$staleMax,"sum_sq_cells":$staleSS,"ivf_sec":$tIvfStale,"dbscan_sec":$tDbStale,"recall_ppm":$staleRecall},""" +
      s""""refit":{"max_cell":$refitMax,"sum_sq_cells":$refitSS,"ivf_sec":$tIvfRefit,"dbscan_sec":$tDbRefit,"recall_ppm":$refitRecall,"clump_clusters":$clumpClusters,"clump_largest":$clumpLargest},""" +
      s""""cap":{"cap":$capVal,"nsh_max":$nshMax,"max_key_rows":$maxKeyRows,"ivf_capped_sec":$tIvfCapArm,"dbscan_capped_sec":$tDbCapArm,"identity_diff_rows":${ivfCapDiff + dbCapDiff}},""" +
      s""""sf":"$sfDir"}"""
    println(json)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("target/adversarial_ann.json"),
      json.getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
