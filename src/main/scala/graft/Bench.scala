package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: materializes the headline queries through the
  * noop sink (full plan execution, no collect/pruning shortcut) and
  * prints one JSON metrics line.
  */
object Bench {

  /** Representative spread: scan-heavy agg, multi-join, window, kernel,
    * dedup, similarity — the operators whose scale behavior matters.
    */
  val headline: Seq[String] = Seq(
    "q1_agg", "q3_shipping_priority", "q5_local_supplier",
    "j_broadcast", "a1_monthly_composite", "a3_distinct_count",
    "w2_row_number", "agg_cube", "k1_polytrend", "k3_dbest_change",
    "t_quality", "dd_exact", "dd_minhash_lsh", "dd_ngram_jaccard",
    "sim_cosine_topk", "mm_media_meta", "la_sessionize", "asof_join",
    "asof_join_native", "k1_polytrend_moments", "rng_point_in_interval",
    "skew_join_naive", "skew_join_salted",
    // round 6 additions — keep r2-r5 comparisons to the 23 names above
    "t_topk_ngrams", "dd_semdedup", "sim_ivfpq_topk",
    "t_bm25_topk", "t_bm25_indexed", "t_inverted_index", "t_temp_mix",
    "t_heavy_hitters", "dd_span_dedup", "dd_span_clean", "t_countmin",
    "search_pipeline", "hybrid_search", "ts_gapfill_locf",
    // round 7 additions
    "t_token_ids", "t_tfidf_topk", "t_url_canon", "dd_incremental",
    "ingest_pipeline", "sim_ivf_recall", "sim_kmeans", "t_budget_select",
    "dd_keeper_quality", "dd_intradoc_clean",
    "g_triangles", "g_pagerank",
    "la_scd2", "dd_novelty", "ts_ewma", "j_fuzzy_leven",
    "rng_spatial_join", "dq_constraints", "g_lift", "t_qnorm",
    "la_attribution", "j_fuzzy_native",
    // round 8 additions
    "t_vocab_growth", "t_mix_epochs", "dd_ngram_containment",
    "la_rfm", "sim_pair_margin", "t_split_leakage", "dd_impact_report",
    // round 9 additions: the capped containment twin times the
    // doc-frequency knob against its uncapped sibling (the
    // skew_join_naive/salted pattern); la_rfm_approx times the bounded
    // GK-cuts scale path against the exact-percentile twin;
    // pipeline_polytrend times the reference's end-to-end user journey
    // (scan→filter→composite→kernel→stats) as one plan
    "dd_ngram_containment_capped", "la_rfm_approx", "pipeline_polytrend",
    // incremental near-dup ingest (the steady-state LSH mode), the
    // shared-index composite (one assignment pass for retrieval +
    // mining), and content-defined chunking
    "dd_incremental_neardup", "sim_index_pipeline", "t_cdc_chunks",
    // DSIR importance weights (two corpus token passes + broadcast
    // feature table), the one-pass normal-equation OLS fit, and
    // winnowing fingerprint selection (doc-keyed window join, w=4)
    "t_dsir_weights", "t_quality_ols", "t_winnow", "dd_winnow_pairs",
    // Poisson-bootstrap CI: the 100x replica explode with immediate
    // map-side combine — the method's cost shape, timed honestly
    "la_bootstrap_ci",
    // curation-eval sweep: rule-flag gate + n-gram diversity (both one
    // map-combined pass over the token arrays), the bounded-grid AUC
    // and Spearman rank stats, nDCG over the BM25 ranking (two corpus
    // passes + top-k heaps), and the iterative graph additions (BFS
    // frontier expansion; 2-round label propagation)
    "t_gopher_rules", "t_ngram_diversity", "t_quality_auc",
    "la_spearman", "t_ndcg", "g_khop", "g_lpa", "ts_mase",
    // r9 second sweep: the structural-graph additions (triangle-corner
    // enumeration, capped peeling, LPA + membership join, two degree
    // joins), both honest-recall audits (each runs its approximate and
    // its exact side), the global-grid rank stats, and the O(days²)
    // pairwise-slope self-join
    "g_local_clustering", "g_kcore", "g_modularity", "g_assortativity",
    "dd_minhash_recall", "sim_trunc_recall", "la_kruskal_dunn",
    "ts_theil_sen",
    // frame-fingerprint posting join, the AllPairs sweep at its
    // cost-setting lowest threshold, and the structural-break test
    "mm_frame_overlap", "dd_threshold_curve", "ts_chow_test",
    "dd_threshold_curve_capped",
    // the O(n*m) DTW fold, the four-arm probe-budget audit, and the
    // experimentation guards (one map-combined aggregate each)
    "ts_dtw_pairs", "sim_ivf_probe_curve", "la_bh_fdr", "la_cuped",
    // r10 additions: the structural suite on ONE shared edge view
    // (amortization twin of the four standalone entries), the DBEST
    // end-to-end journey (scan → composite → K3 kernel → per-change
    // decode → stats as one plan, the pipeline_polytrend pattern for
    // the second reference journey), and the Sakoe-Chiba banded DTW
    // (n·w² work vs the full twin's n·m·(m+1) — the
    // capped-vs-uncapped containment pattern for series alignment)
    "g_suite_on_view", "pipeline_dbest", "ts_dtw_pairs_banded",
    // DBSCAN rides the semdedup cell machinery + the CC rounds.
    // r11: the default moved to the curve-picked p=4 (r10 verdict #2)
    // AND the √n-cell quantizer — sim_dbscan timings are NOT
    // comparable to r10's p=1/pinned-16 rows; the p=1 twin keeps the
    // old probe point as the cost baseline, and sim_dbscan_pinned16
    // keeps the pinned quantizer as the quadratic-trap evidence row
    // (nlist=16 at p=4 is Σ|cell|² ≈ n² by construction; √n cells
    // keep it ≈ p²·n^1.5)
    "sim_dbscan", "sim_dbscan_p1", "sim_dbscan_pinned16",
    // r11 additions: MMR over the IVF-fed pool (the at-scale path,
    // r10 verdict #3), the suite now containing triangles +
    // local clustering (verdict #4) timed via g_suite_on_view, the
    // probe curve re-measured at the default √n quantizer (Guards-
    // gated exact side, audit-sized like dd_minhash_recall), and the
    // cross-source contamination matrix (distinct + a fan-out-bounded
    // gram self-join)
    "sim_mmr_topk", "sim_mmr_ivf", "sim_embed_drift",
    "sim_dbscan_scaled_curve", "dd_source_overlap",
    // privacy/crawl additions: the k-anonymity audit (two
    // map-combined aggregations, QI-domain-bounded second pass) and
    // URL-level dedup (one shuffle on the canonical URL + an
    // AQE-sized class→member join back)
    "dq_k_anon", "dd_url_dedup",
    // mixture planning + FIM prep: one corpus token pass + model-sized
    // water-filling; one map-only splitmix/slice/md5 projection;
    // fertility = one map-combined per-lang aggregate; seqlen curve =
    // broadcast ×5 of one LONG column + map-combined agg; reweight =
    // one token-keyed exchange then vocab×domains model math
    "t_unimax_mix", "t_fim_split", "t_fertility", "t_seqlen_curve",
    "t_domain_reweight",
    // LSH parameter planner: the threshold-curve pair stage at
    // minJaccard=0.3 (prefix join cost floor), then <=100 hist rows
    // x 6 configs of fixed-point S-curve math; + the capped twin
    // (the production df knob — see the sf1 block note)
    "dd_lsh_plan", "dd_lsh_plan_capped",
    // prototypicality pruning: the kmeans assignment checkpointed
    // once, cutoffs from a (cell, d2) value-grid cum window
    "sim_proto_prune",
    // memorization-gap audit: the two parent LM passes + a doc join;
    // k-center coreset: k-1 top-1-heap scans of one checkpointed
    // projection
    "t_lm_memgap", "sim_kcenter",
    // robust outlier audit: one corpus grid aggregate, grid windows
    "la_mad_outliers",
    // binary-quantization tier: map-only bit packing + popcount(xor)
    // top-k, and its honest recall audit vs exact cosine
    "sim_binary_topk", "sim_binary_recall",
    // CCNet terciles: the heldout-LM parent pass + grid cutoffs;
    // Benford audit: one (type, digit) map-combined count
    "t_ccnet_buckets", "dq_benford",
    // PQ distortion audit: map-only scoring + one m-row aggregate
    "sim_pq_distortion",
    // r12: two streaming twins (r11 verdict #7 — the st_ family had
    // never appeared in a bench artifact, so AvailableNow micro-batch
    // overhead was unmeasured; read each next to its batch twin:
    // dd_incremental / sim_embed_drift)
    "st_incremental_dedup", "st_embed_drift",
    // r13 (r12 verdict #7 — rotate 2-3 never-benched st_ twins per
    // round): two STATEFUL-heavier twins to test the constant-~1s
    // AvailableNow-overhead hypothesis beyond r12's pair — read
    // st_session_window against la_sessionize and st_psi_drift against
    // the day-grid PSI shape
    "st_session_window", "st_psi_drift",
    // r12: the hash-sampled recall audit (r11 verdict #4 — the first
    // measured-recall entry with an executable path at ANY scale: the
    // exact side runs on a deterministic md5-threshold sample, frac
    // 1/4, so its pair volume is (n/4)² instead of n²) and the
    // k-center coreset over the same sampled pool (r11 verdict #5 —
    // the preselection arrangement the kCenterSelect docstring
    // promises, exercised)
    "sim_dbscan_sampled_recall", "sim_kcenter_sampled",
    // the same md5-threshold lever applied to the dedup family's
    // audit: exact truth AND LSH candidates both on the 50% sample (duplicate families are sparser than cosine neighbors)
    "dd_minhash_recall_sampled",
    // byte-level payload triage: one codegen'd byte explode into a
    // map-combined (doc, byte) count + the <=256-row/doc rollup — the
    // dq_benford cost class
    "mm_byte_triage",
    // r13: the bounded-state twin (one TypedImperativeAggregate pass,
    // one row per payload through the plan instead of one per byte) —
    // read the PAIR as the explode-vs-aggregate price (r12 verdict
    // #4); and the magic-byte sniff (triage + a broadcast prefix join
    // + a doc-keyed join back — the byteTriage docstring's production
    // extension, realized; r12 verdict #5)
    "mm_byte_triage_agg", "mm_format_sniff",
    // late-r13: the streaming triage gate — only expressible via the
    // bounded aggregate (the explode form's chained aggregations
    // don't stream); read against mm_byte_triage_agg for the
    // AvailableNow overhead on a doc-keyed complete-mode aggregate
    "st_byte_triage",
    // r13 rotation cont'd (r12 verdict #7): three more never-benched
    // st_ twins chosen for STRUCTURALLY different state shapes —
    // st_incremental_neardup (MinHash band state, the heaviest
    // flatMapGroupsWithState twin; read against dd_incremental_neardup),
    // st_outer_join (stream-stream left outer join: watermark-bounded
    // JOIN state, a shape no prior bench row exercises), and
    // st_frequent_ngrams (high-cardinality complete-mode aggregate —
    // ngram-keyed state grows with vocabulary, read against the
    // dq_benford cost class)
    "st_incremental_neardup", "st_outer_join", "st_frequent_ngrams",
    // late-r13: the BOUNDED-state counterpoint — read st_frequent_ngrams
    // (vocabulary-sized complete-mode state) against st_countmin_sketch
    // (d×w = 1024 counter rows whatever the corpus size); the sketch is
    // the one you run on the 100 TB firehose, the exact gram count is
    // the one you run bounded-corpus
    "st_countmin_sketch",
    // late-r13: star-mode LSH (hot buckets emit hub edges instead of
    // vanishing — the viral-family recall fix); identical work to
    // dd_minhash_lsh on this corpus plus the hub aggregate, so read
    // the PAIR as the star arm's overhead in the benign regime
    "dd_minhash_lsh_star",
    // semantic cross-split contamination: one multi-probe assignment
    // pass + a cell-keyed train×eval join — the dd_semdedup cost class
    "sim_split_leakage",
    // r14 (r13 verdict #4): the bounded-VOCABULARY streaming top-k —
    // Misra-Gries as the entire stream state (20k counters whatever
    // the vocabulary) + a batch recount probe; read the TRIO
    // st_frequent_ngrams / st_countmin_sketch / st_heavy_hitters as
    // the executable frequency routing rule
    "st_heavy_hitters",
    // r15 rotation (the r12 verdict #7 convention, continued): three
    // never-benched st_ twins with structurally DISTINCT state —
    // st_click_attribution (the heaviest remaining twin: per-user
    // ordered event state for the attribution walk; isolated 7.4 s
    // r13), st_bloom_decontam (the bounded-state decontamination
    // gate: eval set reduced to a broadcast bit-position set, corpus
    // side map-only — the smallest possible stream state), and
    // st_k_anon (two chained aggregation levels, QI-domain-bounded
    // second pass). First rows are NEW, not movers; isolated
    // baselines already in the ledger from r13/r15
    "st_click_attribution", "st_bloom_decontam", "st_k_anon")

  /** sf1 stretch rows: (query name, gating input table). Object-level
    * (r12) so RegistrySpec can assert every bench name — headline and
    * sf1 — is a registered query: a typo here used to surface only as
    * a burned bench run recording a failed row.
    */
  val sf1Needs: Seq[(String, String)] = Seq(
    "dd_span_dedup" -> "documents", "dd_minhash_lsh" -> "documents",
    "sim_ivfpq_topk" -> "embeddings",
    "dd_ngram_containment_capped" -> "documents",
    "g_pagerank" -> "lineitem", "g_triangles" -> "lineitem",
    "g_lift" -> "lineitem",
    "pipeline_polytrend" -> "events", "k3_dbest_change" -> "events",
    "t_dsir_weights" -> "documents", "t_winnow" -> "documents",
    // r9 curation-eval additions with a plausible hidden constant:
    // g_lpa's per-round join fan-in and t_ndcg's dual corpus pass
    "g_lpa" -> "lineitem", "t_ndcg" -> "documents",
    // late-r13: the frontier-BFS rewrite's 10× point (isolated: warm
    // 7.55 s sf0.1 → 14.75 s sf1 — the copurchase build dominates and
    // the per-hop distinct is now frontier-sized, so 10× data ≈ 2×)
    "g_khop" -> "lineitem",
    // r9 second sweep: structural-graph ops (corner enumeration /
    // peel rounds / membership join) and the two posting-join
    // pipelines whose pair volume could hide a superlinear constant
    "g_local_clustering" -> "lineitem", "g_kcore" -> "lineitem",
    "g_modularity" -> "lineitem",
    // r11: the 5th standalone arm, so the suite-vs-standalone-sum
    // comparison covers all five ops at sf1 too
    "g_assortativity" -> "lineitem",
    // capped twin ONLY at sf1: the uncapped form measured 126 s at
    // 10x data (56x its sf0.1 cost — the quadratic the cap removes);
    // re-measure it manually when revisiting, not in every round
    "dd_threshold_curve_capped" -> "documents",
    "mm_frame_overlap" -> "documents",
    // r10: the curation/text heavy hitters were missing from the
    // 10x stretch (r9 verdict #4) — the text pipeline's scaling was
    // unmeasured; plus the two new composites
    "t_budget_select" -> "documents", "t_token_ids" -> "documents",
    "t_heavy_hitters" -> "documents", "dd_semdedup" -> "embeddings",
    "t_curation_funnel" -> "documents",
    "g_suite_on_view" -> "lineitem", "pipeline_dbest" -> "events",
    // r11 (r10 verdict #5): the embedding ops' 10× behavior measured,
    // not asserted — DBSCAN's ~p² pair volume at the new p=4 default
    // (plus the p=1/p=2 cost baselines), the drift monitor's
    // integer-µ sums, the probe-curve audit, and both MMR pools
    "sim_dbscan_p1" -> "embeddings",
    "sim_dbscan_p2" -> "embeddings", "sim_mmr_topk" -> "embeddings",
    "sim_mmr_ivf" -> "embeddings", "sim_embed_drift" -> "embeddings",
    "sim_ivf_probe_curve" -> "embeddings",
    // the held-out LM filter's 10× behavior (r11: two model-sized
    // token aggregations + the scored-half joins — expect ~linear)
    "t_lm_heldout" -> "documents",
    // cross-source matrix at 10×: the distinct is the corpus-sized
    // stage; the self-join fan-out is |sources|²-bounded per gram,
    // so ~linear is the pass bar
    "dd_source_overlap" -> "documents",
    // the √n-cell DEFAULT next to the pinned-16 evidence row: the
    // sf1 pair (95.8 s pinned vs 15.9 s) is the measured case for
    // sizing the quantizer with the corpus instead of pinning it
    "sim_dbscan" -> "embeddings",
    // pinned-16 at p=4 LAST: it is the quadratic-by-construction
    // evidence row (Σ|cell|² ≈ n², 95.8 s isolated at sf1) — if its
    // 401M-pair eps-graph ever takes down the shared 8 GiB context,
    // the failure must not erase the rows behind it
    // r11 privacy/crawl rows: both should be ~linear-in-data — the
    // k-anon second pass is QI-domain-bounded and the URL-dedup
    // join back is class-sized
    "dq_k_anon" -> "events", "dd_url_dedup" -> "documents",
    // late-r11 planning ops at 10×: the LSH planner's CAPPED twin
    // only (the uncapped t=0.3 prefix join measured 112 s isolated
    // at sf1 — the threshold-curve trap at a lower threshold; the
    // capped row is the production path), the reweight/memgap token
    // passes (~linear), proto-prune's grid-window form, and the
    // two map-only curves
    "dd_lsh_plan_capped" -> "documents",
    "t_domain_reweight" -> "documents", "t_lm_memgap" -> "documents",
    "t_ccnet_buckets" -> "documents",
    "t_seqlen_curve" -> "documents", "t_fertility" -> "documents",
    "sim_proto_prune" -> "embeddings",
    "sim_kcenter" -> "embeddings",
    "sim_binary_topk" -> "embeddings",
    // r12: the hash-sampled recall audit at 10× (r11 verdict #4 —
    // the exact side is (n·frac)² by construction, so this row CAN
    // run at any scale; its number is the evidence), the sampled
    // k-center pool (verdict #5), and the two streaming twins
    // (verdict #7 — AvailableNow overhead at 10×)
    "sim_dbscan_sampled_recall" -> "embeddings",
    "sim_kcenter_sampled" -> "embeddings",
    // r15 continuation: the shared-index composite at 10× — a NEW
    // scaling point, feasible only since ivfTopK dropped its no-op
    // wide-row dedup exchange (the pre-change shape OOM'd the 8 GiB
    // fresh JVM at sf1 once and filled the disk with shuffle spill on
    // the repro — target/attrib/r15opt2_ab_sf1.jsonl; the new shape
    // runs 50.6 s warm isolated). First row is new, not a mover.
    "sim_index_pipeline" -> "embeddings",
    "dd_minhash_recall_sampled" -> "documents",
    // semantic cross-split contamination at 10×: the dd_semdedup cost
    // class (one assignment pass + cell-keyed train×eval join)
    "sim_split_leakage" -> "embeddings",
    "st_incremental_dedup" -> "documents",
    "st_embed_drift" -> "embeddings",
    // r13: the stateful-heavier streaming twins at 10× (session-window
    // state and the day×bucket PSI grid both grow with data, unlike
    // r12's pair whose state was dedup-key/centroid-sized)
    "st_session_window" -> "events", "st_psi_drift" -> "events",
    // r13 rotation cont'd: MinHash band state and stream-stream join
    // state at 10× (st_frequent_ngrams stays sf0.1-only this round —
    // its complete-mode state is vocabulary-sized, so measure the
    // sf0.1 shape before paying for it in the shared sf1 block)
    "st_incremental_neardup" -> "documents",
    "st_outer_join" -> "events",
    // the bounded-state sketch at 10×: state stays 1024 rows while the
    // token volume grows — the flat-state claim gets its measured point
    "st_countmin_sketch" -> "documents",
    // r14: the MG twin at 10× — state stays ≤20k counters while the
    // gram volume grows 10×; the recount probe is corpus-sized but
    // map-combined (the t_heavy_hitters cost class)
    "st_heavy_hitters" -> "documents",
    // r14: the bounded-state triage aggregate at 10× — the PRODUCTION
    // default of the explode/aggregate pair (one row per payload
    // through the plan, 256-slot buffer); its 10× point closes the
    // multimodal sf1 story next to mm_frame_overlap
    "mm_byte_triage_agg" -> "documents")
  // r12 (r11 verdict #1a): the two DECLARED-quadratic evidence rows
  // burned ~10 min of the sf1 block every round (pinned16: 146s cold
  // + 80s warm; uncapped containment: 315s cold + 127s warm in the
  // stressed shared JVM) and are what pushed the driver-pace run
  // past its wall-clock window (BENCH_r11 rc=124). The quadratic-trap
  // case is PROVEN — measured isolated sf1 evidence is committed in
  // SCALE.md (95.8s vs 15.9s; 112s uncapped) — and does not need
  // re-measuring four-executions-deep every round. Both rows keep
  // their sf0.1 headline slots; the sf1 rows run only under
  // SPARK_GRAFT_EVIDENCE=1 (never set by the driver).
  val sf1EvidenceRows: Seq[(String, String)] = Seq(
    "dd_ngram_containment" -> "documents",
    "sim_dbscan_pinned16" -> "embeddings")

  /** Committed per-query isolated-truth ledger (r12 verdict #1): maps
    * "name@sf" to the last KNOWN fresh-single-query-JVM warm time and
    * the git tip it was measured at. Two rounds running, the official
    * shared-run artifact flagged 2-8x "suspects" that only an
    * out-of-band fresh-JVM rerun could absolve (r11: judge; r12: judge
    * again — all context, zero regressions); with the ledger the
    * artifact self-adjudicates: every suspect row carries its isolated
    * truth and an auto-classification, and the worst unexplained ones
    * get a child fresh-JVM rerun appended before the final write.
    */
  val ledgerPath = "tools/isolated_ledger.json"

  /** One committed isolated-truth row. `round`/`date` stamp WHEN the
    * measurement was taken (r13 verdict #5 — the §11 lesson is that
    * identical code drifted 5.49→8.71 s isolated across days, so an
    * old entry can mis-classify near the 1.5× line in BOTH
    * directions; the sweep refreshes stale entries it relies on).
    * `seeded=true` marks a value recorded by a `no-isolated-baseline`
    * child rerun (r13 ADVICE): if that rerun happened to measure a
    * regression introduced at its own tip, the regressed value IS the
    * recorded truth and every later sweep would absolve the row — so
    * seeded entries issue only provisional (`context-seeded`)
    * absolutions until a prev-tip worktree A/B
    * (tools/bench_attrib.sh, the ATTRIBUTION_r13 §8 protocol)
    * confirms the value and the flag is removed by hand.
    */
  private[graft] case class LedgerEntry(warm: Double, tip: String,
      round: Option[Int] = None, date: Option[String] = None,
      seeded: Boolean = false)

  private[graft] def parseLedgerJson(j: String): Map[String, LedgerEntry] =
    """"([A-Za-z0-9_]+@sf[0-9.]+)":\{([^}]*)\}""".r.findAllMatchIn(j)
      .flatMap { m =>
        val body = m.group(2)
        def num(k: String) =
          ("\"" + k + "\":(-?[0-9][0-9.eE+-]*)").r
            .findFirstMatchIn(body).map(_.group(1))
        def str(k: String) =
          ("\"" + k + "\":\"([^\"]*)\"").r
            .findFirstMatchIn(body).map(_.group(1))
        num("warm").map(w => m.group(1) -> LedgerEntry(w.toDouble,
          str("tip").getOrElse("unknown"), num("round").map(_.toInt),
          str("date"), body.contains("\"seeded\":true")))
      }.toMap

  private def parseLedger(): Map[String, LedgerEntry] =
    try {
      val p = java.nio.file.Paths.get(ledgerPath)
      if (!java.nio.file.Files.exists(p)) Map.empty
      else parseLedgerJson(
        new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
    } catch { case _: Throwable => Map.empty }

  /** Current build round, inferred from the driver's committed
    * BENCH_r{N}.json series (max N + 1) so nothing needs a manual
    * bump. Used only to stamp ledger entries and pick stale ones for
    * refresh — a wrong value degrades staleness detection, nothing
    * else.
    */
  private[graft] def roundFromBenchFiles(names: Seq[String]): Int =
    names.flatMap("""^BENCH_r0*([0-9]+)\.json$""".r.findFirstMatchIn(_)
      .map(_.group(1).toInt)).maxOption.map(_ + 1).getOrElse(0)

  private def currentRound(): Int =
    try {
      val fs = Option(new java.io.File(".").listFiles())
        .map(_.toSeq.map(_.getName)).getOrElse(Nil)
      roundFromBenchFiles(fs)
    } catch { case _: Throwable => 0 }

  /** 1-minute /proc/loadavg sample (r14 verdict #4): the r14 official
    * sweep ran 55 min against r13's 39 with other harness processes on
    * the box, and the only record of that external load was prose.
    * Sampled immediately before each query's timed reps and shipped
    * per row, so a reader can discount rows measured under co-tenant
    * load the artifact itself cannot otherwise see. −1 when
    * /proc/loadavg is unreadable (non-Linux dev box) — absent, not 0,
    * so "idle" is never fabricated.
    */
  private def loadAvg(): Double =
    try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      .split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Short git tip without shelling out (no JGit in the classpath). */
  private def gitTip(): String =
    try {
      val head = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(".git/HEAD")), "UTF-8").trim
      val sha =
        if (!head.startsWith("ref:")) head
        else {
          val ref = head.drop(4).trim
          val p = java.nio.file.Paths.get(".git/" + ref)
          if (java.nio.file.Files.exists(p))
            new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim
          else {
            val pk = java.nio.file.Paths.get(".git/packed-refs")
            if (!java.nio.file.Files.exists(pk)) "unknown"
            else new String(java.nio.file.Files.readAllBytes(pk), "UTF-8")
              .linesIterator.collectFirst {
                case l if l.endsWith(" " + ref) => l.split(' ')(0)
              }.getOrElse("unknown")
          }
        }
      sha.take(7)
    } catch { case _: Throwable => "unknown" }

  /** Repo-relative paths whose change could alter EVERY query's
    * semantics or cost: the session/loader config, the shared native
    * expression library, the registration plumbing, and the sf1 data
    * generator. Bench.scala itself is deliberately NOT here — it
    * changes every round (notes, process machinery) and its edits are
    * measurement process, not query code; a Bench-level change that
    * altered timings would move MANY rows at once, which no
    * single-suspect absolution can hide.
    */
  private[graft] val globalQueryDeps: Seq[String] = Seq(
    "build.sbt",
    "src/main/scala/graft/io/",
    "src/main/scala/graft/functions/",
    // functions/ calls into text/ (CountMin tokenizes via
    // TextAnalysis), so text is a TRANSITIVE global dep
    "src/main/scala/graft/text/",
    "src/main/scala/graft/model/",
    "src/main/scala/graft/Guards.scala",
    "src/main/scala/graft/QueryRegistry.scala",
    "src/main/scala/graft/SparkEntry.scala",
    "src/main/scala/graft/GenScale.scala")

  /** name → the source paths that can affect it (r13 verdict #1: the
    * cheapest suspect evidence there is — whether the flagged query's
    * code changed at all). Registry membership is checked at runtime
    * (auto-correct as queries move); the per-registry path sets are
    * the TRANSITIVE CLOSURE of the package reference graph from the
    * registry's own package (a first cut used only direct imports and
    * missed fully-qualified calls — e.g. PipelineQueries →
    * rel.OlsFit, KernelQueries → api.GraftEngine — which would have
    * let the FINAL code-unchanged absolution hide a real regression;
    * RegistrySpec now recomputes the closure from the sources and
    * fails the build if any set goes under-inclusive). The honest
    * closure makes the kernel/pipeline/streaming families own almost
    * every module — absolution for them fires only in rounds that
    * touch nothing they reach, which is exactly when it is sound.
    * Unknown names fall back to the whole source tree (never absolved
    * unless nothing changed).
    */
  private[graft] def ownedPaths(name: String): Seq[String] = {
    val src = "src/main/scala/graft/"
    // rel → plans (AsOfJoinExec); text/functions/io via globals
    val relDeps = Seq(s"${src}rel/", s"${src}plans/")
    // the broadly-coupled families: ts → {api, pipeline}, api →
    // {pipeline, plans, ts}, sim ↔ dedup ↔ pipeline — the kernel and
    // streaming closures stay every module except graph/. sources/ is
    // included by hand where needed: the DSv2 source is looked up by
    // its STRING name ("observation-collection"), which no reference
    // scan can see.
    val wideDeps = Seq(s"${src}pipeline/", s"${src}dedup/",
      s"${src}sim/", s"${src}multimodal/", s"${src}ts/",
      s"${src}rel/", s"${src}plans/", s"${src}api/", s"${src}sources/")
    // r15 (r14 verdict #6): the PipelineQueries monolith split into
    // four family registries, and their ownership is FILE-grain inside
    // pipeline/ — a new mm_ entry no longer disables code-unchanged
    // absolution for dd_/sim_/t_ suspects. Each set is the transitive
    // closure of the family file's reference graph (RegistrySpec
    // recomputes it from the sources, including same-package bare
    // references and graft.pipeline.<Class> FQNs, and fails the build
    // on under-inclusion). dedup ↔ sim (semdedup/cosine ↔ cosineCol)
    // and sim → pipeline/Sampling.scala (hashBucket) hold for all;
    // text adds rel/ (OlsFit) → plans/; media adds multimodal/ +
    // sources/ (by hand) + TrendPipeline → ts/ → api/ → plans/.
    val pipeShared = Seq(s"${src}pipeline/PipelineShared.scala",
      s"${src}pipeline/Sampling.scala", s"${src}dedup/", s"${src}sim/")
    val pipeDedup = s"${src}pipeline/DedupQueries.scala" +: pipeShared
    val pipeSim = s"${src}pipeline/SimQueries.scala" +: pipeShared
    val pipeText = Seq(s"${src}pipeline/TextQueries.scala",
      s"${src}pipeline/DocPipeline.scala",
      s"${src}pipeline/Snapshot.scala",
      s"${src}rel/", s"${src}plans/") ++ pipeShared
    // media's closure avoids dedup/+sim/ entirely: PipelineShared →
    // {io, text} (both global), TrendPipeline → ts → api → plans
    val pipeMedia = Seq(s"${src}pipeline/MediaSourceQueries.scala",
      s"${src}pipeline/PipelineShared.scala",
      s"${src}pipeline/TrendPipeline.scala",
      s"${src}multimodal/", s"${src}sources/", s"${src}ts/",
      s"${src}api/", s"${src}plans/")
    val byRegistry: Seq[(Set[String], Seq[String])] = Seq(
      graft.rel.RelQueries.queries.keySet -> relDeps,
      graft.rel.SqlQueries.queries.keySet -> relDeps,
      graft.rel.LogAnalytics.queries.keySet -> relDeps,
      graft.ts.KernelQueries.queries.keySet -> wideDeps,
      graft.pipeline.TextQueries.queries.keySet -> pipeText,
      graft.pipeline.DedupQueries.queries.keySet -> pipeDedup,
      graft.pipeline.SimQueries.queries.keySet -> pipeSim,
      graft.pipeline.MediaSourceQueries.queries.keySet -> pipeMedia,
      graft.graph.GraphQueries.queries.keySet -> Seq(s"${src}graph/"),
      graft.streaming.StreamQueries.queries.keySet ->
        (s"${src}streaming/" +: wideDeps))
    globalQueryDeps ++ byRegistry.collectFirst {
      case (names, paths) if names(name) => paths
    }.getOrElse(Seq(src))
  }

  /** One guarded git invocation: stdout drained on a daemon thread
    * (so the 30 s cap actually fires on a wedged child — a blocking
    * readAllBytes BEFORE waitFor would hang the whole sweep on a
    * stale index.lock or a credential prompt), hard timeout +
    * destroyForcibly, None on any failure. Shared by the
    * changed-files diff and the prev-artifact-tip fallback.
    */
  private def runGit(cmd: String*): Option[Seq[String]] =
    try {
      val pb = new ProcessBuilder(("git" +: cmd): _*)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val proc = pb.start()
      val buf = new java.io.ByteArrayOutputStream()
      val drain = new Thread(() =>
        try proc.getInputStream.transferTo(buf)
        catch { case _: Throwable => () })
      drain.setDaemon(true)
      drain.start()
      if (!proc.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)) {
        proc.destroyForcibly()
        None
      } else if (proc.exitValue() != 0) None
      else {
        drain.join(5000)
        Some(buf.toString("UTF-8").linesIterator
          .map(_.trim).filter(_.nonEmpty).toSeq)
      }
    } catch { case _: Throwable => None }

  /** Files changed between the previous artifact's tip and the
    * CURRENT WORKING TREE (committed + uncommitted + untracked — a
    * dirty-tree sweep must not absolve code it is actually running).
    * None when git or the prev tip is unavailable → no absolution.
    */
  private def gitChangedFiles(prevTip: String): Option[Set[String]] =
    if (prevTip.isEmpty || prevTip == "unknown") None
    else for {
      committed <- runGit("diff", "--name-only", prevTip)
      untracked <- runGit("ls-files", "--others", "--exclude-standard")
    } yield (committed ++ untracked).toSet

  /** Dedicated single-query isolation mode (child protocol): runs ONE
    * query at ONE scale in this fresh JVM — cold + min-of-2 warm — and
    * prints one JSON line. Spawned by the parent sweep for the worst
    * unadjudicated suspects; also usable by hand:
    * `SPARK_GRAFT_ISOLATE=g_triangles@sf1 sbt "runMain graft.Bench"`.
    * Never touches target/bench_full.json.
    */
  private def runIsolated(spec: String): Unit = {
    val (name, sfLabel) = spec.span(_ != '@') match {
      case (n, s) => (n, s.drop(1))
    }
    // fail-fast on a typo'd name or label BEFORE building a session,
    // and still emit the protocol's one JSON line so the parent's
    // childIsolate (or a human) sees the cause instead of an empty
    // stdout (r13 self-review)
    if (!Set("sf0.1", "sf1").contains(sfLabel) ||
        !SparkEntry.queries.contains(name)) {
      println(s"""{"isolated":"$name","sf":"$sfLabel","error":"unknown query name or sf label (expect <registered-name>@sf0.1|sf1)"}""")
      return
    }
    val dir =
      if (sfLabel == "sf1")
        sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/root/repo/target/sf1")
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.io.Tables.configure(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      dt
    }
    try {
      val load = loadAvg()
      val cold = once()
      val warm = math.min(once(), once())
      println(s"""{"isolated":"$name","sf":"$sfLabel","dir":"$dir","cold":$cold,"warm":$warm,"load":$load,"tip":"${gitTip()}"}""")
    } catch { case e: Throwable =>
      println(s"""{"isolated":"$name","sf":"$sfLabel","error":"${
        String.valueOf(e.getMessage).replaceAll("[\"\\\\\n]", " ").take(200)}"}""")
    }
    spark.stop()
  }

  /** Spawn a fresh child JVM running [[runIsolated]] for one suspect
    * and parse its warm time. The child inherits this JVM's flags
    * (--add-opens, -Xmx) and classpath; stderr passes through, stdout
    * is the one JSON line. Runs AFTER the sweep and after the parent's
    * SparkContext stops, so nothing shares the machine with it — the
    * same conditions as a manual tools/bench_attrib.sh run.
    */
  private def childIsolate(name: String, sf: String): Option[Double] =
    parseNum("warm", childIsolateRaw(name, sf))

  /** Pull a numeric field out of a child's one-line JSON output. */
  private[graft] def parseNum(field: String, out: String): Option[Double] =
    ("\"" + field + "\":(-?[0-9][0-9.eE+-]*)").r
      .findFirstMatchIn(out).map(_.group(1).toDouble)

  /** Verdict record for a failed row's fresh-child retry (r15 — the
    * closing sweep's `g_suite_on_view` OOM'd late in the shared 8 GiB
    * sf1 block but ran clean isolated at the same tip, and that
    * adjudication lived in prose + a side jsonl; now the artifact
    * carries it). Classes: `isolated-pass` — the child completed, so
    * the shared-sweep failure was resource pressure, not code (the
    * child's cold/warm/load ride along); `isolated-failure` — the
    * child failed too: real breakage; `no-verdict` — the child gave
    * no usable output (spawn failure or the 10-min cap killed it).
    */
  private[graft] def failedRetryRecord(raw: String): String =
    parseNum("warm", raw) match {
      case Some(w) =>
        val cold = parseNum("cold", raw).getOrElse(-1.0)
        val load = parseNum("load", raw).getOrElse(-1.0)
        s"""{"class":"isolated-pass","cold":$cold,"warm":$w,"load":$load}"""
      case None if raw.contains("\"error\":") =>
        val err = """"error":"([^"]*)"""".r.findFirstMatchIn(raw)
          .map(_.group(1)).getOrElse("")
        s"""{"class":"isolated-failure","error":"$err"}"""
      case None => """{"class":"no-verdict"}"""
    }

  private def childIsolateRaw(name: String, sf: String): String =
    try {
      import scala.jdk.CollectionConverters._
      val javaBin = new java.io.File(new java.io.File(
        System.getProperty("java.home"), "bin"), "java").getAbsolutePath
      val jvmArgs = java.lang.management.ManagementFactory
        .getRuntimeMXBean.getInputArguments.asScala
        .filterNot(a => a.startsWith("-javaagent") ||
          a.startsWith("-agentlib")).toSeq
      val cmd = (Seq(javaBin) ++ jvmArgs ++
        Seq("-cp", System.getProperty("java.class.path"), "graft.Bench"))
      val pb = new ProcessBuilder(cmd.asJava)
      pb.environment().put("SPARK_GRAFT_ISOLATE", s"$name@$sf")
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val proc = pb.start()
      // drain stdout on a daemon thread (one small JSON line, but the
      // pipe must not back up) and cap the child at 10 min so a wedged
      // child cannot eat the driver's wall-clock window (children are
      // only spawned for <=60s rows, so 10 min is ample)
      val buf = new java.io.ByteArrayOutputStream()
      val drain = new Thread(() =>
        try proc.getInputStream.transferTo(buf)
        catch { case _: Throwable => () })
      drain.setDaemon(true)
      drain.start()
      if (!proc.waitFor(10, java.util.concurrent.TimeUnit.MINUTES))
        proc.destroyForcibly()
      drain.join(5000)
      val out = buf.toString("UTF-8")
      try {
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get("target/attrib"))
        java.nio.file.Files.write(java.nio.file.Paths.get(
          s"target/attrib/auto_${name}_$sf.json"), out.getBytes("UTF-8"))
      } catch { case _: Throwable => () }
      out
    } catch { case e: Throwable =>
      System.err.println(s"[bench] child isolate $name@$sf failed: ${e.getMessage}")
      ""
    }

  def main(args: Array[String]): Unit = {
    sys.env.get("SPARK_GRAFT_ISOLATE") match {
      case Some(spec) => runIsolated(spec); return
      case None => ()
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // dev-only subset (comma-separated names) for fast iteration on a
    // single query's timing; the driver never sets it
    val headline = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(f => this.headline.filter(f.split(',').toSet))
      .getOrElse(this.headline)
    // dev-only failure injection (the FORCE_RERUN convention applied
    // to the r15 failed-row retry path): named sf0.1 rows record a
    // failure without running, so the retry machinery can be
    // exercised end-to-end at any scale without waiting for a real
    // late-sweep OOM. Never set by the driver; fake-fail retries
    // never touch the ledger.
    val fakeFail = sys.env.get("SPARK_GRAFT_FAKE_FAIL").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty).toSet
    val spark = graft.io.Tables.configure(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up pass, TIMED and reported as "cold_total": whole-stage
    // codegen compilation (janino) and broadcast build dominate first
    // execution (~8s vs ~1.2s steady state for the heavy zip_with
    // plans); steady-state is the relevant throughput figure at scale,
    // where compilation amortizes — but the cold figure keeps
    // round-over-round totals comparable with pre-warm-up rounds.
    // Between-query hygiene (r10): many operators eagerly
    // localCheckpoint their bounded results and rely on the
    // ContextCleaner to free the blocks once the frames are GC'd —
    // correct in a long-lived session, but across a 125-query bench in
    // an 8 GiB JVM the unreferenced blocks accumulate faster than GC
    // notices and the sf1 tail died with Spark's OOM exit (52) in the
    // r10 full run. Nothing is live between bench queries, so drop
    // every leftover persisted/checkpointed RDD explicitly (untimed).
    // SPARK_GRAFT_KEEP_BLOCKS=1 (diagnostic only — never set by the
    // driver) disables the hygiene so a rerun can A/B "honest-cold
    // accounting" vs "real regression" for checkpoint-carrying
    // queries: with blocks kept, min-of-3 silently reuses the eager
    // localCheckpoint blocks across runs, which is exactly the
    // pre-r10 warm-cache figure.
    val keepBlocks = sys.env.get("SPARK_GRAFT_KEEP_BLOCKS").contains("1")
    def dropLeftoverBlocks(): Unit =
      if (!keepBlocks)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))

    // r12 (r11 verdict #6): round-over-round attribution baked into the
    // artifact. The PREVIOUS committed artifact (if any) is read before
    // the pending-write below clobbers it; every warm time is ratioed
    // against its previous-round slot and the >=1.5x movers land in a
    // "suspects" field — so each round's attribution pass starts from
    // the artifact instead of a manual diff (ATTRIBUTION_r11 was
    // manual). Parsing is a name:number scan of the known flat maps
    // (no JSON library in the unmanaged classpath); sub-0.2s rows are
    // excluded because shared-JVM co-tenancy alone moves them 2.4-2.5x
    // (the r6/r10 lesson) — a sub-0.2s "regression" is never worth a
    // fresh-JVM A/B.
    def parseMap(json: String, from: Int): Map[String, Double] =
      if (from < 0) Map.empty
      else {
        val start = json.indexOf("{", from)
        val end = json.indexOf("}", start)
        if (start < 0 || end < 0) Map.empty
        else "\"([A-Za-z0-9_]+)\":(-?[0-9][0-9.eE+-]*)".r
          .findAllMatchIn(json.substring(start + 1, end))
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    val (prev01, prevSf1, prevTip): (Map[String, Double],
        Map[String, Double], String) =
      try {
        val p = java.nio.file.Paths.get("target/bench_full.json")
        if (java.nio.file.Files.exists(p)) {
          val j = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
          val sf1At = j.indexOf("\"sf1\":{")
          // the artifact records its own measurement tip from r14 on;
          // older artifacts fall back to the commit that last touched
          // the committed copy (one driver round-commit later than the
          // measurement — an over-inclusive diff base, which can only
          // withhold an absolution, never fabricate one). The fallback
          // degrades to "unknown" on ITS OWN — a git failure here must
          // not take the already-parsed prev maps down with it (the
          // suspects machinery would then silently report an empty
          // list, which readers are told means "no movers").
          val recordedTip = """"tip":"([0-9a-f]{4,40})"""".r
            .findFirstMatchIn(j).map(_.group(1)).getOrElse(
              runGit("log", "-1", "--format=%h", "--",
                "target/bench_full.json")
                .flatMap(_.headOption).getOrElse("unknown"))
          (parseMap(j, j.indexOf("\"queries\":")),
            if (sf1At < 0) Map.empty
            else parseMap(j, j.indexOf("\"queries\":", sf1At)),
            recordedTip)
        } else (Map.empty, Map.empty, "unknown")
      } catch { case _: Throwable => (Map.empty, Map.empty, "unknown") }
    def suspectData(now: Seq[(String, Double)], prevM: Map[String, Double],
        sf: String): Seq[(String, String, Double, Double)] =
      now.flatMap { case (n, v) =>
        prevM.get(n).collect {
          case p if isSuspect(sf, p, v) => (n, sf, p, v)
        }
      }

    // r13 (r12 verdict #1): every suspect row self-adjudicates against
    // the committed isolated-truth ledger (tools/isolated_ledger.json)
    // — two rounds running, the official artifact's 2-8x movers needed
    // an out-of-band judge rerun to be absolved as shared-run context.
    // Classification: "context" when the isolated truth is NOT itself
    // a >=1.5x mover vs the previous artifact value (the shared-run
    // number is co-tenancy inflation, or the previous value was
    // page-cache-deflated — either way not a code change);
    // "regression" when a FRESH child rerun THIS run confirms the
    // isolated truth moved >=1.5x; "needs-attribution" when no current
    // isolated baseline contradicts the move (stale-or-missing ledger).
    val ledger = parseLedger()
    val tip = gitTip()
    val round = currentRound()
    // r14 (r13 verdict #1): one git diff against the previous
    // artifact's tip, computed once — each suspect then intersects the
    // changed set with its owned paths. None (git/prev-tip
    // unavailable) disables absolution, never enables it.
    val changedFiles: Option[Set[String]] = gitChangedFiles(prevTip)
    def ownedChanged(n: String): Option[Seq[String]] =
      changedFiles.map { ch =>
        val owned = ownedPaths(n)
        ch.filter(f => owned.exists(p => f == p || f.startsWith(p)))
          .toSeq.sorted
      }
    val rerun = scala.collection.mutable.Map.empty[String, Double]
    // name@sf -> failedRetryRecord verdict JSON for rows that failed
    // in the shared sweep and were retried in a fresh child (r15)
    val retryVerdicts =
      scala.collection.mutable.LinkedHashMap.empty[String, String]
    def ledgerNote(n: String, sf: String, p: Double): String =
      classifySuspect(rerun.get(s"$n@$sf"),
        ledger.get(s"$n@$sf"), tip, p, ownedChanged(n))
    def suspectRows(now: Seq[(String, Double)], prevM: Map[String, Double],
        sf: String): Seq[String] =
      suspectData(now, prevM, sf).map { case (n, s, p, v) =>
        s"""{"name":"$n","sf":"$s","prev":$p,"now":$v,"ratio":${
          math.round(v / p * 100.0) / 100.0},${ledgerNote(n, s, p)}}"""
      }

    // r11 (r10 verdict #1): the cold pass records PER-QUERY times, not
    // just the total — round-over-round shifts were unattributable
    // ("honest-cold accounting vs real regression") while only the
    // warm min-of-3 survived per query. cold−warm per query is the
    // compile/broadcast/first-materialization share; a query whose
    // WARM time moved needs a code explanation, one whose COLD moved
    // usually needs an accounting one.
    val coldRuns: Seq[(String, Double)] = headline.map { name =>
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        dropLeftoverBlocks()
        name -> dt
      } catch { case _: Throwable => dropLeftoverBlocks(); name -> 0.0 }
    }
    val coldTotal = coldRuns.map(_._2).sum
    val coldQs = coldRuns.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")

    // a failed query records -1 (never a near-zero duration that would
    // deflate the headline total) and is listed in "failed". Each query
    // is timed three times and the min kept: the steady-state figure is
    // the scale-relevant one, and min-of-3 shrugs off transient host
    // contention (GC, page cache, co-tenant load) that single or paired
    // samples still inherit (r3 showed ±20-30% swings on sub-second
    // queries at min-of-2).
    val coldByName = coldRuns.toMap
    // per-row external-load context (r14 verdict #4): sampled right
    // before each query's warm reps; shipped as "load_queries"
    val loadAt = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val results = headline.map { name =>
      loadAt(name) = loadAvg()
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        if (fakeFail.contains(name)) return -1.0
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          dropLeftoverBlocks()
          return -1.0
        }
        val dt = (System.nanoTime() - t0) / 1e9
        dropLeftoverBlocks()
        dt
      }
      // r12 (r11 verdict #1b): min-of-3 precision matters for
      // sub-second queries (±20-30% host noise), not for 10s+ jobs
      // where the same noise is proportionally tiny — queries whose
      // COLD run exceeded 10s take 2 warm reps instead of 3, trimming
      // the suite back inside the driver's wall-clock window.
      val reps = if (coldByName.getOrElse(name, 0.0) > 10.0) 2 else 3
      val times = Iterator.continually(once()).take(reps)
        .takeWhile(_ >= 0).toSeq
      name -> (if (times.length < reps) -1.0 else times.min)
    }
    // r14 (r13 verdict #2): a warm figure ABOVE its own cold run is
    // physically backwards — the warm reps were co-tenancy-destroyed
    // (r13's t_dsir_weights@sf1 read warm 59.45 vs cold 12.11 against
    // an isolated truth of 8.8 — a reader summing warm times saw 7×
    // phantom cost). Such rows ship min(cold, warm) in the queries
    // map and are named with their ORIGINAL warm value in the
    // per-block "warm_gt_cold" annotation, so no downstream sum sees
    // the phantom and no reader mistakes the substitution for a
    // measurement.
    def substituteInversions(rows: Seq[(String, Double)],
        coldOf: Map[String, Double])
        : (Seq[(String, Double)], Seq[(String, Double)]) = {
      val inverted = rows.collect { case (n, v)
        if v >= 0 && coldOf.getOrElse(n, 0.0) > 0 &&
          v > coldOf(n) => (n, v) }
      (rows.map { case (n, v) =>
        if (inverted.exists(_._1 == n)) (n, coldOf(n)) else (n, v) },
        inverted)
    }
    def wgcJson(inverted: Seq[(String, Double)]): String =
      inverted.map { case (n, v) => "\"" + n + "\":" + v }
        .mkString("{", ",", "}")
    val (adjusted, wgc01) = substituteInversions(results, coldByName)
    // failed rows (v = -1) stay OUT of the queries map at sf0.1 too —
    // their names land in "failed" — so no downstream sum over either
    // block's map is corruptible by a sentinel (r12 ADVICE: only the
    // sf1 block implemented this before)
    val qs = adjusted.collect { case (k, v) if v >= 0 =>
      "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failed01 = adjusted.collect { case (k, v) if v < 0 => k }
    val failed = failed01.map("\"" + _ + "\"")
    val total = adjusted.map(_._2).filter(_ >= 0).sum
    // the headline list grows each round, so "value" is not comparable
    // across rounds; this is the sum over the frozen r2-era 23 names
    // (the first 23 of `headline`) — read THIS for round-over-round.
    // BASELINE.md ("The one honest cross-round total") names the 23
    // and records the recent values.
    val comparable = adjusted.take(23).map(_._2).filter(_ >= 0).sum

    // Durable artifact (r9 verdict #5): the driver's BENCH_rN.json only
    // preserves a 2000-char stdout tail, which loses the per-query map.
    // The full JSON object is written to target/bench_full.json so
    // round-over-round per-query deltas survive on disk. Skipped for
    // dev-only SPARK_GRAFT_BENCH_ONLY subset runs, which must not
    // clobber the full-run artifact.
    def writeArtifact(json: String): Unit =
      if (sys.env.get("SPARK_GRAFT_BENCH_ONLY").isEmpty) {
        try {
          java.nio.file.Files.write(
            java.nio.file.Paths.get("target/bench_full.json"),
            json.getBytes("UTF-8"))
        } catch { case e: Throwable =>
          System.err.println(
            s"[bench] bench_full.json write failed: ${e.getMessage}")
        }
      }
    // r12: the artifact carries its own round-over-round attribution
    // ("suspects", r11 verdict #6) — recomputed at every incremental
    // write from whatever sf1 rows exist so far.
    def artifactJson(sf1Part: String,
        sf1Now: Seq[(String, Double)] = Nil): String = {
      val sus = (suspectRows(adjusted, prev01, "sf0.1") ++
        suspectRows(sf1Now, prevSf1, "sf1")).mkString("[", ",", "]")
      val loadQs = loadAt.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      // failed-row retry verdicts (r15): rendered at call time, so the
      // final artifact write after the retry loop picks them up
      val retryPart =
        if (retryVerdicts.isEmpty) ""
        else retryVerdicts.map { case (k, v) => "\"" + k + "\":" + v }
          .mkString(""","failed_retry":{""", ",", "}")
      s"""{"metric":"total","value":$total,"unit":"sec","tip":"$tip","round":$round,"cold_total":$coldTotal,"comparable_r2_total":$comparable,"queries":$qs,"cold_queries":$coldQs,"load_queries":$loadQs,"failed":${failed.mkString("[", ",", "]")},"warm_gt_cold":${wgcJson(wgc01)}$retryPart,"suspects":$sus,"sf":"$sfDir","notes":"$benchNotes"$sf1Part}"""
    }
    // r11 lesson, codified: the sf1 block once OOM'd the JVM (exit 52)
    // and the artifact — queued to be written only at the very end —
    // was lost along with every completed sf0.1 row. Persist the
    // sf0.1-complete artifact BEFORE entering the sf1 block; each sf1
    // row then rewrites the artifact as it completes (r12 — BENCH_r11
    // was a timeout kill DURING an sf1 row, and the rows before it
    // survived only because of the early write; now every completed
    // row is durable the moment it lands, and the in-flight query's
    // name is visible in "sf1_running").
    writeArtifact(artifactJson(""","sf1":"pending""""))

    // sf1 stretch section (SCALE.md validation): if the deterministic
    // 10×-sf0.1 tables generated by graft.GenScale exist, time the
    // likeliest hidden-constant paths at 10× bench scale: span dedup /
    // MinHash-LSH / IVF-PQ (r6), the graph suite (r9 — PageRank's
    // per-iteration materialization changed its execution shape in r8
    // and its 10× behavior was unmeasured; the sf1 lineitem is
    // `factor` disjoint graph copies, so ~linear is the pass bar),
    // both containment variants (capped vs uncapped skew twins), and
    // the two end-to-end kernel journeys over 10× the event series.
    // min-of-2 after the cold pass — these are multi-second queries
    // where host-contention noise is proportionally small. Linear
    // scaling predicts ≈10× the sf0.1 per-query figures; read BENCH
    // notes for the envelope verdict. Each entry is gated on ITS
    // input table so an sf1 dir from an older round still benches the
    // subset it has.
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR",
      "/root/repo/target/sf1")
    val sf1All = sf1Needs ++
      (if (sys.env.get("SPARK_GRAFT_EVIDENCE").contains("1"))
        sf1EvidenceRows else Nil)
    // the dev-only SPARK_GRAFT_BENCH_ONLY subset applies here too —
    // before r10 a 5-query dev iteration still paid the full ~20-min
    // sf1 sweep
    val sf1Names = sf1All.collect { case (n, t)
      if java.nio.file.Files.exists(
        java.nio.file.Paths.get(sf1Dir, s"$t.parquet")) => n }
      .filter(n => sys.env.get("SPARK_GRAFT_BENCH_ONLY")
        .forall(_.split(',').toSet.contains(n)))
    // (name, cold, warm); a failed run records NO number — the name
    // goes in the block's "failed" list instead (r11 verdict #4 minor:
    // a -1.0 sentinel inside the queries map silently corrupts any
    // downstream sum over it).
    val acc = scala.collection.mutable.ArrayBuffer
      .empty[(String, Double, Double)]
    val sf1Loads = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // warm>cold inversion substitution applies to the sf1 block too —
    // it is where the r13 case actually occurred (1-2 warm reps in
    // the late, co-tenancy-stressed end of the sweep)
    def sf1Adjusted: (Seq[(String, Double)], Seq[(String, Double)]) =
      substituteInversions(
        acc.collect { case (n, _, v) if v >= 0 => (n, v) }.toSeq,
        acc.collect { case (n, c, _) if c >= 0 => (n, c) }.toMap)
    def sf1WarmRows: Seq[(String, Double)] = sf1Adjusted._1
    val sf1 =
      if (sf1Names.nonEmpty) {
        def sf1Json(running: Option[String]): String = {
          val (adj, inv) = sf1Adjusted
          val w = adj.map { case (n, v) => "\"" + n + "\":" + v }
            .mkString("{", ",", "}")
          val c = acc.collect { case (n, v, _) if v >= 0 =>
            "\"" + n + "\":" + v }.mkString("{", ",", "}")
          val fl = acc.collect { case (n, cd, wm) if cd < 0 || wm < 0 =>
            "\"" + n + "\"" }.mkString("[", ",", "]")
          val run = running.map(n => s""","running":"$n"""").getOrElse("")
          val ld = sf1Loads.map { case (k, v) => "\"" + k + "\":" + v }
            .mkString("{", ",", "}")
          s""","sf1":{"dir":"$sf1Dir","queries":$w,"cold_queries":$c,"load_queries":$ld,"failed":$fl,"warm_gt_cold":${wgcJson(inv)}$run}"""
        }
        for (name <- sf1Names) {
          // durable BEFORE the row starts: a wall-clock kill mid-query
          // loses only the in-flight row, and names it
          writeArtifact(artifactJson(sf1Json(Some(name)), sf1WarmRows))
          // late-sweep memory hygiene (r15 — the closing sweep's
          // g_suite_on_view hit UNABLE_TO_ACQUIRE_MEMORY 50+ min into
          // the shared 8 GiB JVM yet ran clean isolated at the same
          // tip): dropLeftoverBlocks unpersists ASYNC and
          // ContextCleaner's broadcast/shuffle cleanup rides GC
          // reference processing, so a long sweep accumulates dead
          // blocks that contend with the next row's execution memory.
          // One explicit GC before each row's COLD pass drains the
          // backlog (~0.1 s against multi-second sf1 rows); never
          // between warm reps — per-row methodology is unchanged.
          System.gc()
          sf1Loads(name) = loadAvg()
          val fn = SparkEntry.queries(name)
          def once(): Double = {
            val t0 = System.nanoTime()
            try { fn(spark, sf1Dir).write.mode("overwrite")
              .format("noop").save() }
            catch { case e: Throwable =>
              System.err.println(s"[bench-sf1] $name failed: ${e.getMessage}")
              dropLeftoverBlocks()
              return -1.0
            }
            val dt = (System.nanoTime() - t0) / 1e9
            dropLeftoverBlocks()
            dt
          }
          val cold = once()
          if (cold < 0) acc += ((name, -1.0, -1.0))
          else {
            // r12 (r11 verdict #1b): >10s-cold queries take ONE warm
            // rep — min-of-2 warm precision is for sub-second rows
            val reps = if (cold > 10.0) 1 else 2
            val warms = Iterator.continually(once()).take(reps)
              .takeWhile(_ >= 0).toSeq
            acc += ((name, cold,
              if (warms.length < reps) -1.0 else warms.min))
          }
        }
        sf1Json(None)
      } else ""
    // durable pre-adjudication write, then release the parent context
    // BEFORE any child rerun so nothing co-tenants the children
    writeArtifact(artifactJson(sf1, sf1WarmRows))
    spark.stop()

    // r13 (r12 verdict #1): auto-adjudicate the worst <=3 suspects the
    // ledger could not absolve — one fresh child JVM each, sequential,
    // the exact tools/bench_attrib.sh conditions — then fold the
    // measured isolated warm times back into the suspects
    // classification AND the committed ledger, so the FINAL artifact
    // (and its stdout line) carries a verdict for every suspect.
    // SPARK_GRAFT_NO_RERUN=1 skips (dev); BENCH_ONLY runs never spawn.
    def unadjudicated(n: String, sf: String, p: Double): Boolean =
      // code-unchanged suspects are FINAL (classifySuspect absolves
      // them from the git diff alone) — never spend a child on one
      !ownedChanged(n).contains(Nil) && (ledger.get(s"$n@$sf") match {
        // seeded (provisional) entries are also excluded: a same-tip
        // rerun judged against a provisional value cannot settle
        // provenance — only the prev-tip worktree A/B protocol can;
        // the row classifies context-seeded until then
        case Some(le) if le.seeded => false
        // a ledger entry only settles a suspect when it was measured
        // at the CURRENT tip; stale entries classify provisionally
        // ("context-stale-ledger") but stay rerun-eligible so a
        // post-measurement regression can't hide behind them — the
        // child's fresh number then re-stamps the ledger at this tip
        case Some(le) => le.tip != tip || le.warm >= 1.5 * p
        case None => true
      })
    // children (and ledger updates) only on OFFICIAL-scale runs: a dev
    // smoke at sf0.001 must neither burn child minutes nor write
    // small-scale warm times into the committed sf0.1 ledger (the
    // child inherits this process's SPARK_GRAFT_SF_DIR).
    // SPARK_GRAFT_FORCE_RERUN=name@sf,... exercises the spawn path by
    // hand at any scale WITHOUT touching the ledger.
    val officialSf = sfDir.endsWith("/sf0.1")
    val canSpawn = officialSf &&
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").isEmpty &&
      !sys.env.get("SPARK_GRAFT_NO_RERUN").contains("1")
    val forced = sys.env.get("SPARK_GRAFT_FORCE_RERUN").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.contains("@"))
      .map { f => val (n, s) = f.span(_ != '@'); (n, s.drop(1), 0.0, 0.0) }
    if (canSpawn || forced.nonEmpty || fakeFail.nonEmpty) {
      val pending =
        (if (canSpawn)
          childPriority((suspectData(adjusted, prev01, "sf0.1") ++
            suspectData(sf1WarmRows, prevSf1, "sf1"))
            // rows above 60s shared are too expensive to isolate inside
            // the driver's wall-clock window (a child is JVM start +
            // cold + 2 warm ≈ 4× the query) — they stay
            // needs-attribution in the artifact and get a manual
            // SPARK_GRAFT_ISOLATE run instead; the committed ledger
            // already covers the expensive graph rows
            .filter { case (n, sf, p, v) =>
              unadjudicated(n, sf, p) && v <= 60.0 })
        else Nil) ++ forced
      val seededKeys = scala.collection.mutable.Set.empty[String]
      for ((n, sf, p, _) <- pending) {
        System.err.println(
          s"[bench] adjudicating suspect $n@$sf in a fresh child JVM")
        childIsolate(n, sf).foreach { w =>
          rerun(s"$n@$sf") = w
          // a measurement with no prior isolated baseline that can't
          // conclusively absolve (w >= 1.5x prev-shared, the
          // no-isolated-baseline class) enters the ledger PROVISIONAL
          if (!ledger.contains(s"$n@$sf") && p > 0 && w >= 1.5 * p)
            seededKeys += s"$n@$sf"
        }
      }
      // r15: FAILED rows self-adjudicate too — the r15 closing sweep's
      // g_suite_on_view OOM'd late in the shared 8 GiB sf1 block yet
      // ran clean isolated at the same tip, and that verdict lived
      // only in prose + a side jsonl. Each failed row (either scale)
      // now retries ONCE in a fresh child JVM here, after the parent
      // context stopped — the same single-tenant conditions as a
      // suspect child — and the artifact carries the verdict in
      // "failed_retry" (isolated-pass / isolated-failure / no-verdict).
      // The name STAYS in the block's "failed" list: the shared-sweep
      // failure happened and the queries map holds no number for it;
      // the retry adjudicates cause, it does not substitute a row.
      // Capped at 4 children: failures are rare (zero in most rounds)
      // and each child is bounded by the 10-min cap.
      val failedRows: Seq[(String, String)] =
        failed01.map((_, "sf0.1")) ++
          acc.collect { case (n, cd, wm) if cd < 0 || wm < 0 =>
            (n, "sf1") }.toSeq
      if (canSpawn || fakeFail.nonEmpty)
        for ((n, sf) <- failedRows.take(4)) {
          System.err.println(
            s"[bench] retrying failed row $n@$sf in a fresh child JVM")
          val raw = childIsolateRaw(n, sf)
          retryVerdicts(s"$n@$sf") = failedRetryRecord(raw)
          // a completed retry is a genuine same-tip isolated
          // measurement (the ledger-backfill protocol) — stamp it so
          // next round's sweep adjudicates this row from the ledger.
          // Official runs only: a fake-fail dev exercise may run at
          // any scale and must not write mislabeled ledger entries.
          if (canSpawn)
            parseNum("warm", raw).foreach(w => rerun(s"$n@$sf") = w)
        }
      // forced (dev) reruns never touch the committed ledger — they
      // may run at any scale/label and would write mislabeled entries
      // (r13 self-review); only sweep-selected suspects persist
      val forcedKeys = forced.map { case (n, sf, _, _) => s"$n@$sf" }.toSet
      val persistable = rerun.toMap.filterNot { case (k, _) =>
        forcedKeys.contains(k) }
      if (persistable.nonEmpty && canSpawn)
        writeLedger(ledger, persistable, tip, round, seededKeys.toSet)
    }

    val json = artifactJson(sf1, sf1WarmRows)
    println(json)
    writeArtifact(json)
    // exit 2 only for sf0.1 failures the retry could not absolve: an
    // isolated-pass verdict means the code runs (shared-sweep resource
    // pressure), and the artifact already names the row in "failed"
    // with its verdict in "failed_retry"
    if (failed01.exists(n => !retryVerdicts.get(s"$n@sf0.1")
        .exists(_.contains("\"isolated-pass\"")))) sys.exit(2)
  }

  /** Child-rerun selection from the unadjudicated suspect pool (r14
    * verdict #1, replacing the r13 class-then-ratio rule). Ordering:
    * SECONDS AT STAKE (now − prev), largest first — the r14 sweep
    * spent its three children on 0.86/1.35/3.9 s rows while 17 s and
    * 16 s movers shipped unexamined, because the class ordering keyed
    * on ratio. A 17 s unexplained move is worth more child time than
    * a 3× wobble on a 0.8 s row whatever their classes are. Budget:
    * scales to 8 (was a constant 3 sized for quiet rounds) — a round
    * touching wide-ownership files disables the git leg for whole
    * families and can need 8+; each child is ≈4× its query's cost and
    * the caller's ≤60 s shared-time filter bounds the worst case, so
    * 8 children stay inside the driver's wall-clock headroom.
    * Rows are (name, sf, prevWarm, nowWarm).
    */
  private[graft] def childPriority(
      pending: Seq[(String, String, Double, Double)])
      : Seq[(String, String, Double, Double)] =
    pending.sortBy { case (_, _, p, v) => -(v - p) }.take(8)

  /** Is a (prev, now) warm pair a mover worth classifying? BOTH
    * endpoints must clear the co-tenancy noise floor: 0.2 s at sf0.1
    * (r12 ADVICE — a 0.08 s row drifting to 0.21 s on shared-JVM
    * noise is not worth a fresh-JVM A/B) and 2.0 s at sf1 (r13
    * verdict #2 — the shared sf1 block's multi-second co-tenancy
    * makes 0.39→0.77 s wobbles routine; every r13 sub-2 s sf1
    * suspect was noise on untouched code). The sf1 floor keeps a
    * RELATIVE escape hatch (the verdict's "or a relative band") so
    * the floor cannot hide a large regression on a small row: a ≥3×
    * move landing at ≥1 s is flagged even below the 2 s floor —
    * sub-2 s sf1 rows were never observed past ~2× on noise alone.
    */
  private[graft] def isSuspect(sf: String, prev: Double,
      now: Double): Boolean = {
    val floor = if (sf == "sf1") 2.0 else 0.2
    val overFloor = prev >= floor && now >= floor && now >= 1.5 * prev
    val bigRelative = sf == "sf1" && prev >= 0.2 && now >= 1.0 &&
      now >= 3.0 * prev
    overFloor || bigRelative
  }

  /** Pure suspect classification — the JSON fragment appended to a
    * suspects row. Extracted (late r13) so every branch is unit-
    * testable instead of exercised only when a live sweep happens to
    * produce the right suspect shape. Semantics:
    *
    *   - fresh child rerun + ledger entry: the rerun is judged against
    *     the best prior ISOLATED baseline — `context` under 1.5×,
    *     `regression` at or over (the one case a regression call is
    *     ever made). The previous SHARED value is never the yardstick
    *     here: it can be page-cache-DEFLATED (the r12 g_lpa
    *     direction), which would cry regression when the isolated
    *     truth never moved.
    *   - fresh child rerun, NO ledger entry: the prev-SHARED
    *     comparison is ONE-SIDED. Isolated runs are biased HIGH (they
    *     pay first-touch I/O the shared sweep amortizes), so
    *     w < 1.5·prev stays a CONCLUSIVE `context` proof — but
    *     w ≥ 1.5·prev cannot distinguish a regression from a deflated
    *     baseline (measured late-r13: sim_ivf_recall's isolated truth
    *     was 1.24 s at BOTH tips while its shared slots read
    *     0.63 → 1.23; ATTRIBUTION_r13 §8) and reports
    *     `no-isolated-baseline`; the measured value seeds the ledger
    *     so the NEXT sweep adjudicates finally.
    *   - no rerun, code UNCHANGED (`changedFiles == Some(Nil)`: git
    *     proved none of the query's owned paths moved between the
    *     previous artifact's tip and the current working tree): the
    *     move cannot be code whatever the ledger says →
    *     `context-code-unchanged`, FINAL, no child JVM spent (r13
    *     verdict #1 — the cheapest evidence there is, and the one
    *     that settles the wobble majority).
    *   - no rerun + ledger entry: a ledger absolution is FINAL
    *     (`context`) only at the current tip AND unseeded; a SEEDED
    *     entry (recorded by a no-isolated-baseline rerun — r13
    *     ADVICE) is provisional (`context-seeded`) until a prev-tip
    *     worktree A/B clears the flag; an older-tip entry still
    *     classifies (`context-stale-ledger`) but stays child-rerun-
    *     eligible so a post-measurement regression can't hide behind
    *     it; a ledger value that is ITSELF ≥1.5× the prev shared
    *     value proves nothing → `needs-attribution`.
    *   - neither: `needs-attribution`, naming the changed owned files
    *     when git could list them (so the artifact says WHY the row
    *     could not self-absolve).
    */
  private[graft] def classifySuspect(rerunWarm: Option[Double],
      ledgerEntry: Option[LedgerEntry], tip: String,
      prevShared: Double,
      changedFiles: Option[Seq[String]] = None): String = {
    val filesJson = changedFiles match {
      case Some(fs) if fs.nonEmpty =>
        s""","changed_files":[${fs.map("\"" + _ + "\"").mkString(",")}]"""
      case _ => ""
    }
    rerunWarm match {
      case Some(w) =>
        val cls = ledgerEntry match {
          case Some(le) =>
            if (w >= 1.5 * le.warm) "regression"
            else if (le.seeded) "context-seeded" else "context"
          case None =>
            if (w < 1.5 * prevShared) "context" else "no-isolated-baseline"
        }
        s""""isolated":$w,"isolated_src":"rerun@$tip","class":"$cls"""" +
          filesJson
      case None if changedFiles.contains(Nil) =>
        ledgerEntry match {
          case Some(le) =>
            s""""isolated":${le.warm},"isolated_src":"ledger@${le.tip
              }","class":"context-code-unchanged""""
          case None => """"class":"context-code-unchanged""""
        }
      case None => ledgerEntry match {
        case Some(le) =>
          val cls =
            if (le.warm >= 1.5 * prevShared) "needs-attribution"
            else if (le.seeded) "context-seeded"
            else if (le.tip == tip) "context" else "context-stale-ledger"
          s""""isolated":${le.warm},"isolated_src":"ledger@${le.tip
            }","class":"$cls"""" + filesJson
        case None => """"class":"needs-attribution"""" + filesJson
      }
    }
  }

  /** Merge fresh child-rerun isolated times into the committed ledger.
    * Fresh entries are stamped with the current round + date (r13
    * verdict #5 — staleness is now computable) and carry
    * `seeded:true` when the rerun had no prior isolated baseline to
    * judge against (r13 ADVICE — provisional until a prev-tip
    * worktree A/B confirms; a rerun judged against an already-seeded
    * entry stays seeded, since "consistent with a provisional value"
    * proves nothing about provenance).
    */
  private def writeLedger(ledger: Map[String, LedgerEntry],
      fresh: Map[String, Double], tip: String, round: Int,
      seededKeys: Set[String]): Unit =
    try {
      val today = java.time.LocalDate.now().toString
      val merged = (ledger ++ fresh.map { case (k, w) =>
        k -> LedgerEntry(w, tip, Some(round), Some(today),
          seeded = seededKeys.contains(k) ||
            ledger.get(k).exists(_.seeded))
      }).toSeq.sortBy(_._1)
      val body = merged.map { case (k, e) =>
        val extra = e.round.map(r => s""","round":$r""").getOrElse("") +
          e.date.map(d => s""","date":"$d"""").getOrElse("") +
          (if (e.seeded) ""","seeded":true""" else "")
        s""""$k":{"warm":${e.warm},"tip":"${e.tip}"$extra}"""
      }.mkString(",\n  ")
      java.nio.file.Files.write(java.nio.file.Paths.get(ledgerPath),
        ("{\"comment\":\"per-query isolated warm truth: fresh single-query JVM, cold + min-of-2 warm (graft.Bench SPARK_GRAFT_ISOLATE protocol). Seeded from the r12 judge + ATTRIBUTION_r12 fresh-JVM runs; auto-updated by the sweep's child reruns. round/date stamp when the value was measured (entries older than 2 rounds are refresh-eligible); seeded:true = recorded by a no-isolated-baseline rerun, provisional until a prev-tip worktree A/B (tools/bench_attrib.sh) confirms and the flag is removed.\",\n \"entries\":{\n  "
          + body + "\n}}\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] ledger write failed: ${e.getMessage}")
    }

  // r6 movers absolved (verdict item 6): restricted to the frozen
  // 23-query set (r5 JVM conditions), current code times
  // la_sessionize 0.393s / k1_polytrend_moments 0.423s — matching r5
  // (0.421/0.414) against r6's full-set 0.498/0.453. The r6 +18%/+9%
  // was JVM co-tenancy from the 14 added bench queries (JIT/code
  // cache/GC state shared across the run), not a code regression
  // (A/B n=3-min at sf0.1, 2026-08-13).
  private val benchNotes = "r15 OPTIMIZATION-round notes (read these before classifying r15->r16 movers): (D) CONTINUATION SESSION (post-snapshot 2d58a3c) intentional perf changes, NOT movers: ivfTopK dropped its provably-no-op wide-row dropDuplicates (pairs are unique: single-assign corpus x distinct probe cells; cosine now computed map-side, pair exchange carries 24-byte rows) -- sim_ivf_topk 4.68->1.41s, sim_index_pipeline 4.51->1.38s isolated sf0.1 (0.30x), probe_curve/auto_nprobe/mmr_ivf 0.87-0.96x, and at sf1 the OLD shape was INFEASIBLE in the 8 GiB fresh JVM (heap OOM once, disk-full shuffle spill on the repro) while the new shape completes (sim_ivf_topk 17.3s / sim_index_pipeline 50.6s warm isolated) -- sim_index_pipeline joins sf1Needs as a NEW row, not a mover; LPA rounds pick top-1 via max(struct(c,-l2)) aggregate instead of the row_number window (identical head; removes the Window operator + one WindowGroupLimit pass -- plans as a SortAggregate pair, g_lpa 0.89x/0.91x measured); ONE shared persisted degree table per graph query/suite (viewDegrees + degOpt threading -- six suite-arm degree scans collapse to one; n_edges reads sum(dg) div 2; pageRank persists its node table across iterations): g_ family 0.94x sf0.1 isolated A/B (g_kcore 0.80x, g_lpa 0.89x). Raw A/Bs in target/attrib/r15opt2_ab_*.jsonl; ledger re-stamped at the continuation tip. Post-bench addition at 4d657b2 (after the committed bench_full artifact): the corner pass's neighbor-array table is checkpointed once instead of final-aggregated once per probe join -- g_triangles 0.77x sf0.1 isolated, lcc parity over 4 reps; corner-pass ledger rows re-stamped there. TWO more measured negative results kept on record (do not retry): CC round fusion via lazy-persist neighbor-min (cache races recompute the subplan: sim_dbscan 1.11x, dd_cluster_components 1.25x -- reverted, note in connectedComponents), see also (C). History -- (A) GRAPH BUILD REWRITE — intentional perf change, NOT a mover: co-purchase edges/views now derive from ONE per-order collect_set basket aggregate + map-local pair expansion (GraphOps.baskets/copurchaseView; 2 exchanges where the old self-join chain paid 4-5), all 12 g_ registrations on FromLineitem forms; alternating prev-tip fresh-JVM A/B: g_ family total 0.82x at BOTH scales (g_triangles 0.44x sf0.1/0.66x sf1, g_pagerank 0.63x sf1; raw target/attrib/r15opt_graph_ab_*.jsonl), oracle 13/13 green, ledger re-stamped at 84d670e. (B) CC CONVERGENCE — intentional: connectedComponents tests fixpoint via the exact DECIMAL label-sum (labels are per-vertex non-increasing) instead of a per-round except, and dbscan feeds CC one edge direction (CC re-adds the swap): sim_dbscan@sf1 0.88x, p2 0.95x, dd_semdedup parity (raw target/attrib/r15opt_cc_ab.jsonl), ledger re-stamped at 8ddbb02. (C) MEASURED NEGATIVE RESULT kept on record: array<float> vector columns through the cell-join pair rows read 1.1-1.6x SLOWER with plan-identical arms (CPU-bound f2d conversion; raw target/attrib/r15opt_simcc_ab{,2}.jsonl) — implemented, measured, reverted same-session; do not retry. History — r15 notes: (0) ROTATION: three never-benched st_ twins join the headline (st_click_attribution / st_bloom_decontam / st_k_anon — per-user ordered attribution state, broadcast-bloom map-only gate, chained QI-bounded aggregations; first rows are NEW, not movers; sf0.1-only this round per the measure-the-shape-first convention). (1) LEDGER BACKFILL (r14 verdict #1): tools/isolated_ledger.json now carries a fresh-JVM isolated baseline for EVERY headline row above the suspect floor (173 rows backfilled at the clean r15 base tip cfbf825 via tools/ledger_backfill.sh — raw lines in target/attrib/r15_ledger_backfill.jsonl), so suspects self-adjudicate from the ledger even in rounds that touch wide-ownership files where the git leg is correctly useless (r14 shipped 11 needs-attribution rows for exactly this gap). (2) CHILD BUDGET: scales to 8 (was 3) and orders by SECONDS AT STAKE (now-prev, largest first) instead of class-then-ratio — the r14 children went to 0.86/1.35/3.9s rows while 17s and 16s movers shipped unexamined. (3) PER-ROW EXTERNAL LOAD (r14 verdict #4): 1-min /proc/loadavg sampled before each query's warm reps, shipped as load_queries in both blocks and load in isolated-mode lines — the r14 sweep ran under a co-tenant harness (55 min vs r13's 39) and the only record was prose; a reader can now discount rows measured under external load from the artifact alone. (4) the three r14 seeded ledger entries (t_temp_mix@sf0.1, sim_embed_drift@sf1, sim_mmr_ivf@sf1) cleared via the prev-tip worktree A/B protocol (alternating fresh JVMs, 5b49537 vs cfbf825: parity all three, raw in target/attrib/r15_seeded_ab.jsonl) — flags removed, values re-stamped round 15. (5) IVF PER-CELL OCCUPANCY CAP (r14 verdict #3): ivfTopK/dbscan/crossSplitLeakage cell joins grid-shard cells above cellCap=4096 (bit-identical results, per-task input bounded — Similarity.DefaultCellCap scaladoc; a first cut at 2048 bound on the pinned-16 sf1 baselines at 1.47-1.54x measured cost and was re-sized from that A/B, ATTRIBUTION_r15 par.6); no default-path plan change on refit-quantizer corpora. sim_ivf_probe_curve/sim_auto_nprobe now build ONE shared IVF index across their four probe arms (was four assignment passes) — parity at sf0.1 by alternating prev-tip A/B, 15.66->5.82s isolated at sf1: an improvement, not a mover. (6) FAILED ROWS SELF-ADJUDICATE (late r15 — the closing sweep's g_suite_on_view OOM'd in the shared 8 GiB sf1 block yet ran clean isolated at the same tip, and that verdict lived only in prose): each failed row now retries ONCE in a fresh child JVM after the parent context stops; the artifact's failed_retry object carries the verdict per name@sf (isolated-pass = shared-sweep resource pressure, not code, with the child's cold/warm/load; isolated-failure = real breakage; no-verdict = child spawn/10-min kill), the name STAYS in failed (the retry adjudicates cause, it does not substitute a row), a completed retry re-stamps the ledger, and exit code 2 is reserved for sf0.1 failures the retry could not absolve. The sf1 block also GCs before each row's cold pass now (async unpersists + ContextCleaner backlogs are the likely pressure source; never between warm reps) — expect sf1 shared numbers to read slightly more stable/lower from hygiene, not code. (7) GRAPH VIEW LAYOUT (late r15 — an intentional perf change, NOT a mover): the iterative graph ops' standing bidirectional edge view is now hash(src)-partitioned + sorted-within-partitions + PERSISTED (GraphOps.partitionedView; the suite's shared dd likewise), so src-keyed consumers reuse the cached layout instead of re-exchanging the edge table — g_lpa/g_modularity/g_pagerank/g_khop/g_kcore/g_assortativity/g_suite_on_view read AT OR BELOW their prior cost at both scales (alternating prev-tip fresh-JVM A/B, raw in target/attrib/r15_graphview_ab_*.jsonl; mechanism + forced-shuffle-regime measurement in target/graph_view_ab.json via graft.GraphViewAB — the persist boundary is load-bearing, a checkpoint drops the layout); affected ledger rows re-stamped at the change tip. History — r14 notes: (1) CODE-UNCHANGED ABSOLUTION (r13 verdict #1 — the last reason a judge rerun existed): the artifact now records its own measurement tip, and every suspect first intersects `git diff --name-only <prev-artifact-tip>` (plus untracked files) with the query's owned source paths (registry-membership-derived, deliberately over-inclusive; global deps: build.sbt, io/, functions/, model/, Guards, QueryRegistry, SparkEntry, GenScale). No owned file changed -> class context-code-unchanged, FINAL, no child JVM spent — settling exactly the six rows that shipped needs-attribution in r13. Rows that DO name changed files carry them in changed_files so the artifact says why it could not self-absolve. (2) SCALE-AWARE SUSPECT FLOOR + WARM>COLD GUARD (r13 verdict #2): sf1 suspects now require BOTH endpoints >= 2.0s (every r13 sub-2s sf1 suspect was shared-block noise on untouched code; sf0.1 keeps 0.2s) with a RELATIVE escape hatch so the floor can't hide a big regression on a small row (>=3x landing at >=1s is flagged even below the floor — the verdict's 'or a relative band'), and any row whose warm exceeds its own cold (physically backwards — co-tenancy-destroyed warm reps, the t_dsir_weights@sf1 59.45-vs-12.11 case) ships min(cold,warm) in the queries map with its original warm in the block's warm_gt_cold annotation. (3) LEDGER ROUND/DATE STAMPS + SEEDED FLAG (r13 verdict #5 + ADVICE): ledger entries now record the round and date they were measured (existing entries back-stamped from their tips); the child-budget priority is possible-regressions first, then refresh of >=2-round-stale entries a context absolution would lean on; entries seeded by a no-isolated-baseline rerun carry seeded:true and issue only provisional context-seeded absolutions (excluded from further child reruns — only a prev-tip worktree A/B can settle provenance and clear the flag). History — r13 notes: (1) SELF-ADJUDICATING SUSPECTS (r12 verdict #1 — two rounds running, the official artifact's 2-8x shared-run movers needed an out-of-band judge rerun to be absolved): every suspects row now carries its committed isolated-truth ledger value (tools/isolated_ledger.json: name@sf -> fresh-single-query-JVM warm + the git tip it was measured at; seeded from the r12 judge/ATTRIBUTION_r12 isolation runs) and an auto-classification — context (the isolated truth is NOT itself a >=1.5x mover vs the previous artifact: co-tenancy inflation or a previously-deflated baseline, not code), needs-attribution (no current isolated baseline), or regression/context from a FRESH rerun: after the sweep the parent SparkContext stops and the worst <=3 unadjudicated suspects rerun in sequential fresh child JVMs (the new SPARK_GRAFT_ISOLATE=name@sf single-query mode — same protocol as tools/bench_attrib.sh), their measured warm folded into the FINAL artifact and auto-merged into the ledger. Official sf0.1 runs only; SPARK_GRAFT_NO_RERUN=1 skips. Refinements from the r13 self-review: a ledger absolution is FINAL only when its recorded tip equals the current tip — older entries still classify (labeled context-stale-ledger) but stay child-rerun-eligible, so a regression introduced after the measurement cannot hide behind a stale baseline; fresh child verdicts compare against the LEDGER's isolated value when one exists (the previous SHARED value can be page-cache-deflated — the r12 g_lpa direction — and would otherwise produce false regression calls); forced dev reruns (SPARK_GRAFT_FORCE_RERUN) never write the ledger. (2) r12-ADVICE fixes: failed sf0.1 rows no longer write a -1.0 sentinel into the top-level queries map (name lands in failed, matching the sf1 block), and suspects require BOTH endpoints >= 0.2s. (3) two more streaming twins benched (st_session_window, st_psi_drift — STATEFUL-heavier probes of the constant-~1s AvailableNow-overhead hypothesis than r12's pair; session state and the day-by-bucket PSI grid grow with data). (4) new headline rows mm_byte_triage_agg + mm_format_sniff: read the mm_byte_triage/mm_byte_triage_agg PAIR as the explode-vs-bounded-aggregate price (r12 verdict #4) and mm_format_sniff as triage + one broadcast prefix join (verdict #5). mm_byte_triage itself is benched for the FIRST time this round (added after the committed r12 artifact) — its row is new, not a mover. (5) sim_split_leakage's sf1 row lands in the default sweep this round (the r12 sf1Needs edit misfired and was fixed post-run; RegistrySpec now asserts every bench name resolves). (6) late-r13: g_khop drops to ~0.7x its prior cost BY CODE — kHopReachOnView is frontier BFS now (per-hop distinct input falls from edges-sized to frontier-degree-sized; values identical, alternating fresh-JVM A/B in target/attrib/r13_khop_frontier_ab.json: warm 11.4-12.9 -> 7.5-10.3s) — an improvement, not a mover; ledger refreshed at the rewrite tip. Three more never-benched st_ twins rotate in (st_incremental_neardup / st_outer_join / st_frequent_ngrams — MinHash band state, stream-stream join state, vocabulary-sized complete-mode state; first two also at sf1), so their first rows are new, not movers; st_countmin_sketch joins as the BOUNDED-state counterpoint (sf0.1+sf1). (7) classifier refinement from this round's first self-adjudicating sweep: a child rerun with NO ledger entry now reports class no-isolated-baseline instead of regression/context — the fresh-isolated-vs-prev-SHARED comparison mislabeled three deflated baselines as regressions (sim_ivf_recall 0.63 shared prev vs 1.24 isolated at the SAME prev tip; prev-tip worktree evidence in ATTRIBUTION_r13 §8, raw JSONs target/attrib/r13_suspect_ab.json); the measured value still seeds the ledger so the NEXT sweep adjudicates finally. History — r12 notes: (1) SUITE REFIT TO THE DRIVER WINDOW (r11 verdict #1 — BENCH_r11 died rc=124 mid-sf1): the two declared-quadratic evidence rows (sim_dbscan_pinned16, uncapped dd_ngram_containment — ~10 min of the sf1 block across 3-4 executions each) moved behind SPARK_GRAFT_EVIDENCE=1 and out of the default sf1 sweep (their sf0.1 headline rows remain; their isolated sf1 evidence is committed in SCALE.md: 95.8s-vs-15.9s pinned16, 112s uncapped planner join), warm reps drop to 2 (sf0.1) / 1 (sf1) for queries whose cold run exceeds 10s, and every completed sf1 row now rewrites target/bench_full.json the moment it lands with the in-flight row named in sf1.running — a timeout kill can no longer erase completed rows or hide WHERE it struck. (2) failed runs no longer write a -1.0 sentinel into any queries map — the name goes in the block's failed list (r11 verdict #4 minor). (3) round-over-round attribution is now IN the artifact: suspects lists every >=1.5x warm mover vs the previous committed artifact (>=0.2s floor — sub-0.2s rows move 2.4-2.5x on shared-JVM co-tenancy alone; r11 verdict #6), so the attribution pass starts from the artifact. (4) NOT COMPARABLE r11->r12 for >10s-cold rows: their warm figure is now min-of-2 at sf0.1 / the single warm rep at sf1 — expect small upward noise on multi-second rows, which suspects absorbs via the 1.5x threshold. (5) two st_ streaming twins benched for the first time (st_incremental_dedup, st_embed_drift — read against dd_incremental / sim_embed_drift for the AvailableNow micro-batch overhead; r11 verdict #7) plus three new sampled-pool rows (sim_dbscan_sampled_recall, sim_kcenter_sampled, dd_minhash_recall_sampled — the md5-threshold sample makes the exact audit side (pct·n)^2, the first measured-recall rows executable at ANY scale; r11 verdicts #4/#5). (6) la_rfm_approx rises to its honest per-call cost this round — PersistLeakAuditSpec (new, verdict #8) caught its interval-table persist leaking across repetitions (the g_triangles class); isolated A/B 0.91s leaky vs 1.21s honest at sf0.1, pre-declared in ATTRIBUTION_r12.md. (7) g_lpa@sf1 attributed (verdict #2): HEAD 12.73s vs r10-tip 13.52s in fresh-JVM isolation — no regression; the r10 artifact's 8.30s was page-cache/JIT DEflation in the shared run (the inverse co-tenancy direction; multi-second lineitem-scan rows can read low when they run late in the big sweep). History — r11 notes: (1) ATTRIBUTION CLOSED (see ATTRIBUTION_r11.md, raw JSONs target/attrib/, tools/bench_attrib.sh): every r10 >=1.5x round-over-round query rerun in fresh single-query JVMs at HEAD vs the r9 tip under identical conditions — la_bh_fdr/la_cuped/ts_theil_sen/ts_chow_test/dd_threshold_curve_capped/g_pagerank@sf1 are at parity or FASTER than r9 (the 2.4-2.5x bench inflation was 105-query 8-GiB shared-JVM co-tenancy, the r6 lesson at r10 scale); mm_frame_overlap/dd_threshold_curve/dd_minhash_recall/sim_ivf_probe_curve run 1.19-1.27x r9 isolated BY DESIGN — their r9 versions leaked session-lifetime persists that CacheManager silently reused across min-of-3 (r9 timed a warm cache no production call sees); a SPARK_GRAFT_KEEP_BLOCKS=1 A/B shows the between-query hygiene share is only 0.01-0.35s, the rest is the eliminated leak. Zero real regressions; the five r10 weak flags clear. (2) per-query COLD times now durable next to warm (cold_queries at sf0.1 + sf1) so accounting-vs-regression reads from the artifact alone. (3) sim_dbscan default moved to the curve-picked p=4 (r10 verdict #2) AND the corpus-sized nlist=ceil(sqrt(n)) quantizer — NOT comparable to r10's p=1/pinned-16 rows; sim_dbscan_p1 keeps the old probe point, sim_dbscan_pinned16 keeps the pinned quantizer as the measured quadratic-trap evidence (95.8s vs 15.9s at sf1), and sim_dbscan_p2/sim_dbscan_auto complete the curve. (4) g_suite_on_view now contains triangles + local clustering on the shared view (5 ops, 5th arm 'tri') — compare against the 5-op standalone sum, not r10's 4-op row. (5) late-r11: the suite's tri+lcc arms now share ONE corner enumeration, and the shared intermediate is the NODE-sized per-node corner-count table streamed straight out of the corner pass (a first cut checkpointed the raw triangle-sized (x,v,w) corner set, whose GB-scale blocks OOM'd the shared bench JVM's sf1 block — corner counts carry everything both consumers need, n_triangles = sum(t) div 3); AND triangleSummary/triangleCountFromOriented's session-lifetime persist leak is fixed, which RAISES g_triangles to its honest per-call cost (isolated sf0.1 2.6 -> 6.6s, sf1 10.9 -> 21.4s): the old min-of-3 was reusing the leaked cached oriented table across repetitions via CacheManager plan-dedup — the same leak->honest conversion ATTRIBUTION_r11.md documents for mm_frame_overlap et al. With honest triangles the 5-op suite beats the 5-op standalone sum at both scales (corner-set-cut evidence: 18.5/83.9s vs ~27/~93s; this artifact's own suite rows are the corner-count numbers). (6) the committed target/bench_full.json (129 sf0.1 + 48 sf1 rows, zero failures) was generated before the last late-r11 entries landed (sim_pq_distortion and the st_* twins, which are never benched) - the driver's BENCH_r11 run covers the full headline; isolated sf0.1 sanity for the stragglers: t_ccnet_buckets 1.04s, dq_benford 0.42s, sim_pq_distortion 0.34s. History: r10 bench-context absolutions documented in ATTRIBUTION_r11.md; r7's 5 suspect regressions absolved by r8 min-of-3; BENCH_r07 was a crashed-JVM artifact"
}
