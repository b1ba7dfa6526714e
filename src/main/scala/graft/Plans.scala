package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool: dumps `explain("formatted")` for representative queries to
  * PLANS.md — the plan-review evidence (pushdown, broadcast, partial
  * aggregation, window group limits) the engine is tuned against.
  */
object Plans {
  val picks: Seq[(String, String)] = Seq(
    "q1_agg" -> "scan-heavy aggregate: filter + column pruning pushed to parquet, partial hash agg before one exchange",
    "f1_time_range" -> "temporal filter: PushedFilters on the scan (file/row-group pruning; partition pruning on a date-partitioned store)",
    "j_broadcast" -> "fact-dim join: dimension broadcast, no fact shuffle",
    "q5_local_supplier" -> "six-table join: region predicate pre-applied to BOTH fact inputs (broadcast semi-join on customer, name-carrying broadcast on supplier) so the fact pipeline carries the ASIA fraction only — a rewrite Catalyst can't derive across s_nationkey = c_nationkey; AQE re-plans at real scale",
    "t_topk_ngrams" -> "global heavy hitters: explode map-local, partial count before the single gram exchange, TakeOrderedAndProject top-k (no global sort)",
    "dd_semdedup" -> "semantic dedup: coarse-quantizer cells are the shuffle keys — pair generation is within-cell only, Σ|cell|² not n²",
    "sim_ivfpq_topk" -> "IVF-PQ: inverted-list equi-join prunes the scanned fraction; ADC ranks m-byte codes (raw candidate vectors never read)",
    "k1_polytrend" -> "kernel aggregation: composite + typed Aggregator ride keyed hash aggregations",
    "sim_cosine_topk" -> "top-k: WindowGroupLimit pushes rank<=k below the exchange",
    "la_sessionize" -> "sessionization: single user_id exchange shared by both windows",
    "asof_join" -> "as-of join: union + per-key window fill, one exchange on the key",
    "asof_join_native" -> "NATIVE as-of join (custom AsOfJoinExec): one exchange + sort per side, single-pass merge, no union/window",
    "rng_point_in_interval" -> "range join: bucketed to an equi join (no BroadcastNestedLoopJoin); residual range predicate after the hash join",
    "k1_polytrend_moments" -> "K1 via constant-size TypedImperativeAggregate: partial_polytrend_moments BEFORE the exchange (map-side combine), vs the Kryo-buffer variant shipping whole series",
    "dd_ngram_jaccard" -> "exact Jaccard with AllPairs prefix filter: gram-prefix equi-join + array_intersect verify, no quadratic frequent-gram blowup",
    "skew_join_naive" -> "hot-key shuffle join, UNSALTED: one reducer takes ~90% of the fact rows and their md5-agg work — the anti-pattern the salted variant fixes (sf0.1 bench: 1.45s vs 0.81s salted)",
    "skew_join_salted" -> "hot-key join, SALTED: join key becomes (k, salt), small side exploded over 32 salts — the hot key spreads across all reducers",
    "t_bm25_topk" -> "BM25 search: tf as codegen'd array filters (no explode), corpus stats reduce to ONE broadcast row, scoring pass is map-only, top-k via TakeOrderedAndProject — two corpus passes, zero wide shuffles",
    "t_inverted_index" -> "inverted index: one token-keyed exchange; postings via bounded_min_set (partial_bounded_min_set BEFORE the exchange — O(cap) state per key, vs collect_set's O(corpus) stopword buffer)",
    "t_temp_mix" -> "temperature mixing: stratum counts one map-combined agg, tiny quota table broadcast back, md5 rank windowed per stratum — never a global sort",
    "t_heavy_hitters" -> "guaranteed heavy hitters: partial_misra_gries caps every map-side partial at k entries BEFORE the exchange (the distinct vocabulary never shuffles); candidates broadcast back for the exact recount semi join",
    "dd_span_dedup" -> "span-level dedup: ONE tokenize->ngram->md5 pass; dup detection is a gkey-partitioned window (min!=max doc) — no groupBy+self-join recompute of the text pass — then a doc-keyed gaps-and-islands window; both exchanges carry 16-byte (pos,key) rows, never text",
    "dd_bloom_decontam" -> "bloom decontamination: eval set reduces to a DISTINCT bit-position table (<= m rows) BROADCAST to the corpus probe — the corpus never shuffles; flagged slice re-checked exactly against broadcast md5 membership",
    "t_countmin" -> "count-min sketch: the (row,bucket) groupBy IS the sketch merge — map-side partials cap the exchange at d*w counter rows per partition; probes join the 1024-row sketch broadcast",
    "t_quality_bins" -> "decile binning: percentile cut points in one single-row agg, broadcast cross join, map-local array compare — no global ntile() sort",
    "hybrid_search" -> "hybrid retrieval: BM25 stats reduce to one broadcast row, candidate set bounded at k=50 BEFORE the embedding join and both rank windows — O(k) re-rank, O(corpus) only in the two scoring passes",
    "ts_gapfill_locf" -> "gap-fill resample: per-key bounds agg -> map-local sequence explode -> left join observed -> ignoreNulls last over one keyed sort; grid generation never shuffles",
    "t_token_ids" -> "tokenize-to-ids (r7): vocab rank is the distributed two-phase form — one RANGE exchange on (c desc, tok) + intra-partition sort, per-partition ordinal read from monotonically_increasing_id (zero windows, zero extra exchanges), partition offsets a numParts-row literal map collected at build time — NO single-partition WindowExec anywhere; the id map joins the exploded token stream with no broadcast hint (size-based planning broadcasts whichever side actually fits)",
    "t_tfidf_topk" -> "TF-IDF keywords: (doc,term) and df counts both map-side combined; vocab-sized df join AQE-sized; rank window PARTITIONED by doc_id (state = per-doc distinct terms)",
    "la_quantiles" -> "exact quantiles on the x10^4 integer view (r7): partial_percentile before the one keyed exchange, per-group state bounded by 10^4*range(value) — constant in rows — instead of O(distinct doubles)",
    "t_url_canon" -> "URL canonicalization + blocklist: a single map-only projection — regex cascade, substring_index, literal IN — zero exchanges",
    "dd_incremental" -> "incremental ingest dedup: corpus side reduces to DISTINCT 8-byte digests (text never shuffles); incoming batch hashed once, null-safe hash joins; the steady-state mode where the digest table is the materialized state between ingests",
    "ingest_pipeline" -> "ingest composite: URL gate (map-only) -> digest anti-pattern dedup -> length gate -> TF-IDF tag, one lazy plan; the only text shuffle is the incoming batch's own doc_id join",
    "sim_kmeans" -> "Lloyd's k-means final assignment: centroids ride the task closure (map-only UDF projection, zero joins) — per refit iteration the only exchange is the k*dims-row (cell,dim) partial-avg aggregate; the corpus itself never shuffles",
    "t_budget_select" -> "token-budget selection: global prefix sum in the distributed two-phase form — RANGE exchange on (score desc, id), per-partition cumsum window PARTITIONED by spark_partition_id (no single-task collapse), offsets a numParts-row literal map",
    "dd_intradoc_clean" -> "intra-doc window cleanup: LINEAR explode+window chain (min over (doc,gram), covered-position explode, anti join, doc-keyed sorted collect) — never the O(len^2)-per-doc array_position rewrite; all windows keyed, no unpartitioned WindowExec",
    "la_scd2" -> "SCD2 history build (r7): all four gaps-and-islands steps (lag, running sum, rollup, lead) share ONE user-keyed exchange — look for a single Exchange hashpartitioning(user_id) feeding chained WindowExec/HashAggregate",
    "ts_ewma" -> "integer EWMA (r7): daily composite map-side combined first, then the aggregate() higher-order fold over the type-keyed sorted day array — the corpus reaches the fold only as day rows; no UDF, no unpartitioned window",
    "dd_novelty" -> "corpus novelty (r7): distinct 3-grams explode map-locally; first-occurrence is a map-combined min keyed by gram; membership join reuses the gram key — two gram exchanges, text never shuffles",
    "t_compaction_plan" -> "compaction planner (r7): bucket-keyed cumulative-size window + keyed rollup — one Exchange on the bucket, no global sort",
    "j_fuzzy_leven" -> "blocked fuzzy join (r7): DISTINCT names then a block-key equi join (candidates = Σ block², never n²); Levenshtein evaluates post-join, map-local",
    "ts_twa" -> "time-weighted average (r7): lead window and final aggregation share the single user-keyed exchange; trapezoid areas are map-local long products",
    "rng_spatial_join" -> "2-D spatial join (r7): boxes explode to grid cells, points own ONE cell — equi join on the composite cell key with residual containment; no BroadcastNestedLoopJoin",
    "dq_constraints" -> "DQ constraint audit (r7): five rules in ONE wide aggregate over a single scan (conditional sums map-combined) + stack unpivot — never five passes",
    "la_attribution" -> "multi-touch attribution (r7): purchases x 7-day click windows as a HASH join (user equi key, time residual) — the equi key keeps the planner off BNLJ; struct-min/max picks ride the same aggregation",
    "g_triangles" -> "triangle count via per-edge out-neighborhood intersection (r7): the broadcast neighbor-array table makes the count pass map-local — no wedge materialization (9.8s -> 3.4s at sf0.1); orientation caps arrays at O(sqrt m)",
    "t_vocab_growth" -> "Heaps'-law curve (r8): bucket assignment map-local off a 1-row max-id broadcast; both bucket tables derive from ONE (tok,bucket) partial-count aggregate — exchange reuse (ReusedExchange) gives a single corpus scan + single token exchange, regroups run on the vocab-sized table; cumulative sums are a bounded fold over the sorted collected ≤20-row list — no unpartitioned WindowExec",
    "t_zipf_slope" -> "Zipf fit (r8): vocab count is the one token-keyed exchange, top-100 via TakeOrderedAndProject, ranks from the single-row sorted-collect over the O(k) slice, regression aggregates 100 rows — no global sort, no unpartitioned window",
    "t_mix_epochs" -> "epoch-aware mixing (r8): map-ONLY — integer-exact md5 remainder threshold + sequence explode; zero exchanges, output bounded by Σ epochs(doc)",
    "la_rfm" -> "RFM segmentation (r8): per-user metrics map-combined on ONE user exchange; quintile cut points from a single-row percentile aggregate BROADCAST back — no global ntile() (an unpartitioned rank window collapses 10⁹ users onto one task); scoring is a map-local array compare",
    "dd_ngram_containment" -> "asymmetric containment (r8): sub-side PREFIX explode only vs super-side full posting lists on the gram key; exact array_intersect verify after the distinct candidate set — hot-shingle df is the documented skew hazard with the production df-cap trade",
    "sim_pair_margin" -> "hard-negative mining (r8): coarse cells are the join keys (within-cell pairs only, Σ|cell|² not n²); per-anchor max/count reduction map-combined; margins from bit-equal cosine folds",
    "ts_holt" -> "Holt smoothing (r8): daily composite map-combined first, then the two-register (level, trend) integer fold over the type-keyed sorted day array — same one-exchange contract as ts_ewma, no UDF, no unpartitioned window",
    "dd_impact_report" -> "dedup impact report (r8; r9 digest widened): digest groupBy + join carry 16-byte md5 keys (text never shuffles; 64-bit collisions mis-merged clusters at 10^9 docs), final aggregate is sources-sized",
    "t_split_leakage" -> "split-leakage gate (r8): gram digests shuffle once; test-side distinct digest set joins the train side; output is ONE summary row via two tiny broadcast crosses",
    "dd_ngram_containment_capped" -> "containment with the production df cap (r9): per-gram df table equi-joined back (one row per gram — linear, never pair-producing) drops hot shingles from BOTH candidate sides before the prefix x posting join; exact verify unchanged — the bounded-recall escape from the uncapped twin's hot-shingle skew",
    "la_rfm_approx" -> "RFM scale path (r9): approx_percentile cut points (GK summaries — state bounded by the accuracy knob, NOT by domain cardinality) replace the exact twin's O(users) percentile map in the final agg task; monotonicity audit runs on the <=15-row (metric,score) interval table, never an unpartitioned user sort",
    "pipeline_polytrend" -> "the reference's end-to-end user journey as ONE plan (r9): F1 temporal filter pushed to the parquet scan, composite groupBy is exchange #1, F4 quality gate + K1 kernel + min ride exchange #2 as a single aggregation, stats collapse to a 1-row final agg — zero extra exchanges between stages",
    "la_gini" -> "gini concentration (r9 single-action form): RANGE exchange tiles the ascending order, cumsum window PARTITIONED by spark_partition_id, and ONE numParts-row groupBy(pid) collect closes the global prefix sum — offsets and sums from the same job, so RangePartitioner sampling drift between jobs cannot skew the result",
    "dd_incremental_neardup" -> "incremental NEAR-dup ingest (r9): the corpus contributes 256-byte signatures only (band keys re-derive map-side, no text pass, no corpus re-read); candidates are per-side-capped (band,bucket) equi joins — batch x corpus and batch x batch — and only surviving pairs fetch signatures for the dyadic agreement verify; per-ingest cost O(batch), never O(corpus)",
    "sim_index_pipeline" -> "shared IVF index composite (r9; r15 opt): ONE eagerly-materialized cell assignment (localCheckpoint — GC-freed, not a session persist) feeds BOTH the retrieval probe join and the within-cell margin pairs — one less full embedding pass per consumer; look for the checkpoint scan reused by both arms. r15: ivfTopK's legacy dropDuplicates was a provable no-op (single-assign corpus × distinct probe cells — a pair meets in at most one cell) and its exchange carried both dims-long arrays per pair row; cosine now computes map-side and only (query_id, cand_id, cosine) reaches the top-k window exchange (plans/r15/sim_ivf_topk_*: 8→6 Exchange; the old shape OOM'd the 8 GiB fresh JVM at sf1, the new one runs it)",
    "t_cdc_chunks" -> "content-defined chunking (r9): boundary flags are a map-local transform (native codegen'd rolling_hash per window — no UDF); chunk ids ride ONE doc-keyed cumsum window and assembly the doc-keyed sorted collect (spanDedup's exchange contract, state bounded by one doc's length); chunk fingerprints are md5 — chunk-level dedup joins carry 16-byte keys",
    "t_dsir_weights" -> "DSIR importance weights (r9): feature counts map-combined with state <= hashBuckets; the bucket-bounded µ-nat LLR table BROADCASTS to the exploded token stream (corpus text never shuffles); per-doc scores reduce map-side as exact BIGINT sums — two token exchanges total, both model-bounded or doc-keyed",
    "t_winnow" -> "winnowing fingerprints (r9): gram hashes map-local; rightmost-minimal selection is max(struct(-h, p)) over the w-row sliding frame of ONE doc-keyed sort — a single Exchange, and the distinct + per-doc summary aggregations reuse its partitioning (no second exchange until the tiny ng join)",
    "t_gopher_rules" -> "rule-flag quality gate (r9): one map-only token-array projection (every rule an integer cross-multiplication inside codegen) -> one map-combined per-source aggregate — zero wide shuffles, output = sources",
    "la_spearman" -> "Spearman rank correlation (r9): the joint (value,hour) grid count is the ONLY corpus-sized pass (map-combined); marginal 2x-avg-ranks ride per-type cum windows over the BOUNDED grid; both rank maps join back AQE-sized; final reduce is exact DECIMAL(38,0) — ranks never touch a global row sort",
    "t_quality_auc" -> "ROC AUC (r9): la_mannwhitney's bounded-grid rank-sum shape on documents — per-source score-grid counts, cum window over the grid (state = score domain, not docs), one DECIMAL(38,0) reduce; no per-doc rank window anywhere",
    "t_ndcg" -> "nDCG (r9): two BM25 corpus passes with the stats row broadcast back, retrieved and ideal sides both cut by TakeOrderedAndProject heaps; the rank windows run over <= max(cutoff) rows; per-rank gains round to integer µ-units so the cutoff sums are order-free",
    "g_khop" -> "FRONTIER BFS (r13; r9 shape): per hop ONE edges-probe join against only the nodes FIRST reached last hop (AQE broadcasts the frontier while it fits), a frontier-degree-sized distinct, and a node-sized anti-join vs the seen set — the per-hop distinct no longer scales with cumulative reach (A/B: warm 11.4-12.9 -> 7.5-10.3s at sf0.1); lazy per-hop persists fold all counts into a single job; steady-state callers amortize the dominant copurchase build via kHopReachOnView",
    "g_lpa" -> "label propagation (r9; r15 layout + opt): per round one edge-label join + (node,label) map-combined count + per-node top-1 as a max(struct(c,-l2)) SortAggregate pair (r15 continuation — replaces the row_number window; identical head, removes the Window operator and one WindowGroupLimit pass, plans/r15/_lpa_round_*); deterministic ties -> the chained SQL oracle replays every round bit for bit; the standing edge view is hash(src)-partitioned at build, so past the broadcast regime each round's shuffle-join moves ONLY the node-sized label table — the edge table never re-exchanges",
    "g_local_clustering" -> "local clustering histogram (r9): corner counts ride the degree-ordered triangle enumeration (orientation caps out-neighborhoods at O(sqrt m)); after the corner count everything is the 11-bucket rollup — nothing graph-sized downstream",
    "g_modularity" -> "LPA modularity (r9; r15 layout): e_in is ONE edge-sized membership equi join with a map-combined count; d_c sums are community-sized; the Q quotient is a single-row DECIMAL reduce — the partition-quality score costs one extra join over g_lpa; the src-keyed half of the membership join and the degree aggregate reuse the hash(src) view layout",
    "la_kruskal_dunn" -> "Kruskal-Wallis/Dunn ranks (r9): state after the first exchange is the x10^4 VALUE GRID, not the corpus; the global-grid cumsum is the one single-partition window (domain-bounded by construction); per-group z-rows avoid any cross-group float sum",
    "dd_minhash_recall" -> "LSH recall audit (r9): both arms are the EXISTING bounded pipelines (banded minhash, prefix-filtered exact Jaccard); the audit itself is one full-outer pair join + a single-row count aggregate",
    "dd_threshold_curve" -> "Jaccard threshold curve (r9): ONE AllPairs candidate pass at the lowest threshold feeds the exact-decile histogram; integer cross-multiplied buckets, <=6-row cumulative window",
    "mm_frame_overlap" -> "frame-fingerprint near-dup (r9): rolling-hash fingerprints map-local, the posting self-join keys on frame_fp (the LSH band-join contract, df-cap knob for boilerplate frames), overlap arithmetic exact integer ppm",
    "sim_embed_drift" -> "embedding drift monitor (r10): ONE (half, dim) map-combined integer-µ aggregate — post-shuffle state is 2·dims rows; the centroid cosine derives from the exact integer sums, so the drift alert is bit-stable across cluster layouts (FP summation order can never flap it)",
    "sim_dbscan" -> "DBSCAN (r10; r11 default = curve-picked p=4 at the corpus-sized nlist=ceil(sqrt(n)) quantizer): the eps-graph is the ONLY corpus-sized stage and it joins within coarse-quantizer cells (cell is the shuffle key — Σ|cell|² ≈ p²·n^1.5 pairs at √n cells, never n²); the multi-probe assignment is checkpointed ONCE (it feeds both eps-join sides + the noise remainder); degree filter and border attachment reuse the checkpointed edge set; CC runs on the (much smaller) core subgraph with pointer jumping",
    "sim_mmr_topk" -> "MMR re-rank (r10): the corpus appears only in the pool-building scan; every greedy step is a poolSize-bounded join + (query,cand) max-sim aggregate + per-query top-1 window — k steps of bounded work, source-agnostic (swap the brute pool for ivfTopK candidates at scale)",
    "g_suite_on_view" -> "structural graph suite on ONE shared view (r10; r11 widened to FIVE ops): the copurchase self-join + distinct — the dominant per-call cost of g_kcore/g_local_clustering/g_modularity/g_assortativity/g_triangles standalone — builds ONCE as an eager localCheckpoint that all five ops consume (triangles/local-clustering orient by FILTERING the bidirectional view — one count aggregate, no degree-join rebuild). The final plan shows the checkpointed RESULT scans union'd; the sharing evidence is upstream — one edge-view job instead of five rebuilds — and shows up as the bench row running well under the sum of the standalone rows. r15 continuation: the arms additionally share ONE persisted node-degree table (viewDegrees + degOpt — kcore round 1, orientation, lcc, modularity d_c + LPA node init, assortativity, tri wedge/edge counts all read it; six edge-view aggregations collapse to one) — suite 60.4→41.8 s isolated at sf1 (0.69×)",
    "sim_mmr_ivf" -> "MMR over the IVF-FED pool (r11, the at-scale path): the corpus-sized stage is the bucketed inverted-list equi join inside ivfTopK (cell is the shuffle key) — NO broadcast crossJoin, no Guards-gated brute scorer anywhere in the plan; the greedy steps are identical to sim_mmr_topk's poolSize-bounded joins. Look for the checkpointed assignment scan feeding both the query and candidate arms, then the bounded greedy chain",
    "sim_dbscan_auto" -> "curve-driven probe pick (r11): three measured curve arms (each a cell-keyed overlap join against the ONE checkpointed exact pair set) reduce to 3 driver rows; the pick is Similarity.curvePick — the same audited knee rule as autoNprobe — and the returned plan is a 1-row LocalRelation; the exact side is the declared Guards-gated audit, sampled at scale",
    "t_lm_heldout" -> "held-out CCNet-style LM filter (r11): the corpus appears in ONE tokenize+explode pass; the model tables (c12/c1/V, built from the md5-even half only) are model-sized aggregations that join back LEFT with no broadcast hint (AQE sizes them), V rides a one-row broadcast; all arithmetic is long div — look for the absence of any corpus×corpus join and the two map-combined token-keyed exchanges",
    "dd_source_overlap" -> "cross-source contamination matrix (r11): the ONLY corpus-sized stage is the (gram, source) DISTINCT over 8-byte xxhash64 keys (one eager checkpoint feeding three arms); after it every gram appears at most |sources| times, so the gram self-join's per-key fan-out is |sources|²-bounded BY CONSTRUCTION — the plan shows two scans of the SAME checkpointed RDD joined on g, two map-combined aggregates, and a sources²-sized result; no df cap because the bound is structural, not assumed",
    "sim_dbscan_pinned16" -> "DBSCAN at the PINNED quantizer — the quadratic-trap evidence row (r11; the pre-swap headline): 16 cells at p=4 probes is sum(|cell|^2) ~ n^2 by construction (measured sf1: 401M vs 46M in-cell pairs, 95.8 s vs 15.9 s against the sqrt(n) default); same checkpointed-assignment plan shape as sim_dbscan — the plan shows the eps self-join reading two scans of the SAME checkpointed RDD, never two UDF re-evaluations; the row exists so the pinned-vs-scaled pair stays measured every round",
    "dq_k_anon" -> "k-anonymity audit (r11): two chained hash aggregations — the QI-class count is map-combined before its one exchange, and the per-type rollup runs on the QI-domain-bounded class table (|types|·24·|buckets| rows, constant in corpus size); no joins, no windows, the events scan reads three columns",
    "dd_url_dedup" -> "URL-level dedup (r11): one exchange on the canonical URL for the class aggregate (map-combined min/count), then the class→member join back — AQE sizes the class side, the residual is an 8-byte compare; the synth+canon cascade is map-local regex work shared verbatim with t_url_canon",
    "t_unimax_mix" -> "UniMax capped mixture (r11): the corpus appears ONLY in the per-source token aggregate (map-combined before its one exchange); the water-filling closed form — rank window, prefix sum, boundary aggregate — runs entirely on the |sources|-row table with two 1-row broadcasts, so the unpartitioned window is model-sized by construction",
    "t_fim_split" -> "FIM split prep (r11): map-ONLY — one native splitmix64 projection, two mod-(n+1) cuts, array slice + md5; zero exchanges, fuses into the preceding scan",
    "t_domain_reweight" -> "DoReMi-linearized domain reweighting (r11): the corpus appears ONLY in the (lang, token) map-combined count — per-token and per-domain totals derive from that vocab×domains MODEL table (look for the single token-keyed Exchange; everything above it is model-sized joins), and the EG update runs on |domains| rows with the normalizer as an unpartitioned window over the AGGREGATED frame (model-sized by construction, not a corpus sort)",
    "t_seqlen_curve" -> "sequence-length planning curve (r11): per-doc token count is one LONG column, the 5-row candidate table is BROADCAST — the plan shows BroadcastNestedLoopJoin over a single-column projection (a deliberate map-side ×5 of 8-byte rows, never text) feeding ONE map-combined aggregate; zero corpus-keyed exchanges",
    "dd_lsh_plan" -> "LSH (bands,rows) planner (r11): the corpus-sized stage is the threshold-curve's AllPairs prefix join at minJaccard=0.3 (its cost floor); the S-curve math — fixed-point square-and-floor powers, DECIMAL(38,0) mass sums — runs on <=100 histogram rows × 6 broadcast configs; look for the histogram aggregate between the pair stage and a tiny BNLJ",
    "sim_proto_prune" -> "prototypicality pruning (r11): the kmeans assignment is ONE eager checkpoint read by both the (cell,d2) value-grid histogram and the final flag join — no UDF re-evaluation; the per-cell cumulative window runs over the GRID (state = distinct distances per cell, never vectors — the la_quantiles contract), cutoffs broadcast back as a k-row table; look for the checkpoint scan feeding two arms and the absence of any corpus-wide rank sort",
    "sim_kcenter" -> "greedy k-center coreset (r11): the final returned plan is a k-row LocalRelation (the sim_dbscan_auto pattern — the greedy ran as k-1 TakeOrderedAndProject scans of one checkpointed projection at build time, each a single driver row; no shuffle, no global sort anywhere in the per-step plans)",
    "sim_binary_topk" -> "binary-quantization Hamming top-k (r11): sign-bit codes are map-only codegen'd bit algebra (aggregate/shiftleft — no UDF, two 32-bit halves); the query side BROADCASTS (bounded query set) so the corpus never shuffles, distance is popcount(xor) inside codegen, and the per-query rank is a WindowGroupLimit below the single exchange — the brute-cosine plan shape at 16 bytes/vector instead of 256",
    "sim_dbscan_sampled_recall" -> "hash-sampled recall audit (r12, r11 verdict #4): the md5-threshold sample is a MAP-SIDE Filter directly over the scan (look for the conv(substring(md5..)) predicate with no exchange below it) — the exact self-join then reads two scans of the SAMPLE, so its pair volume is (n/4)² by construction; the quantizer centers came from the FULL corpus at build time (TakeOrderedAndProject, √n rows); the audit's only corpus-sized stage is that one center pick",
    "sim_kcenter_sampled" -> "k-center over the preselected pool (r12, r11 verdict #5): same k-row LocalRelation return as sim_kcenter — but every build-time greedy scan read the hashSample FILTERED projection (the corpus appears only in the map-side md5-threshold filter feeding the one checkpoint), so the k−1 top-1 heaps priced the pool, not the corpus",
    "mm_byte_triage" -> "pre-decode payload triage (r12): ONE Generate (the codegen'd byte explode) into a (doc, byte) hash aggregate with map-side partial combine — the byte-grain stage shows partial+final HashAggregate around its Exchange — then the doc-keyed rollup (SortAggregate pair: the struct-max tiebreak is not hash-aggregable) over the ≤256-row/doc histogram; the second exchange moves histogram rows, never bytes; no UDF, one corpus pass",
    "sim_split_leakage" -> "semantic cross-split contamination (r12): the assignment checkpoint is scanned TWICE (train filter / eval filter — look for two Scan ExistingRDD arms meeting at one cell-keyed join), exact cosine evaluates only on cell candidates, and the per-eval rank is a bounded window above the join — train×eval brute force appears nowhere",
    "mm_byte_triage_agg" -> "bounded-state triage twin (r13, r12 verdict #4): ONE ObjectHashAggregate pair (partial+final around the doc-keyed Exchange) running graft.functions.ByteTriageAgg — NO Generate anywhere: the per-byte explode is gone, one row per payload flows through the plan and the aggregate buffer holds the 256-slot histogram; compare against mm_byte_triage's Generate + two-aggregate shape",
    "mm_format_sniff" -> "magic-byte format sniff (r13, r12 verdict #5): the prefix arm is a BroadcastHashJoin against the 13-row magic table over a map-only substring projection (the corpus never shuffles on content), joined doc-keyed back to the triage histogram rollup; look for exactly one broadcast exchange (the magic table) and the triage sub-plan unchanged beneath it",
    "dd_minhash_lsh_star" -> "star-mode MinHash-LSH (late r13): the viral-family fix — alongside the capped (band,bucket) self-join, hot buckets (> maxBucket) feed a hub aggregate (min doc_id + count) whose members join back as hub->member rows; look for the SAME one band-key exchange feeding both the small-bucket pair join and the hub arm, the union below the distinct, and NO pair join over the hot population (k-1 star rows per hot bucket by construction — the signature fetch and est filter sit above the union, shared with the plain form)",
    "st_heavy_hitters" -> "streaming guaranteed heavy hitters (r14, r13 verdict #4): the printed plan is the batch RECOUNT probe — a BroadcastHashJoin LeftSemi of the corpus gram explode against the <=k MG candidates (exploded from the memory sink the streaming build wrote), one map-combined gram aggregate, and a 1-row total broadcast for the threshold gate; the streaming build itself ran one global ObjectHashAggregate (MisraGriesAgg — k counters of state) to completion before this plan exists. Look for: the semi join BROADCAST on the candidate side (never the corpus), and no second corpus-wide exchange")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("plans_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of representative queries\n\n")
    sb.append("Generated by `sbt \"runMain graft.Plans\"` at " +
      s"`$dir`. What to look for per query is noted above each plan.\n")
    picks.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n_${why}_\n\n```\n")
      // keep the operator tree; drop the verbose per-node detail section
      sb.append(plan.split("\n\n").head)
      sb.append("\n```\n")
    }
    appendBucketedEvidence(spark, dir, sb)
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${picks.size} plans + bucketed evidence)")
    spark.stop()
  }

  /** Disk-bucketed layout evidence (SURVEY §4 / SCALE.md): once the
    * observation store is bucketed on the pixel key, the per-pixel join
    * AND the composite aggregation plan with NO Exchange on the bucketed
    * side — the per-query shuffle became a one-time ingest cost.
    */
  private def appendBucketedEvidence(spark: SparkSession, dir: String,
      sb: StringBuilder): Unit = {
    import org.apache.spark.sql.functions._
    val obs = graft.pipeline.TrendPipeline.eventsAsObservations(spark, dir)
    graft.io.ObservationStore.writeBucketed(obs, "plans_obs_bucketed",
      buckets = 8)
    obs.withColumn("pixel_id", graft.io.ObservationStore.pixelId(
        col("longitude"), col("latitude")))
      .groupBy("pixel_id").agg(avg("value").as("mean_v"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "pixel_id").sortBy("pixel_id")
      .saveAsTable("plans_res_bucketed")
    val store = graft.io.ObservationStore.readBucketed(
      spark, "plans_obs_bucketed")
    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).split("\n\n").head
    val joined = store.hint("merge").join(
      spark.table("plans_res_bucketed"), Seq("pixel_id"))
    sb.append("\n## bucketed store: per-pixel join (disk-bucketed both sides)\n\n" +
      "_ObservationStore.writeBucketed buckets on the derived BIGINT " +
      "pixel_id (doubles are un-bucketable join keys: Spark normalizes " +
      "NaN/-0.0 on them and disables the bucketed scan). The merge join " +
      "below has NO Exchange on either side — only sorts over " +
      "pre-bucketed scans. Broadcast is hinted off so the layout, not the " +
      "planner, removes the shuffle._\n\n```\n" + fmt(joined) + "\n```\n")
    val agg = store.groupBy(col("pixel_id"))
      .agg(avg("value").as("v"), first("longitude").as("longitude"),
        first("latitude").as("latitude"))
    sb.append("\n## bucketed store: composite aggregation (no Exchange)\n\n" +
      "_The A1 composite keyed by the bucket column aggregates straight " +
      "off the bucketed scan._\n\n```\n" + fmt(agg) + "\n```\n")
    appendRuntimeFilterEvidence(spark, dir, sb)
  }

  /** Runtime Bloom-filter evidence: Spark 4 injects a bloom filter from
    * a selectively-filtered join side into the fact scan — but only
    * when the application-side scan exceeds
    * `runtime.bloomFilter.applicationSideScanSizeThreshold` (10 GB
    * default), so it never fires at test scale. This section lowers the
    * thresholds to prove the engine's join shapes are ELIGIBLE: at
    * 100 TB the default thresholds activate exactly this plan.
    */
  private def appendRuntimeFilterEvidence(spark: SparkSession, dir: String,
      sb: StringBuilder): Unit = {
    import org.apache.spark.sql.functions._
    val thr = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val bct = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(thr)
    val oldB = spark.conf.get(bct)
    // broadcast off: the rule only injects into shuffle joins (a
    // broadcast join already prunes at the probe) — at 100 TB a
    // fact-fact join is a shuffle join and this is the real plan
    spark.conf.set(thr, "0")
    spark.conf.set(bct, "-1")
    try {
      val orders = graft.io.Tables.load(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val line = graft.io.Tables.load(spark, dir, "lineitem")
      val joined = line.join(orders,
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val fired = plan.contains("might_contain")
      sb.append("\n## runtime Bloom filter: selective dim -> fact scan\n\n" +
        "_A selective filter on orders creates a runtime bloom filter " +
        "applied to the lineitem scan (`might_contain(...)` below) " +
        "before the join — rows for non-urgent orders are dropped at " +
        "the scan, not at the join. Fires above the 10 GB " +
        "application-side threshold in production; threshold lowered " +
        s"here to capture the plan. Fired: $fired._\n\n```\n" +
        plan.split("\n\n").head + "\n```\n")
      assert(fired, "runtime bloom filter did not fire — plan shape regressed")
    } finally {
      spark.conf.set(thr, old)
      spark.conf.set(bct, oldB)
    }
  }
}
