package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible dataset splitting and sampling for training pipelines
  * (SURVEY §7.5): hash-based splits are stable across runs, engines and
  * cluster layouts — membership is a pure function of the id, never of
  * partitioning or RNG state.
  */
object Sampling {

  /** Deterministic bucket in [0, 100) from the id's md5 — portable
    * across engines (DuckDB computes the identical bucket from the same
    * hex digest, see the `t_hash_split` oracle).
    */
  def hashBucket(idCol: String): org.apache.spark.sql.Column =
    (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long") % 100).cast("int")

  /** Deterministic md5-threshold sample (r11 verdict #4): keep the rows
    * whose [[hashBucket]] falls below `pct` — a MAP-ONLY filter (no
    * shuffle, no RNG, no count action), replayed identically by DuckDB
    * from the same hex digest. This is the scale lever for every
    * O(n²) audit baseline: an exact side computed on a pct% sample
    * prices (pct/100 · n)² pairs instead of n², and because a pair's
    * detection indicator (same-cell, same-band, …) is a pure function
    * of the pair itself, the sampled recall is an unbiased estimate of
    * the full-corpus recall — a pair survives sampling iff both
    * endpoints do, which is uniform over pairs (SCALE.md,
    * "sample-size vs confidence").
    */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame = {
    require(pct >= 1 && pct <= 100, s"sample pct out of range: $pct")
    df.filter(hashBucket(idCol) < pct)
  }

  /** Train/test split: bucket < trainPct ⇒ train. */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int): DataFrame =
    df.withColumn("bucket", hashBucket(idCol))
      .withColumn("split",
        when(col("bucket") < trainPct, "train").otherwise("test"))

  /** Stratified sample via per-stratum fractions (seeded Bernoulli;
    * Spark-side reproducible, not cross-engine — no oracle).
    */
  def stratifiedSample(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** Deterministic stratified sample: membership is a pure function of
    * the row id (md5 bucket < fraction·100), so the sample is identical
    * across engines, runs, and cluster layouts — the property training
    * pipelines actually need (sampleBy's RNG is only run-reproducible).
    * Fractions are resolved per stratum; unlisted strata are dropped.
    */
  def deterministicStratifiedSample(df: DataFrame, strataCol: String,
      idCol: String, fractions: Map[String, Double]): DataFrame = {
    val pctExpr = fractions.foldLeft(lit(-1.0)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f * 100)).otherwise(acc)
    }
    df.withColumn("__pct", pctExpr)
      .filter(hashBucket(idCol) < col("__pct"))
      .drop("__pct")
  }

  /** Weighted sampling without replacement (Efraimidis & Spirakis
    * 2006): rank rows by key = u^(1/weight) with u uniform in (0,1),
    * keep the top k — inclusion probability proportional to weight,
    * no per-stratum bookkeeping. u comes from a 48-bit md5 prefix of
    * the id, NOT an RNG, so the sample is a pure function of the ids:
    * identical across engines, runs and cluster layouts, and the
    * top-k runs as TakeOrderedAndProject (per-partition heaps merged
    * on the driver — no global sort at any scale).
    *
    * The key is float; md5-derived u values are spread over 2^48 so
    * the k-boundary gap is astronomically unlikely to sit within one
    * ulp of a cross-engine pow() difference. The key itself is not
    * emitted — output stays integer/string-typed for exact compares.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
      .cast("double") / lit(281474976710656.0) // 2^48
    df.withColumn("__key", pow(u, lit(1.0) / col(weightCol)))
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .drop("__key")
  }

  /** Temperature-scaled mixture sampling (the multilingual/multi-source
    * α-sampling of mC4 / XLM-R): stratum s gets a quota ∝ n_s^α of the
    * total `budget`, flattening the head sources and boosting the tail,
    * then quota members are chosen by md5 rank so the selection is a
    * pure function of the ids.
    *
    * Exactness contract: α is fixed at 0.5 and the weight is the
    * INTEGER sqrt `floor(sqrt(n_s))` — IEEE sqrt is correctly rounded
    * on every engine, floor makes it an exact integer, and the weight
    * sum + quota split are then pure integer arithmetic (`div`), so
    * quotas are identical across engines and cluster layouts with no
    * float-summation order sensitivity (a general-α `pow` would hit
    * the 1-ulp libm/JVM divergence).
    *
    * Shape for scale: stratum counts are one map-side-combined
    * aggregate; the quota table is strata-sized (tiny) and broadcast
    * back; the md5 rank is one window shuffle partitioned BY STRATUM —
    * never a global sort.
    */
  def temperatureMix(df: DataFrame, strataCol: String, idCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val counts = df.groupBy(strataCol)
      .agg(count(lit(1)).as("n_s"))
      .withColumn("w", floor(sqrt(col("n_s").cast("double"))).cast("long"))
    val total = counts.agg(sum(col("w")).as("tw"))
    val quotas = counts.crossJoin(broadcast(total))
      .select(col(strataCol), col("n_s"),
        expr(s"($budget * w) div tw").as("quota"))
    val rk = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("rk", row_number().over(rk).cast("long"))
      .join(broadcast(quotas), Seq(strataCol))
      .filter(col("rk") <= col("quota"))
  }

  /** Epoch-aware dataset mixing: replicate each document to its
    * source's target epoch count — the standard pre-training recipe
    * step where a high-value source runs >1 epoch (e.g. 2.5×) and a
    * low-value one is downsampled (<1×). Integer copies are exact;
    * the fractional remainder is resolved per document by comparing a
    * 48-bit md5 draw against the remainder in TENTHS via pure integer
    * arithmetic (u48·10 < tenths·2^48) — no float thresholds, so the
    * keep/drop decision is a bit-exact pure function of the ids on
    * any engine or cluster layout.
    *
    * `weightTenthsSql` must be a SQL expression yielding the target
    * epochs ×10 as an integer (e.g. 25 = 2.5 epochs). Scale shape:
    * entirely map-local — no shuffle, no state; output size is
    * Σ epochs(doc) rows by construction.
    */
  def epochMix(df: DataFrame, idCol: String,
      weightTenthsSql: String): DataFrame = {
    val u48 = conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
      .cast("long")
    df.withColumn("wt", expr(weightTenthsSql).cast("int"))
      .withColumn("u48", u48)
      .withColumn("n_copies",
        expr("CAST(wt div 10 + CASE WHEN u48 * 10 < (wt % 10) * 281474976710656 THEN 1 ELSE 0 END AS INT)"))
      .filter(col("n_copies") >= 1)
      .withColumn("copy", explode(sequence(lit(1), col("n_copies"))))
      .drop("wt", "u48")
  }

  /** UniMax capped-mixture allocation (Chung et al. 2023 "UniMax:
    * Fairer and More Effective Language Sampling"): distribute a total
    * token budget B = tokens·budgetNum/budgetDen across sources, each
    * capped at cap_s = tokens_s·capNum/capDen, via the water-filling
    * closed form — allocation_s = min(cap_s, w) with w chosen so the
    * allocations sum to B (up to the < n-token floor remainder).
    *
    * Fully integer, so the oracle replays it exactly: sort sources
    * ascending by cap, prefix-sum; source i is capped iff
    * cap_i·(n−i) ≤ B−P_i. The test is monotone along the sort (for
    * j < i, B−P_j − cap_j·(n−j) ≥ B−P_i − cap_i·(n−i) since every
    * summand removed is ≥ cap_j), so the capped set is a prefix and
    * max(capped i) is the boundary k; uncapped sources get
    * w = (B−P_k) div (n−k).
    *
    * Scale: the corpus appears only in the caller's per-source token
    * aggregate; everything here runs on the |sources|-row table, so
    * the unpartitioned rank window is model-sized by construction
    * (a few thousand rows at 100 TB, never the corpus).
    *
    * @param perSource frame with `source` and per-row `toks` columns
    *                  (pre-aggregated or raw — summed here either way)
    */
  def unimaxMix(perSource: DataFrame, capNum: Long, capDen: Long,
      budgetNum: Long, budgetDen: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = perSource.groupBy("source").agg(sum("toks").as("T"))
    val c = t.select(col("source"), col("T"),
      expr(s"T * ${capNum}L div ${capDen}L").as("cap_tokens"))
    val b = c.agg(
      expr(s"sum(T) * ${budgetNum}L div ${budgetDen}L").as("B"),
      count(lit(1)).as("n"))
    val w = Window.orderBy(col("cap_tokens"), col("source"))
    val o = c
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("P", sum("cap_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val f = o.crossJoin(broadcast(b))
      .withColumn("capped",
        (col("cap_tokens") * (col("n") - col("i")) <=
          col("B") - col("P")).cast("int"))
    val k = f.agg(
      coalesce(max(when(col("capped") === 1, col("i"))), lit(0L)).as("nk"),
      coalesce(max(when(col("capped") === 1, col("P"))), lit(0L)).as("pk"))
    f.crossJoin(broadcast(k))
      .withColumn("allocation",
        when(col("capped") === 1, col("cap_tokens"))
          .otherwise(expr("(B - pk) div greatest(n - nk, 1L)")))
      .select(col("source"), col("T").as("n_tokens"), col("cap_tokens"),
        col("allocation"), col("capped"),
        expr("allocation * 1000000L div T").as("epochs_ppm"))
  }

  /** Token-budget corpus selection: rank documents by a quality key
    * and keep the prefix whose running token total stays within
    * `budget` — "the best N billion tokens" selection step between
    * scoring and training-set assembly. The rank key is
    * (score desc, id) so the cut is deterministic even across ties of
    * the rounded score.
    *
    * The running total is a GLOBAL prefix sum, which a naive
    * `Window.orderBy` with no partition key would compute on a single
    * task. This is the distributed two-phase formulation (the same
    * machinery as the tokenize-to-ids vocab rank): range-partition on
    * the rank key — the range exchange tiles the global order, so
    * partition p's rows all precede partition p+1's — then one
    * per-partition cumsum window (partitioned by `spark_partition_id`,
    * so no single-task collapse) plus the collected per-partition
    * token totals as literal offsets (numParts rows — bounded by the
    * partition count, not the data).
    *
    * Unlike la_gini (whose reduction folds into ONE action), the
    * filtered rows must flow on to the caller, so two actions over the
    * ranged frame are unavoidable — and RangePartitioner's
    * reservoir-sample seed depends on the RDD id, so two executions of
    * an UNPERSISTED repartitionByRange lineage can derive different
    * range boundaries once partitions outgrow the sample size
    * (silently corrupting the cumulative-token cut; r9 verdict #1).
    * The fix is an eager localCheckpoint: the ranged+windowed frame is
    * materialized ONCE, and both the offsets collect and the returned
    * plan read that single frozen partitioning. The checkpoint blocks
    * live until the returned frame is GC'd (ContextCleaner);
    * SamplingDriftSpec proves drift-immunity by forcing
    * non-exhaustive reservoir sampling
    * (rangeExchange.sampleSizePerPartition=1).
    */
  def budgetSelect(df: DataFrame, idCol: String, scoreCol: String,
      nTokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val spark = df.sparkSession
    val numParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df
      .repartitionByRange(numParts, col(scoreCol).desc, col(idCol))
      .sortWithinPartitions(col(scoreCol).desc, col(idCol))
      .withColumn("pid", spark_partition_id())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(col(scoreCol).desc, col(idCol))
    val local = ranged.withColumn("local_cum",
      sum(col(nTokensCol).cast("long")).over(w))
      .localCheckpoint(true)
    val counts = local.groupBy("pid")
      .agg(max(col("local_cum")).as("tot")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = {
      val pids = counts.keys.toSeq.sorted
      pids.zip(pids.map(counts).scanLeft(0L)(_ + _)).toMap
    }
    local
      .withColumn("cum_tokens",
        coalesce(element_at(typedLit(offsets), col("pid")), lit(0L)) +
          col("local_cum"))
      .filter(col("cum_tokens") <= budget)
      .drop("pid", "local_cum")
  }

  /** Sequence packing (concat-then-chunk, the standard pretraining
    * layout): documents are concatenated per shard in `orderCol` order
    * and split at `capacity`-token boundaries; each doc gets the chunk
    * its first token lands in plus its offset within that chunk. All
    * integer arithmetic over one per-shard window cumsum — one shuffle
    * keyed by shard, deterministic on any cluster layout, and exactly
    * replayable in SQL (the `t_seq_pack` oracle). At 100 TB the shard
    * column is the parallelism unit: packs never span shards, so
    * shards pack independently and in parallel.
    */
  def sequencePack(df: DataFrame, shardCol: String, orderCol: String,
      nTokens: org.apache.spark.sql.Column, capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shardCol).orderBy(orderCol)
    df.withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("start_offset",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("pack_id", expr(s"start_offset div $capacity"))
      .withColumn("offset_in_pack", col("start_offset") % capacity)
  }
}
