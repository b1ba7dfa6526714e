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
    "search_pipeline", "hybrid_search", "ts_gapfill_locf")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // dev-only subset (comma-separated names) for fast iteration on a
    // single query's timing; the driver never sets it
    val headline = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(f => this.headline.filter(f.split(',').toSet))
      .getOrElse(this.headline)
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
    val coldTotal = headline.map { name =>
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => 0.0 }
    }.sum

    // a failed query records -1 (never a near-zero duration that would
    // deflate the headline total) and is listed in "failed". Each query
    // is timed three times and the min kept: the steady-state figure is
    // the scale-relevant one, and min-of-3 shrugs off transient host
    // contention (GC, page cache, co-tenant load) that single or paired
    // samples still inherit (r3 showed ±20-30% swings on sub-second
    // queries at min-of-2).
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
        }
        (System.nanoTime() - t0) / 1e9
      }
      val times = Iterator.continually(once()).take(3)
        .takeWhile(_ >= 0).toSeq
      name -> (if (times.length < 3) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.map(_._2).filter(_ >= 0).sum
    // the headline list grows each round, so "value" is not comparable
    // across rounds; this is the sum over the frozen r2-era 23 names
    // (the first 23 of `headline`) — read THIS for round-over-round
    val comparable = results.take(23).map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","cold_total":$coldTotal,"comparable_r2_total":$comparable,"queries":$qs,"failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(2)
  }
}
