package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-category query registries (relational surface,
  * time-series kernels, data-pipeline ops) into the single map the
  * driver's Verify/Bench harness consumes.
  */
object SparkEntry {

  private def registries: Seq[QueryRegistry] = Seq(
    graft.rel.RelQueries,
    graft.rel.SqlQueries,
    graft.rel.LogAnalytics,
    graft.ts.KernelQueries,
    // the four family registries the PipelineQueries monolith split
    // into (r14 verdict #6) — same query names, file-grain ownership
    graft.pipeline.TextQueries,
    graft.pipeline.DedupQueries,
    graft.pipeline.SimQueries,
    graft.pipeline.MediaSourceQueries,
    graft.graph.GraphQueries,
    graft.streaming.StreamQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full PolyTrend lifecycle (filter → composite → kernel) over the
    * events-as-observations mapping.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("k1_polytrend")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. QueryRegistry
    * rejects within-registry duplicates at registration; the require
    * here catches CROSS-registry collisions, which `.toMap` would
    * otherwise resolve by silently dropping one side.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = registries.flatMap(_.queries)
    val dups = all.groupBy(_._1).collect { case (n, vs) if vs.size > 1 => n }
    require(dups.isEmpty,
      s"query name registered in multiple registries: ${dups.mkString(", ")}")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registries.flatMap(_.oracleSql).toMap

  /** live rows-only query → its oracle-checked same-code golden twin
    * (r14 verdict #7). Validated here so a typo'd twin name or an
    * anchor on an already-oracled row fails the build, not the read:
    * with these anchors the DECLARED no-oracle set shrinks to exactly
    * the documented-necessity rows (pipeline_dbest journey composite,
    * zlib t_compress_ratio, Spark-seeded t_stratified_sample) — a
    * RegistrySpec test pins that set.
    */
  def goldenAnchored: Map[String, String] = {
    val qs = queries
    val oracles = oracleSql
    val m = registries.flatMap(_.goldenAnchors).toMap
    m.foreach { case (live, twin) =>
      require(qs.contains(live), s"golden anchor on unknown query: $live")
      require(!oracles.contains(live),
        s"golden anchor on an already-oracled query: $live")
      require(oracles.contains(twin),
        s"golden twin missing or not oracle-checked: $twin (for $live)")
    }
    m
  }
}
