package graft.api

import graft.functions.RollingHash
import graft.io.Tables
import graft.model.{Observation, PTRow}
import graft.ts.PolyTrendAgg
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, udaf}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** The engine facade (SURVEY §7.1 `api/`): session construction with the
  * tuned defaults, dataset registration, and SQL exposure of the custom
  * kernels — a user points it at a scale directory and gets both the
  * DataFrame combinators and a SQL surface with `polytrend(...)` /
  * `rolling_hash(...)` available.
  */
object GraftEngine {

  /** Local-mode session with the engine defaults. On a cluster the
    * master/partitions come from spark-submit; only the UTC pin and AQE
    * flags matter there.
    */
  def session(appName: String = "graft",
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Int = 32): SparkSession = {
    val spark = graft.io.Tables.configure(SparkSession.builder()
        .appName(appName)
        .master(master)
        .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    registerFunctions(spark)
    spark
  }

  /** Register the kernel functions on an existing session. */
  def registerFunctions(spark: SparkSession, alpha: Double = 0.05): Unit = {
    // K1 as a SQL aggregate: SELECT key, polytrend(t, v) ... GROUP BY key
    spark.udf.register("polytrend", udaf(new PolyTrendAgg(alpha)))
    // K1 scale path: constant-size sufficient-statistics aggregate
    // (map-side combinable; see PolyTrendMomentsAgg)
    ColumnBridge.registerExpression(spark, "polytrend_moments",
      exprs => graft.ts.PolyTrendMomentsAgg(exprs(0), exprs(1), alpha))
    // document fingerprint as a SQL scalar (native expression, codegen'd)
    ColumnBridge.registerExpression(spark, "rolling_hash",
      exprs => graft.functions.RollingHash(exprs.head))
    // fused one-pass cosine (native expression, codegen'd)
    ColumnBridge.registerExpression(spark, "cosine_similarity",
      exprs => graft.functions.CosineSimilarity(exprs(0), exprs(1)))
    // capped posting-list aggregate: k smallest distinct longs,
    // O(k) state (bounded map-side partials; see BoundedMinSetAgg)
    ColumnBridge.registerExpression(spark, "bounded_min_set",
      exprs => graft.functions.BoundedMinSetAgg(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()))
    // Misra-Gries heavy-hitter candidates: k counters of state,
    // guaranteed to contain every item with frequency > N/(k+1)
    ColumnBridge.registerExpression(spark, "misra_gries",
      exprs => graft.functions.MisraGriesAgg(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()))
    // banded edit distance with early exit (native, codegen'd):
    // exact when <= k, k+1 otherwise — the fuzzy-join filter kernel
    ColumnBridge.registerExpression(spark, "bounded_levenshtein",
      exprs => graft.functions.BoundedLevenshtein(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Number].intValue()))
    // Jaro-Winkler similarity (native, codegen'd; DuckDB-pinned
    // semantics) — the record-linkage scoring kernel
    ColumnBridge.registerExpression(spark, "jaro_winkler",
      exprs => graft.functions.JaroWinkler(exprs(0), exprs(1)))
  }

  /** DataFrame form of the moments-based K1 aggregate. */
  def polytrendMoments(t: org.apache.spark.sql.Column,
      v: org.apache.spark.sql.Column,
      alpha: Double = 0.05): org.apache.spark.sql.Column =
    ColumnBridge.toColumn(graft.ts.PolyTrendMomentsAgg(
      ColumnBridge.toExpression(t), ColumnBridge.toExpression(v), alpha)
      .toAggregateExpression())

  /** Register every testdata table as a temp view for `spark.sql`. */
  def open(spark: SparkSession, dir: String): Unit =
    Tables.registerAll(spark, dir)

  /** Convenience: one-call PolyTrend lifecycle (§3.1) over an
    * observation table.
    */
  def polyTrend(spark: SparkSession, obs: DataFrame,
      params: graft.pipeline.TrendPipeline.PolyTrendParams): DataFrame =
    graft.pipeline.TrendPipeline.polyTrend(spark, obs, params)

  // ------------------------------------------------- typed Dataset API

  /** Typed observation view: `Dataset[Observation]` where the schema is
    * static — compile-time column safety and case-class lambdas, while
    * the plan stays Catalyst-optimizable (the `as[T]` conversion is
    * metadata-only; filters/selects written against columns still push
    * down). The DataFrame lifecycle methods remain the dynamic-schema
    * path.
    */
  def observations(spark: SparkSession,
      obs: DataFrame): Dataset[Observation] = {
    import spark.implicits._
    obs.select(col("id"), col("longitude"), col("latitude"),
      col("time"), col("value")).as[Observation]
  }

  /** Typed PolyTrend lifecycle: same plan as [[polyTrend]], result rows
    * as the reference's per-pixel record (`PTRow`,
    * `calculations/polytrend.py:291-297`).
    */
  def polyTrendTyped(spark: SparkSession, obs: Dataset[Observation],
      params: graft.pipeline.TrendPipeline.PolyTrendParams): Dataset[PTRow] = {
    import spark.implicits._
    graft.pipeline.TrendPipeline.polyTrend(spark, obs.toDF(), params)
      .as[PTRow]
  }
}
