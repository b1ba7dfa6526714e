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
}
