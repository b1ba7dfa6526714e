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
}
