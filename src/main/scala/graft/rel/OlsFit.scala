package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed multivariate linear regression by normal equations —
  * "train a linear quality scorer over the whole corpus in ONE pass".
  *
  * The reference's kernels fit polynomials over one user's series on
  * the driver (`calculations/utils.py` OLS); this is the corpus-scale
  * analog: fit y ~ 1 + x1 + x2 over EVERY row with a single
  * map-combined aggregate producing the ten normal-equation sums
  * (X'X and X'y for the 3-column design matrix plus Σy²), then solve
  * the 3×3 system in closed form (Cramer) as column expressions on the
  * one-row frame. Nothing but ten BIGINT sums ever crosses the wire —
  * the canonical "sufficient statistics, not data" aggregation shape,
  * linear in rows at any scale with constant shuffle volume.
  *
  * Exactness contract: inputs are cast to BIGINT so the sums are
  * exact integers that commute across partitions and engines; the
  * Cramer arithmetic then runs in doubles from those integers with one
  * fixed expression structure, so an oracle writing the same formulas
  * reproduces the coefficients bit-for-bit before the final
  * round(.,6). Per-row products must fit a BIGINT (|x|·|y| < 2^63 /
  * rows); for wider-domain features scale them down first or swap the
  * sums to DECIMAL(38,0) — documented trade, the features a quality
  * model uses (counts, ratios ×10^4) fit comfortably.
  */
object OlsFit {

  /** Fit y ~ b0 + b1·x1 + b2·x2; returns one row:
    * (n, b0, b1, b2, r2), coefficients rounded to 1e-6.
    */
  def fit2(df: DataFrame, y: Column, x1: Column, x2: Column): DataFrame = {
    val base = df.select(y.cast("long").as("y"),
      x1.cast("long").as("x1"), x2.cast("long").as("x2"))
      .filter(col("y").isNotNull && col("x1").isNotNull &&
        col("x2").isNotNull)
    val sums = base.agg(
      count(lit(1)).as("n"),
      sum("x1").as("s1"), sum("x2").as("s2"), sum("y").as("sy"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"),
      sum(col("y") * col("y")).as("syy"))
    val n = col("n").cast("double")
    val s1 = col("s1").cast("double"); val s2 = col("s2").cast("double")
    val sy = col("sy").cast("double")
    val s11 = col("s11").cast("double"); val s12 = col("s12").cast("double")
    val s22 = col("s22").cast("double")
    val s1y = col("s1y").cast("double"); val s2y = col("s2y").cast("double")
    val syy = col("syy").cast("double")
    // Cramer determinants for [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]] —
    // keep the term order in lockstep with the oracle SQL
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val det0 = sy * (s11 * s22 - s12 * s12) -
      s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)
    val det1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)
    val b0 = det0 / det; val b1 = det1 / det; val b2 = det2 / det
    val sse = syy - lit(2) * (b0 * sy + b1 * s1y + b2 * s2y) +
      (n * b0 * b0 + s11 * b1 * b1 + s22 * b2 * b2 +
        lit(2) * (b0 * b1 * s1 + b0 * b2 * s2 + b1 * b2 * s12))
    val sst = syy - sy * sy / n
    sums.select(col("n"),
      round(b0, 6).as("b0"), round(b1, 6).as("b1"), round(b2, 6).as("b2"),
      round(lit(1.0) - sse / sst, 6).as("r2"))
  }

  /** Per-group residual audit of a [[fit2]] model — the evaluate half
    * of the train→evaluate loop: fit once on the whole corpus (one
    * aggregate), broadcast the 1-row coefficient frame back, and
    * reduce per-row residuals by `groupCol` (bias = mean signed
    * residual exposes segments the global model systematically mis-
    * scores; MAE their spread). Residuals round ONCE per row to exact
    * µ-unit integers — computed from the ROUNDED coefficients and
    * integer features, so both engines derive the identical long —
    * and every aggregate after that is an exact commuting sum.
    * Two shuffles total (the fit's one-row agg + the group agg), both
    * map-combined; the corpus is scanned twice, never re-shuffled.
    */
  def residualsByGroup(df: DataFrame, groupCol: Column, y: Column,
      x1: Column, x2: Column): DataFrame = {
    val fit = fit2(df, y, x1, x2)
      .select(col("b0"), col("b1"), col("b2"))
    val res = (y.cast("long").cast("double") -
      (col("b0") + col("b1") * x1.cast("long").cast("double") +
        col("b2") * x2.cast("long").cast("double")))
    df.crossJoin(broadcast(fit))
      .select(groupCol.as("grp"),
        round(res * 1e6).cast("long").as("res_u"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum(col("res_u")).as("sum_res_u"),
        sum(abs(col("res_u"))).as("sum_abs_res_u"))
      .select(col("grp"), col("n"),
        expr("CAST(sum_res_u div n AS BIGINT)").as("bias_u"),
        expr("CAST(sum_abs_res_u div n AS BIGINT)").as("mae_u"))
  }
}
