package graft.ts

/** PolyTrend polynomial trend classification (Jamali et al. 2014; the
  * reference invokes the CRAN package per pixel at
  * `calculations/polytrend.py:286` and decodes the result slots at
  * `calculations/polytrend.py:298-306`: `[2]=trend_type, [3]=slope,
  * [4]=direction, [5]=significance, [6]=degree`).
  *
  * Semantics reconstructed from the paper + the reference's decode maps
  * (`calculations/polytrend.py:204-211`):
  *
  *  - Fit cubic; if the cubic coefficient is significant at α:
  *    degree = 3 → trend_type 3 (cubic) when the linear net change is
  *    also significant, else −1 ("concealed": a real curvature trend with
  *    no significant net linear change over the period).
  *  - Else fit quadratic; significant → degree 2 → trend_type 2 or −1
  *    by the same net-change rule.
  *  - Else fit linear; significant slope → trend_type 1, degree 1.
  *  - Else trend_type 0 (no trend), degree 1.
  *
  * `slope` and `direction = sign(slope)` always come from the degree-1
  * fit; `significance ∈ {1,−1}` is the slope t-test outcome at α.
  */
object PolyTrend {

  /** Per-series result (FIXTURES.md A3 PolyTrend schema). */
  final case class PTResult(
      trendType: Int, // {-1, 0, 1, 2, 3}
      slope: Double,
      direction: Int, // {-1, 1}
      significance: Int, // {1, -1}
      degree: Int,
      pValue: Double) // slope p-value (diagnostic, not in reference output)

  /** Classify one ordered series. Returns None for series too short to
    * fit a cubic with residual dof (reference crashes on these —
    * Appendix A; we drop the row instead).
    */
  def classify(y: Array[Double], alpha: Double): Option[PTResult] = {
    if (y.length < 6) return None
    val lin = Ols.fit(y, 1)
    val slope = lin.coeffs(1)
    val slopeSig = lin.leadingP < alpha
    val direction = if (slope < 0) -1 else 1
    val significance = if (slopeSig) 1 else -1

    val cubic = Ols.fit(y, 3)
    val quad = Ols.fit(y, 2)

    // Guard against numerically-exact lower-degree data: with ~zero
    // residual the higher-degree t-statistic is 0/0 noise, so a
    // "significant" leading coefficient must also be above float noise
    // relative to the signal scale.
    val scale = y.foldLeft(1e-300)((m, v) => math.max(m, math.abs(v)))
    def sig(f: Ols.Fit): Boolean =
      f.leadingP < alpha && math.abs(f.leadingCoeff) > 1e-10 * scale

    val (trendType, degree) =
      if (sig(cubic)) (if (slopeSig) 3 else -1, 3)
      else if (sig(quad)) (if (slopeSig) 2 else -1, 2)
      else if (slopeSig) (1, 1)
      else (0, 1)

    Some(PTResult(trendType, slope, direction, significance, degree,
      lin.leadingP))
  }

  /** Classification from sufficient statistics (see
    * [[Ols.fitFromMoments]]): identical decision ladder to [[classify]],
    * with the float-noise guard scaled by the RMS of y (max|y| is not
    * recoverable from moments; rms differs from it by a bounded constant
    * and the guard only matters in the near-exact-fit regime).
    */
  def classifyMoments(sx: Array[Double], sxy: Array[Double], sy2: Double,
      alpha: Double): Option[PTResult] = {
    val n = math.round(sx(0))
    if (n < 6) return None
    val lin = Ols.fitFromMoments(sx, sxy, sy2, 1)
    val slope = lin.coeffs(1)
    val slopeSig = lin.leadingP < alpha
    val direction = if (slope < 0) -1 else 1
    val significance = if (slopeSig) 1 else -1

    val cubic = Ols.fitFromMoments(sx, sxy, sy2, 3)
    val quad = Ols.fitFromMoments(sx, sxy, sy2, 2)

    val scale = math.max(math.sqrt(math.max(sy2, 0.0) / n), 1e-300)
    def sig(f: Ols.Fit): Boolean =
      f.leadingP < alpha && math.abs(f.leadingCoeff) > 1e-10 * scale

    val (trendType, degree) =
      if (sig(cubic)) (if (slopeSig) 3 else -1, 3)
      else if (sig(quad)) (if (slopeSig) 2 else -1, 2)
      else if (slopeSig) (1, 1)
      else (0, 1)

    Some(PTResult(trendType, slope, direction, significance, degree,
      lin.leadingP))
  }

  /** Code → label decode (`calculations/polytrend.py:204-211`). */
  val trendLabels: Map[Int, String] = Map(
    -1 -> "concealed", 0 -> "no-trend", 1 -> "linear",
    2 -> "quadratic", 3 -> "cubic")
  val directionLabels: Map[Int, String] =
    Map(-1 -> "negative", 1 -> "positive")
}
