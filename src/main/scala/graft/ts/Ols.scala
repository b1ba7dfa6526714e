package graft.ts

import org.apache.commons.math3.distribution.TDistribution

/** Ordinary-least-squares polynomial fitting for the time-series kernels
  * (SURVEY.md §2.7 K1/K2). The reference delegates this to the CRAN
  * PolyTrend package's internal `lm` fits (`calculations/polytrend.py:286`);
  * here it is a small exact solver over centered time indices.
  *
  * x is the 1-based time-step index centered at its mean, which keeps the
  * Vandermonde normal equations well-conditioned for series up to a few
  * thousand points (the composite step bounds series length — annual ≤32,
  * monthly ≤228 in the reference's envelope, BASELINE.md).
  *
  * The leading polynomial coefficient and its t-statistic are invariant
  * under the x-shift, and the degree-1 slope is exactly the per-time-step
  * slope the reference reports.
  */
object Ols {

  /** One polynomial fit. coeffs(k) multiplies x^k (centered x). */
  final case class Fit(
      degree: Int,
      coeffs: Array[Double],
      /** standard error per coefficient */
      se: Array[Double],
      /** two-sided p-value per coefficient (t-test, n-p dof) */
      pValues: Array[Double],
      sse: Double,
      n: Int) {
    def leadingP: Double = pValues(degree)
    def leadingCoeff: Double = coeffs(degree)
  }

  /** Fit y against centered index x = (1..n) - mean, degree <= 3. */
  def fit(y: Array[Double], degree: Int): Fit = {
    val n = y.length
    val p = degree + 1
    require(n > p, s"need more than ${p} points for degree $degree, got $n")
    val c = (n + 1) / 2.0
    val x = Array.tabulate(n)(i => (i + 1) - c)

    // Normal equations: (X'X) b = X'y with X = [x^0 .. x^degree].
    val xtx = Array.ofDim[Double](p, p)
    val xty = new Array[Double](p)
    var i = 0
    while (i < n) {
      val xi = x(i)
      val yi = y(i)
      var pj = 1.0 // x^j
      var j = 0
      while (j < p) {
        var pk = pj * pj // x^(j+k) starting at k = j
        var k = j
        while (k < p) {
          xtx(j)(k) += pk
          pk *= xi
          k += 1
        }
        xty(j) += pj * yi
        pj *= xi
        j += 1
      }
      i += 1
    }
    // symmetrize lower triangle
    var j = 0
    while (j < p) {
      var k = 0
      while (k < j) { xtx(j)(k) = xtx(k)(j); k += 1 }
      j += 1
    }

    val inv = invert(xtx, p)
    val b = new Array[Double](p)
    j = 0
    while (j < p) {
      var acc = 0.0
      var k = 0
      while (k < p) { acc += inv(j)(k) * xty(k); k += 1 }
      b(j) = acc
      j += 1
    }

    // SSE = Σ(y - ŷ)² computed directly (numerically safer than moment
    // algebra when the fit is near-perfect).
    var sse = 0.0
    i = 0
    while (i < n) {
      var yhat = 0.0
      var pj = 1.0
      var k = 0
      while (k < p) { yhat += b(k) * pj; pj *= x(i); k += 1 }
      val r = y(i) - yhat
      sse += r * r
      i += 1
    }
    if (sse < 0) sse = 0.0

    finishFit(degree, b, inv, sse, n)
  }

  /** Fit from sufficient statistics alone — the aggregation-friendly
    * path ([[PolyTrendMomentsAgg]]): no per-point arrays, so the whole
    * fit runs off a constant-size buffer that map-side combines.
    *
    * @param sx  Σx^k for k = 0..6 over the CENTERED index basis
    *            (sx(0) = n)
    * @param sxy Σx^k·y for k = 0..3
    * @param sy2 Σy²
    *
    * Precision note: SSE here is the moment identity Σy² − b'X'y, which
    * cancels catastrophically only when the fit is near-exact (SSE → 0
    * while Σy² stays large); [[graft.ts.PolyTrend]]'s float-noise guard
    * covers exactly that regime, and the clamp keeps SSE ≥ 0.
    */
  def fitFromMoments(sx: Array[Double], sxy: Array[Double], sy2: Double,
      degree: Int): Fit = {
    val n = math.round(sx(0)).toInt
    val p = degree + 1
    require(n > p, s"need more than $p points for degree $degree, got $n")
    val xtx = Array.tabulate(p, p)((j, k) => sx(j + k))
    val xty = Array.tabulate(p)(sxy(_))
    val inv = invert(xtx, p)
    val b = new Array[Double](p)
    var j = 0
    while (j < p) {
      var acc = 0.0
      var k = 0
      while (k < p) { acc += inv(j)(k) * xty(k); k += 1 }
      b(j) = acc
      j += 1
    }
    var sse = sy2
    j = 0
    while (j < p) { sse -= b(j) * xty(j); j += 1 }
    if (sse < 0) sse = 0.0
    finishFit(degree, b, inv, sse, n)
  }

  private def finishFit(degree: Int, b: Array[Double],
      inv: Array[Array[Double]], sse: Double, n: Int): Fit = {
    val p = degree + 1
    val dof = n - p
    val sigma2 = sse / dof
    val se = new Array[Double](p)
    val pv = new Array[Double](p)
    val tdist = new TDistribution(dof.toDouble)
    var j = 0
    while (j < p) {
      se(j) = math.sqrt(math.max(sigma2 * inv(j)(j), 0.0))
      val t = if (se(j) == 0.0) {
        if (b(j) == 0.0) 0.0 else Double.PositiveInfinity
      } else b(j) / se(j)
      pv(j) =
        if (t.isInfinite) 0.0
        else 2.0 * (1.0 - tdist.cumulativeProbability(math.abs(t)))
      j += 1
    }
    Fit(degree, b, se, pv, sse, n)
  }

  /** Evaluate a fit (centered-x basis) at 1-based index i. */
  def eval(f: Fit, i: Int): Double = {
    val c = (f.n + 1) / 2.0
    val xi = i - c
    var acc = 0.0
    var pj = 1.0
    var k = 0
    while (k <= f.degree) { acc += f.coeffs(k) * pj; pj *= xi; k += 1 }
    acc
  }

  /** Gauss-Jordan inverse with partial pivoting; p <= 4. */
  private def invert(a: Array[Array[Double]], p: Int): Array[Array[Double]] = {
    val m = Array.tabulate(p, 2 * p) { (i, j) =>
      if (j < p) a(i)(j) else if (j - p == i) 1.0 else 0.0
    }
    var col = 0
    while (col < p) {
      var piv = col
      var best = math.abs(m(col)(col))
      var r = col + 1
      while (r < p) {
        val v = math.abs(m(r)(col))
        if (v > best) { best = v; piv = r }
        r += 1
      }
      require(best > 0, "singular normal-equation matrix")
      if (piv != col) { val tmp = m(piv); m(piv) = m(col); m(col) = tmp }
      val d = m(col)(col)
      var j = 0
      while (j < 2 * p) { m(col)(j) /= d; j += 1 }
      r = 0
      while (r < p) {
        if (r != col) {
          val f = m(r)(col)
          if (f != 0.0) {
            var j2 = 0
            while (j2 < 2 * p) { m(r)(j2) -= f * m(col)(j2); j2 += 1 }
          }
        }
        r += 1
      }
      col += 1
    }
    Array.tabulate(p, p)((i, j) => m(i)(j + p))
  }
}
