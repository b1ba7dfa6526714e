package graft.ts

/** Seasonal-trend decomposition by loess (Cleveland et al. 1990), the
  * substrate of the reference's DBEST kernel (consumed at
  * `calculations/dbest.py:325-329`, components plotted `:334-381`).
  *
  * This is the "periodic" seasonal variant (each cycle position gets one
  * seasonal value — R's `s.window = "periodic"`), with a loess-smoothed
  * trend: inner loop = {detrend → phase means → center → deseasonalize →
  * trend loess}, optional outer robustness loop with bisquare weights.
  * Deterministic, no randomness.
  */
object Stl {

  final case class Decomposition(
      trend: Array[Double],
      seasonal: Array[Double],
      remainder: Array[Double])

  /** Tricube-weighted local linear regression smoother.
    *
    * @param y  series
    * @param q  smoothing span in points (will be clamped to >= 3)
    * @param rw robustness weights (null = all ones)
    */
  def loess(y: Array[Double], q: Int, rw: Array[Double] = null): Array[Double] = {
    val n = y.length
    val span = math.min(math.max(q, 3), math.max(n, 3))
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      // window of `span` nearest indices around i, clipped to bounds
      var lo = i - (span - 1) / 2
      var hi = lo + span - 1
      if (lo < 0) { hi = math.min(n - 1, hi - lo); lo = 0 }
      if (hi > n - 1) { lo = math.max(0, lo - (hi - (n - 1))); hi = n - 1 }
      val h = math.max(math.max(i - lo, hi - i), 1).toDouble
      // weighted linear fit over the window
      var sw = 0.0; var swx = 0.0; var swy = 0.0; var swxx = 0.0; var swxy = 0.0
      var j = lo
      while (j <= hi) {
        val u = math.abs(j - i) / h
        var w = if (u >= 1.0) 0.0 else { val t = 1.0 - u * u * u; t * t * t }
        if (rw != null) w *= rw(j)
        if (w > 0) {
          val xj = (j - i).toDouble
          sw += w; swx += w * xj; swy += w * y(j)
          swxx += w * xj * xj; swxy += w * xj * y(j)
        }
        j += 1
      }
      out(i) =
        if (sw == 0.0) y(i)
        else {
          val det = sw * swxx - swx * swx
          if (math.abs(det) < 1e-12 * math.max(sw * swxx, 1.0)) swy / sw
          else {
            val b = (sw * swxy - swx * swy) / det
            val a = (swy - b * swx) / sw
            a // evaluated at xj = 0 (the target point)
          }
        }
      i += 1
    }
    out
  }

  private def nextOdd(x: Double): Int = {
    val c = math.ceil(x).toInt
    if (c % 2 == 0) c + 1 else c
  }

  /** Decompose y with the given period. innerIters=2, outerIters=0 match
    * R `stl(robust = FALSE)` defaults; outerIters>0 adds bisquare
    * robustness weighting.
    */
  def decompose(
      y: Array[Double],
      period: Int,
      innerIters: Int = 2,
      outerIters: Int = 0): Decomposition = {
    val n = y.length
    require(period >= 2 && n >= 2 * period,
      s"need >= 2 full periods (n=$n, period=$period)")
    val trendSpan = nextOdd(1.5 * period)
    var trend = new Array[Double](n)
    var seasonal = new Array[Double](n)
    var rw: Array[Double] = null

    var outer = 0
    while (outer <= outerIters) {
      var inner = 0
      while (inner < innerIters) {
        // 1. detrend
        val detr = new Array[Double](n)
        var i = 0
        while (i < n) { detr(i) = y(i) - trend(i); i += 1 }
        // 2. periodic seasonal: (robust-)weighted mean per cycle position
        val phaseSum = new Array[Double](period)
        val phaseW = new Array[Double](period)
        i = 0
        while (i < n) {
          val w = if (rw == null) 1.0 else rw(i)
          phaseSum(i % period) += w * detr(i)
          phaseW(i % period) += w
          i += 1
        }
        val phaseMean = Array.tabulate(period)(p =>
          if (phaseW(p) > 0) phaseSum(p) / phaseW(p) else 0.0)
        // 3. center so the seasonal sums to ~0 over one period
        val grand = phaseMean.sum / period
        i = 0
        while (i < n) { seasonal(i) = phaseMean(i % period) - grand; i += 1 }
        // 4. deseasonalize and re-estimate trend
        val deseason = new Array[Double](n)
        i = 0
        while (i < n) { deseason(i) = y(i) - seasonal(i); i += 1 }
        trend = loess(deseason, trendSpan, rw)
        inner += 1
      }
      // outer robustness update
      if (outer < outerIters) {
        val absRes = new Array[Double](n)
        var i = 0
        while (i < n) {
          absRes(i) = math.abs(y(i) - trend(i) - seasonal(i)); i += 1
        }
        val sorted = absRes.sorted
        val med =
          if (n % 2 == 1) sorted(n / 2)
          else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
        val h = 6.0 * med
        rw = Array.tabulate(n) { k =>
          if (h <= 0) 1.0
          else {
            val u = absRes(k) / h
            if (u >= 1.0) 0.0 else { val t = 1.0 - u * u; t * t }
          }
        }
      }
      outer += 1
    }
    val remainder = Array.tabulate(n)(i => y(i) - trend(i) - seasonal(i))
    Decomposition(trend, seasonal, remainder)
  }
}
