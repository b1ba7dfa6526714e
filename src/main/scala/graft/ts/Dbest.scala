package graft.ts

import scala.collection.mutable.ArrayBuffer

/** DBEST change detection and trend generalization (Jamali et al. 2015;
  * the reference invokes the CRAN package per pixel at
  * `calculations/dbest.py:112-125` and decodes result slots at
  * `calculations/dbest.py:311-331` (change detection) and `:385-394`
  * (generalization); parameter semantics documented in the reference UI at
  * `templates/home.html:74-113`).
  *
  * Pipeline (reconstructed from the paper + call-site decode):
  *  1. STL-decompose the monthly series (cyclical data); detect on the
  *     trend component. Non-cyclical data skips STL and detects on the
  *     raw series (the reference's polygon path crashes here — Appendix
  *     A.4; we implement the paper's intent).
  *  2. Level-shift candidates: |T(t) − T(t−1)| ≥ firstLevelShift whose
  *     `duration`-window means before/after differ ≥ secondLevelShift.
  *  3. Peak/valley generalization: top-down piecewise-linear vertex
  *     selection (Douglas-Peucker style) with `distanceThreshold`
  *     (`"default"` = 3·sd(ΔT); our pinned definition of the package's
  *     variance-derived default — see SURVEY §7.4).
  *  4. Segments between vertices ranked by |change|, top `breakpointsNo`
  *     reported; each tested at α (segment slope t-test; short abrupt
  *     segments inherit the level-shift evidence).
  */
object Dbest {

  final case class Params(
      dataType: String = "cyclical", // "cyclical" | "non-cyclical"
      seasonality: Int = 12,
      breakpointsNo: Int = 3,
      firstLevelShift: Double = 0.1,
      secondLevelShift: Double = 0.2,
      duration: Int = 24,
      distanceThreshold: Option[Double] = None, // None = "default"
      alpha: Double = 0.05)

  final case class Change(
      start: Int, // 0-based index into the series
      end: Int,
      change: Double,
      changeType: Int, // 1 = abrupt, 0 = non-abrupt
      significance: Int) // 1 significant at alpha, else -1

  final case class ChangeResult(
      breakpointNo: Int,
      segmentNo: Int,
      changes: Array[Change],
      fit: Array[Double],
      data: Array[Double],
      trend: Array[Double],
      seasonal: Array[Double],
      remainder: Array[Double])

  final case class GenResult(
      segmentNo: Int,
      rmse: Double,
      mad: Double,
      fit: Array[Double],
      data: Array[Double],
      fLocal: Array[Double])

  private def decomposeOrRaw(y: Array[Double], p: Params): Stl.Decomposition =
    if (p.dataType == "cyclical" && y.length >= 2 * p.seasonality)
      Stl.decompose(y, p.seasonality)
    else
      Stl.Decomposition(y.clone(), new Array[Double](y.length),
        new Array[Double](y.length))

  private def sd(xs: Array[Double]): Double = {
    if (xs.length < 2) return 0.0
    val m = xs.sum / xs.length
    math.sqrt(xs.map(v => (v - m) * (v - m)).sum / (xs.length - 1))
  }

  private def defaultDistance(trend: Array[Double]): Double = {
    val d = Array.tabulate(math.max(trend.length - 1, 0))(i =>
      trend(i + 1) - trend(i))
    val s = 3.0 * sd(d)
    if (s > 0) s else 1e-9
  }

  /** Level-shift candidate indices t: step from t−1 to t is a shift. */
  private def levelShifts(trend: Array[Double], p: Params): Set[Int] = {
    val n = trend.length
    val out = ArrayBuffer.empty[Int]
    val dur = math.max(p.duration, 1)
    var t = 1
    while (t < n) {
      if (math.abs(trend(t) - trend(t - 1)) >= p.firstLevelShift) {
        val lo = t - dur
        val hi = t + dur - 1
        if (lo >= 0 && hi < n) {
          var mb = 0.0
          var ma = 0.0
          var i = lo
          while (i < t) { mb += trend(i); i += 1 }
          i = t
          while (i <= hi) { ma += trend(i); i += 1 }
          mb /= dur; ma /= dur
          if (math.abs(ma - mb) >= p.secondLevelShift) out += t
        }
      }
      t += 1
    }
    out.toSet
  }

  /** Top-down piecewise-linear vertex selection: recursively add the
    * point with maximum vertical deviation from the current segment
    * until below threshold. Returns sorted vertex indices incl. ends.
    */
  private def generalize(trend: Array[Double], threshold: Double): Array[Int] = {
    val n = trend.length
    val vertices = ArrayBuffer(0, n - 1)
    def maxDev(a: Int, b: Int): (Int, Double) = {
      var best = -1
      var bestD = 0.0
      val ya = trend(a)
      val yb = trend(b)
      var i = a + 1
      while (i < b) {
        val yi = ya + (yb - ya) * (i - a).toDouble / (b - a)
        val dev = math.abs(trend(i) - yi)
        if (dev > bestD) { bestD = dev; best = i }
        i += 1
      }
      (best, bestD)
    }
    // recursive split (classic Douglas-Peucker): O(n log n) typical,
    // vs O(n·V) for a global re-scan per added vertex
    def rec(a: Int, b: Int): Unit = {
      if (b - a < 2) return
      val (idx, dev) = maxDev(a, b)
      if (idx >= 0 && dev > threshold) {
        vertices += idx
        rec(a, idx)
        rec(idx, b)
      }
    }
    rec(0, n - 1)
    vertices.sorted.toArray
  }

  /** Peak/valley reduction: drop interior vertices that are not turning
    * points of the generalized trend (consecutive segments with the same
    * slope sign merge into one monotone segment — the paper's
    * peak/valley semantics). Vertices in `keep` (level-shift boundaries)
    * always survive.
    */
  private def turningPoints(
      trend: Array[Double], vertices: Array[Int],
      keep: Set[Int]): Array[Int] = {
    if (vertices.length <= 2) return vertices
    val out = ArrayBuffer(vertices.head)
    var k = 1
    while (k < vertices.length - 1) {
      val prev = out.last
      val v = vertices(k)
      val next = vertices(k + 1)
      val d1 = trend(v) - trend(prev)
      val d2 = trend(next) - trend(v)
      val isTurn = (d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)
      if (isTurn || keep.contains(v)) out += v
      k += 1
    }
    out += vertices.last
    out.toArray
  }

  /** Piecewise-linear interpolation of trend through the vertices. */
  private def plFit(trend: Array[Double], vertices: Array[Int]): Array[Double] = {
    val fit = new Array[Double](trend.length)
    var k = 0
    while (k < vertices.length - 1) {
      val a = vertices(k)
      val b = vertices(k + 1)
      var i = a
      while (i <= b) {
        fit(i) = trend(a) + (trend(b) - trend(a)) * (i - a).toDouble /
          math.max(b - a, 1)
        i += 1
      }
      k += 1
    }
    fit
  }

  private def segmentSignificance(
      trend: Array[Double], a: Int, b: Int, abrupt: Boolean,
      p: Params): Int = {
    val len = b - a + 1
    if (len >= 4) {
      val seg = java.util.Arrays.copyOfRange(trend, a, b + 1)
      val f = Ols.fit(seg, 1)
      if (f.leadingP < p.alpha) 1 else -1
    } else if (abrupt) 1
    else -1
  }

  /** Change-detection algorithm (`algorithm="change detection"`). */
  def changeDetection(y: Array[Double], p: Params): ChangeResult = {
    val dec = decomposeOrRaw(y, p)
    val trend = dec.trend
    val n = trend.length
    val thr = p.distanceThreshold.getOrElse(defaultDistance(trend))
    val shifts = levelShifts(trend, p)
    // Consecutive shift indices form one abrupt transition: a run
    // t0..t1 becomes a single segment [t0-1, t1] spanning the whole
    // level change, not a chain of 1-step slices.
    val runs = ArrayBuffer.empty[(Int, Int)]
    shifts.toArray.sorted.foreach { t =>
      if (runs.nonEmpty && t <= runs.last._2 + 1)
        runs(runs.length - 1) = (runs.last._1, t)
      else runs += ((math.max(t - 1, 0), t))
    }
    val abruptSegs = runs.toSet
    val keep = runs.flatMap { case (a, b) => Seq(a, b) }
      .filter(i => i >= 0 && i < n).toSet
    val raw = (generalize(trend, thr).toSet ++ keep)
      .filter(i => !runs.exists { case (a, b) => i > a && i < b })
      .toArray.sorted
    val vertices = turningPoints(trend, raw, keep)
    val fit = plFit(trend, vertices)

    val segs = ArrayBuffer.empty[Change]
    var k = 0
    while (k < vertices.length - 1) {
      val a = vertices(k)
      val b = vertices(k + 1)
      val abrupt = abruptSegs.contains((a, b))
      segs += Change(a, b, trend(b) - trend(a), if (abrupt) 1 else 0,
        segmentSignificance(trend, a, b, abrupt, p))
      k += 1
    }
    val ranked = segs.sortBy(c => (-math.abs(c.change), c.start))
      .take(math.max(p.breakpointsNo, 0)).toArray
    ChangeResult(
      breakpointNo = math.min(vertices.length - 2, math.max(segs.length, 0)),
      segmentNo = segs.length,
      changes = ranked,
      fit = fit, data = y.clone(), trend = trend,
      seasonal = dec.seasonal, remainder = dec.remainder)
  }

  /** Generalization algorithm (`algorithm="generalization"`,
    * decode at `calculations/dbest.py:385-394`; `f_local` is the slot-8
    * "Trend local change" series the reference plots as zero-anchored
    * bars at `calculations/dbest.py:409-424`): per-timestep first
    * difference of the generalized trend — constant (the segment slope)
    * inside each piecewise-linear segment, stepping at the vertices.
    */
  def generalization(y: Array[Double], p: Params): GenResult = {
    val dec = decomposeOrRaw(y, p)
    val trend = dec.trend
    val thr = p.distanceThreshold.getOrElse(defaultDistance(trend))
    val vertices = turningPoints(trend, generalize(trend, thr), Set.empty)
    val fit = plFit(trend, vertices)
    val n = y.length
    var sse = 0.0
    val absDev = new Array[Double](n)
    var i = 0
    while (i < n) {
      val r = fit(i) - y(i)
      sse += r * r
      absDev(i) = math.abs(r)
      i += 1
    }
    val sorted = absDev.sorted
    val mad =
      if (n == 0) 0.0
      else if (n % 2 == 1) sorted(n / 2)
      else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
    val fLocal = new Array[Double](n)
    i = 1
    while (i < n) { fLocal(i) = fit(i) - fit(i - 1); i += 1 }
    GenResult(
      segmentNo = vertices.length - 1,
      rmse = math.sqrt(sse / math.max(n, 1)),
      mad = mad,
      fit = fit, data = y.clone(), fLocal = fLocal)
  }
}
