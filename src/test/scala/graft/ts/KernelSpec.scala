package graft.ts

import org.scalatest.funsuite.AnyFunSuite

/** Known-answer fixtures for the statistical kernels (FIXTURES.md A2). */
class KernelSpec extends AnyFunSuite {

  private def linspace(n: Int)(f: Int => Double): Array[Double] =
    Array.tabulate(n)(i => f(i + 1))

  // ------------------------------------------------------------------ Ols

  test("OLS recovers exact linear coefficients") {
    val y = linspace(20)(x => 2.0 * x + 1.0)
    val f = Ols.fit(y, 1)
    // centered x: slope unchanged, intercept = mean(y)
    assert(math.abs(f.coeffs(1) - 2.0) < 1e-9)
    assert(math.abs(f.coeffs(0) - y.sum / y.length) < 1e-9)
    assert(f.leadingP < 1e-6)
  }

  test("OLS recovers cubic leading coefficient") {
    val n = 30
    val c = (n + 1) / 2.0
    val y = linspace(n) { x => val t = x - c; 0.01 * t * t * t + 0.5 * t + 3 }
    val f = Ols.fit(y, 3)
    assert(math.abs(f.coeffs(3) - 0.01) < 1e-9)
    assert(f.leadingP < 1e-6)
  }

  test("OLS flat noise has insignificant slope") {
    val rnd = new scala.util.Random(7)
    val y = linspace(40)(_ => 5.0 + rnd.nextGaussian() * 0.1)
    val f = Ols.fit(y, 1)
    assert(f.pValues(1) > 0.05)
  }

  // ------------------------------------------------------------ PolyTrend

  test("pure linear series → linear trend, slope 2, positive") {
    // alpha 0.01: the highest-coefficient t-test has an inherent 5%
    // false-positive rate at 0.05 — the classifier is probabilistic by
    // design (the reference's R package behaves identically).
    val rnd = new scala.util.Random(1)
    val y = linspace(20)(x => 2.0 * x + 1.0 + rnd.nextGaussian() * 1e-6)
    val r = PolyTrend.classify(y, 0.01).get
    assert(r.trendType == 1)
    assert(math.abs(r.slope - 2.0) < 1e-3)
    assert(r.direction == 1 && r.significance == 1 && r.degree == 1)
  }

  test("flat noise → no trend") {
    val rnd = new scala.util.Random(42)
    val y = linspace(40)(_ => 5.0 + rnd.nextGaussian() * 0.5)
    val r = PolyTrend.classify(y, 0.05).get
    assert(r.trendType == 0)
    assert(r.significance == -1)
  }

  test("odd cubic with zero net linear change → concealed") {
    // Symmetric cubic centered at midpoint: strong deg-3 fit, slope of the
    // *linear* fit nonzero? For pure odd cubic the linear projection IS
    // significant, so mix in a sign-alternating shape: t^3 - k t has zero
    // linear correlation when k = E[t^4]/E[t^2] (Gram-Schmidt residual).
    val n = 31
    val c = (n + 1) / 2.0
    val ts = linspace(n)(x => x - c)
    val e2 = ts.map(t => t * t).sum
    val e4 = ts.map(t => t * t * t * t).sum
    val k = e4 / e2
    val rnd = new scala.util.Random(3)
    val y = ts.map(t => 0.05 * (t * t * t - k * t) + rnd.nextGaussian() * 0.05)
    val r = PolyTrend.classify(y, 0.05).get
    assert(r.trendType == -1, s"got $r")
    assert(r.degree == 3)
    assert(r.significance == -1)
  }

  test("pure quadratic → quadratic or concealed by net-change rule") {
    val n = 25
    val c = (n + 1) / 2.0
    val rnd = new scala.util.Random(9)
    val y = linspace(n) { x => val t = x - c; 0.1 * t * t + rnd.nextGaussian() * 0.05 }
    val r = PolyTrend.classify(y, 0.01).get
    // symmetric parabola: no net linear change → concealed, degree 2
    assert(r.degree == 2)
    assert(r.trendType == -1)
  }

  test("monotone cubic → cubic trend with direction") {
    val n = 30
    val c = (n + 1) / 2.0
    val rnd = new scala.util.Random(5)
    val y = linspace(n) { x =>
      val t = x - c; 0.02 * t * t * t + 2.0 * t + rnd.nextGaussian() * 0.1
    }
    val r = PolyTrend.classify(y, 0.05).get
    assert(r.trendType == 3)
    assert(r.direction == 1)
  }

  test("too-short series → None, no crash (Appendix A.5/A.6)") {
    assert(PolyTrend.classify(Array(1.0, 2.0, 3.0), 0.05).isEmpty)
  }

  // ------------------------------------------------------------------ Stl

  test("STL separates sine seasonal from linear trend") {
    val n = 120
    val period = 12
    val y = Array.tabulate(n)(i =>
      10.0 + 0.05 * i + 2.0 * math.sin(2 * math.Pi * i / period))
    val d = Stl.decompose(y, period)
    // trend should track 10 + 0.05 i away from the edges
    var maxTrendErr = 0.0
    for (i <- period until n - period) {
      maxTrendErr = math.max(maxTrendErr,
        math.abs(d.trend(i) - (10.0 + 0.05 * i)))
    }
    assert(maxTrendErr < 0.35, s"trend err $maxTrendErr")
    // seasonal should approximate the sine
    var maxSeasErr = 0.0
    for (i <- 0 until n) {
      maxSeasErr = math.max(maxSeasErr,
        math.abs(d.seasonal(i) - 2.0 * math.sin(2 * math.Pi * i / period)))
    }
    assert(maxSeasErr < 0.4, s"seasonal err $maxSeasErr")
    // components must recompose exactly
    for (i <- 0 until n)
      assert(math.abs(d.trend(i) + d.seasonal(i) + d.remainder(i) - y(i)) < 1e-9)
  }

  test("STL seasonal sums to ~0 over each period") {
    val n = 96
    val period = 12
    val rnd = new scala.util.Random(11)
    val y = Array.tabulate(n)(i =>
      5.0 + math.sin(2 * math.Pi * i / period) + rnd.nextGaussian() * 0.1)
    val d = Stl.decompose(y, period)
    val s = d.seasonal.take(period).sum
    assert(math.abs(s) < 0.2, s"seasonal period sum $s")
  }

  // ---------------------------------------------------------------- Dbest

  test("DBEST finds the step breakpoint in sine+step series") {
    val n = 120
    val period = 12
    val stepAt = 60
    val y = Array.tabulate(n)(i =>
      10.0 + (if (i >= stepAt) 5.0 else 0.0) +
        2.0 * math.sin(2 * math.Pi * i / period))
    val p = Dbest.Params(seasonality = period, duration = 12,
      firstLevelShift = 0.3, secondLevelShift = 1.0, breakpointsNo = 3)
    val r = Dbest.changeDetection(y, p)
    assert(r.changes.nonEmpty)
    val top = r.changes.head
    // STL's loess (span ~19) smears the step over its window, so the
    // steepest generalized segment lands near — not exactly at — the
    // step index.
    val mid = (top.start + top.end) / 2.0
    assert(math.abs(mid - stepAt) <= 12,
      s"top change [${top.start},${top.end}] vs step $stepAt")
    assert(math.abs(top.change) > 2.0)
    assert(r.segmentNo >= 2)
  }

  test("DBEST ramp is non-abrupt; generalization errors are small") {
    val n = 120
    val period = 12
    val y = Array.tabulate(n)(i =>
      10.0 + 0.03 * i + math.sin(2 * math.Pi * i / period))
    val g = Dbest.generalization(y, Dbest.Params(seasonality = period))
    assert(g.segmentNo >= 1)
    // fit tracks the trend; residuals dominated by the seasonal amplitude
    assert(g.rmse < 1.5, s"rmse ${g.rmse}")
    assert(g.mad < 1.5, s"mad ${g.mad}")
    val c = Dbest.changeDetection(y,
      Dbest.Params(seasonality = period, firstLevelShift = 10.0,
        secondLevelShift = 10.0))
    assert(c.changes.forall(_.changeType == 0), "ramp must be non-abrupt")
  }

  test("DBEST generalization f_local is the fit's per-step delta, not the fit") {
    // two-segment piecewise-linear series: slope +1 for 30 steps, then
    // slope -2 — f_local must recover exactly those segment slopes
    // (reference decode slot 8 "Trend local change",
    // `calculations/dbest.py:385-394,409-424`)
    val n = 61
    val y = Array.tabulate(n)(i =>
      if (i <= 30) i.toDouble else 30.0 - 2.0 * (i - 30))
    val g = Dbest.generalization(y,
      Dbest.Params(dataType = "non-cyclical", distanceThreshold = Some(0.1)))
    assert(g.fLocal.length == n)
    assert(g.fLocal(0) == 0.0)
    (1 to 30).foreach(i =>
      assert(math.abs(g.fLocal(i) - 1.0) < 1e-9, s"fLocal($i)=${g.fLocal(i)}"))
    (31 until n).foreach(i =>
      assert(math.abs(g.fLocal(i) + 2.0) < 1e-9, s"fLocal($i)=${g.fLocal(i)}"))
    // and it is NOT a copy of the fit (the r3 placeholder bug)
    assert(!g.fLocal.sameElements(g.fit))
    assert(g.segmentNo == 2)
  }

  test("DBEST multi-change: two planted steps -> two changes, ranked") {
    val n = 90
    // two steps: +8 at i=30, +4 more at i=60 — the larger must rank first
    val y = Array.tabulate(n)(i =>
      2.0 + (if (i >= 30) 8.0 else 0.0) + (if (i >= 60) 4.0 else 0.0))
    val p = Dbest.Params(dataType = "non-cyclical", duration = 10,
      firstLevelShift = 1.0, secondLevelShift = 1.0, breakpointsNo = 3)
    val r = Dbest.changeDetection(y, p)
    assert(r.changes.length >= 2, s"wanted 2 changes, got ${r.changes.length}")
    val c0 = r.changes(0)
    val c1 = r.changes(1)
    // ranked by |change| descending
    assert(math.abs(c0.change) >= math.abs(c1.change))
    assert(math.abs(c0.change - 8.0) < 1.0, s"top change ${c0.change}")
    assert(math.abs(c1.change - 4.0) < 1.0, s"2nd change ${c1.change}")
    // located at the planted indices, both abrupt
    assert(math.abs((c0.start + c0.end) / 2.0 - 30) <= 2, s"$c0")
    assert(math.abs((c1.start + c1.end) / 2.0 - 60) <= 2, s"$c1")
    assert(c0.changeType == 1 && c1.changeType == 1)
  }

  test("DBEST non-cyclical detects on raw series (Appendix A.4)") {
    val n = 60
    val y = Array.tabulate(n)(i => if (i >= 30) 10.0 else 2.0)
    val p = Dbest.Params(dataType = "non-cyclical", duration = 10,
      firstLevelShift = 1.0, secondLevelShift = 1.0)
    val r = Dbest.changeDetection(y, p)
    assert(r.changes.nonEmpty)
    val top = r.changes.head
    assert(math.abs(top.change) > 5.0)
    assert(top.changeType == 1, s"step must be abrupt: $top")
  }
}
