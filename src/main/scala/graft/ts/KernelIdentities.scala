package graft.ts

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Flag expressions for the kernel structural identities
  * (`k3_fit_identity`, `k4_flocal_identity`, `k5_seasonal_identity`).
  *
  * Shared between the driver entries and KernelSpec so the spec can
  * prove the flags are NON-VACUOUS: each one flips to 0 on a
  * deliberately corrupted payload (a fit bent off its line, an f_local
  * that is a copy of fit instead of its delta — the exact bug class
  * the r3 verdict caught). Without those negative tests a
  * constant-1 oracle column would also pass with `lit(1)`.
  */
object KernelIdentities {

  /** 1 iff the piecewise-linear fit has ~zero second difference
    * strictly inside every reported `(start, end)` segment. Expects
    * array columns `start`, `end` (int) and `fit` (double).
    */
  val plZeroCurvature: Column = expr(
    """CAST(aggregate(zip_with(`start`, `end`, (s, e) ->
      CASE WHEN e - s >= 2 THEN aggregate(sequence(s + 1, e - 1), 0D,
        (acc, i) -> greatest(acc,
          abs(fit[i + 1] - 2 * fit[i] + fit[i - 1])))
      ELSE 0D END), 0D,
      (acc, m) -> greatest(acc, m)) <= 1e-6 AS INT)""")

  /** 1 iff the fit equals the trend at every reported segment
    * endpoint (the interpolation passes through its vertices). Expects
    * `start`, `end`, `fit`, `trend`.
    */
  val fitEqTrendAtVertices: Column = expr(
    """CAST(aggregate(zip_with(`start`, `end`, (s, e) ->
      greatest(abs(fit[s] - trend[s]), abs(fit[e] - trend[e]))), 0D,
      (acc, m) -> greatest(acc, m)) <= 1e-9 AS INT)""")

  /** 1 iff `f_local` is exactly the first difference of `fit`. */
  val flocalIsFitDelta: Column = expr(
    """CAST(aggregate(sequence(1, size(fit) - 1), true,
      (acc, i) -> acc AND f_local[i] = fit[i] - fit[i - 1]) AS INT)""")

  /** 1 iff `f_local` is zero-anchored at index 0. */
  val flocalZeroAnchor: Column = expr("CAST(f_local[0] = 0D AS INT)")

  /** 1 iff the stored `rmse` recomputes from the `(fit, data)` payload:
    * sqrt of the mean squared residual, accumulated in series order —
    * the same left-to-right summation [[Dbest.generalization]] performs,
    * so agreement is ~1 ulp and 1e-9 is deterministic.
    */
  val rmseRecomputes: Column = expr(
    """CAST(abs(rmse - sqrt(
      aggregate(zip_with(fit, data, (f, y) -> (f - y) * (f - y)), 0D,
        (acc, v) -> acc + v) / size(fit))) <= 1e-9 AS INT)""")

  /** 1 iff the stored `mad` recomputes from `(fit, data)`: the median
    * absolute residual, even-length median as the mean of the two
    * middles (Dbest.scala:272-275).
    */
  val madRecomputes: Column = expr(
    """CAST(abs(mad - (CASE WHEN size(fit) % 2 = 1
      THEN array_sort(zip_with(fit, data, (f, y) -> abs(f - y)))[size(fit) div 2]
      ELSE (array_sort(zip_with(fit, data, (f, y) -> abs(f - y)))[size(fit) div 2 - 1]
          + array_sort(zip_with(fit, data, (f, y) -> abs(f - y)))[size(fit) div 2]) / 2
      END)) <= 1e-12 AS INT)""")

  /** 1 iff the generalized fit is piecewise-linear with at most
    * `segment_no` pieces: interior points where the second difference
    * is non-zero are the interior vertices, and a `segment_no`-piece
    * polyline has at most `segment_no - 1` of them.
    */
  val curvatureBreaksBounded: Column = expr(
    """CAST(CASE WHEN size(fit) < 3 THEN 0
      ELSE aggregate(sequence(1, size(fit) - 2), 0,
        (acc, i) -> acc + CASE WHEN
          abs(fit[i + 1] - 2 * fit[i] + fit[i - 1]) > 1e-6
          THEN 1 ELSE 0 END) END <= segment_no - 1 AS INT)""")
}
