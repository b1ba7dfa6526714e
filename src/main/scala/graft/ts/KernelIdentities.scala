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
}
