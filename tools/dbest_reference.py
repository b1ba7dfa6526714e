#!/usr/bin/env python3
"""Independent DBEST change-detection reference for k3_dbest_golden
and (r12) generalization reference for k4_dbest_golden.

An INDEPENDENT numpy implementation of the DBEST change-detection
pipeline (Jamali, Jonsson, Eklundh, Ardo & Seaquist 2015, "Detecting
changes in vegetation trends using time series segmentation") as the
graft engine pins it down (SURVEY S7.4's reconstruction of the CRAN
package semantics): STL trend (cyclical data; raw series otherwise),
level-shift candidates with duration-window persistence, top-down
piecewise-linear vertex selection (Douglas-Peucker), peak/valley
reduction, segment ranking by |change| with a slope t-test for
significance. Written from the published procedure and the pinned
spec — NOT a port of the engine's Scala code (graft.ts.Dbest); the
engine is verified against these goldens by the k3_dbest_golden
driver entry and DbestGoldenSpec, the same role tools/stl_reference.py
plays for the loess weights (R's DBEST package is unavailable in this
sandbox).

Algorithm spec shared by both implementations (the discretionary
choices, pinned identically BY DESIGN — so, as with the STL goldens,
the cross-check catches IMPLEMENTATION bugs, not an error in these
shared spec-level choices):
  - trend: STL (period = seasonality, inner=2, outer=0) when the data
    is cyclical and n >= 2*period, else the raw series.
  - level shift at t: |T(t) - T(t-1)| >= firstLevelShift AND both
    duration-windows fit in range AND |mean T[t..t+dur-1] -
    mean T[t-dur..t-1]| >= secondLevelShift. Consecutive shift
    indices merge into one run (start-1, end) = one abrupt segment.
  - vertices: Douglas-Peucker on the trend with threshold
    3*sd(diff(T)) (sample sd; 1e-9 floor) unless given; strict
    dev > threshold split, first-max tie-break; run endpoints are
    forced vertices, interior run points are dropped; non-turning
    interior vertices are removed unless run endpoints (strict sign
    change of adjacent chord slopes, next taken from the RAW vertex
    list, prev from the kept list).
  - fit: piecewise-linear interpolation of the trend through the
    vertices.
  - segments: consecutive vertex pairs; change = T(b) - T(a); abrupt
    iff the pair IS a merged run; significance: segments of length
    >= 4 use the OLS slope p-value over T[a..b] (centered-index
    design, two-sided Student-t, dof = len-2) at alpha, shorter
    abrupt segments inherit 1, shorter gradual segments -1.
  - report: top breakpointsNo segments by (|change| desc, start asc).

Generalization (k4_dbest_golden, r12 — the DBEST "Generalization"
mode, calculations/dbest.py:385-394 semantics as SURVEY K4 pins them):
same trend extraction, Douglas-Peucker at the default 3*sd(diff)
threshold, turning-point reduction with NO forced level-shift keeps,
piecewise-linear fit through the vertices; payload = the fit series,
f_local (first difference of the fit, zero anchor at index 0),
RMSE = sqrt(mean((fit - y)^2)) and MAD = median(|fit - y|) against
the RAW series, segment_no = len(vertices) - 1.

Run from the repo root: python3 tools/dbest_reference.py
Writes fixtures/dbest_golden_series.parquet (per-index y + expected
piecewise-linear fit + params), fixtures/dbest_golden.parquet
(expected ranked changes) and fixtures/dbest_golden_gen.parquet
(expected generalization payload per index + per-series stats); all
committed (FIXTURES.md).
"""
import math
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from stl_reference import decompose


# ---- Student-t two-sided p-value without scipy ----------------------
def _betacf(a, b, x, itmax=200, eps=3e-14):
    # continued fraction for the regularized incomplete beta (Lentz)
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < 1e-300:
        d = 1e-300
    d = 1.0 / d
    h = d
    for m in range(1, itmax + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-300:
            d = 1e-300
        c = 1.0 + aa / c
        if abs(c) < 1e-300:
            c = 1e-300
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-300:
            d = 1e-300
        c = 1.0 + aa / c
        if abs(c) < 1e-300:
            c = 1e-300
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h


def _betainc(a, b, x):
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
             + a * math.log(x) + b * math.log(1.0 - x))
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def t_two_sided_p(t, dof):
    if math.isinf(t):
        return 0.0
    x = dof / (dof + t * t)
    return _betainc(dof / 2.0, 0.5, x)


def ols_slope_p(y):
    """Two-sided p-value of the degree-1 slope over a centered-index
    design — the graft.ts.Ols.fit(y, 1).leadingP quantity."""
    n = len(y)
    assert n > 2
    c = (n + 1) / 2.0
    x = np.arange(1, n + 1, dtype=float) - c   # sums to 0 exactly
    sxx = float((x * x).sum())
    b1 = float((x * y).sum()) / sxx
    b0 = float(np.mean(y))
    res = y - (b0 + b1 * x)
    sse = float((res * res).sum())
    dof = n - 2
    sigma2 = sse / dof
    se1 = math.sqrt(max(sigma2 / sxx, 0.0))
    if se1 == 0.0:
        return 0.0 if b1 != 0.0 else 1.0
    return t_two_sided_p(abs(b1 / se1), dof)


# ---- DBEST change detection ----------------------------------------
def sd(xs):
    if len(xs) < 2:
        return 0.0
    m = float(np.mean(xs))
    return math.sqrt(float(((xs - m) ** 2).sum()) / (len(xs) - 1))


def default_distance(trend):
    d = np.diff(trend)
    s = 3.0 * sd(d)
    return s if s > 0 else 1e-9


def level_shifts(trend, first, second, dur):
    n = len(trend)
    dur = max(dur, 1)
    out = []
    for t in range(1, n):
        if abs(trend[t] - trend[t - 1]) >= first:
            lo, hi = t - dur, t + dur - 1
            if lo >= 0 and hi < n:
                mb = float(trend[lo:t].sum()) / dur
                ma = float(trend[t:hi + 1].sum()) / dur
                if abs(ma - mb) >= second:
                    out.append(t)
    return out


def generalize(trend, threshold):
    n = len(trend)
    vertices = [0, n - 1]

    def max_dev(a, b):
        best, best_d = -1, 0.0
        ya, yb = trend[a], trend[b]
        for i in range(a + 1, b):
            yi = ya + (yb - ya) * (i - a) / (b - a)
            dev = abs(trend[i] - yi)
            if dev > best_d:
                best_d, best = dev, i
        return best, best_d

    def rec(a, b):
        if b - a < 2:
            return
        idx, dev = max_dev(a, b)
        if idx >= 0 and dev > threshold:
            vertices.append(idx)
            rec(a, idx)
            rec(idx, b)

    rec(0, n - 1)
    return sorted(vertices)


def turning_points(trend, vertices, keep):
    if len(vertices) <= 2:
        return list(vertices)
    out = [vertices[0]]
    for k in range(1, len(vertices) - 1):
        prev, v, nxt = out[-1], vertices[k], vertices[k + 1]
        d1 = trend[v] - trend[prev]
        d2 = trend[nxt] - trend[v]
        is_turn = (d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0)
        if is_turn or v in keep:
            out.append(v)
    out.append(vertices[-1])
    return out


def pl_fit(trend, vertices):
    fit = np.zeros(len(trend))
    for k in range(len(vertices) - 1):
        a, b = vertices[k], vertices[k + 1]
        for i in range(a, b + 1):
            fit[i] = trend[a] + (trend[b] - trend[a]) * (i - a) / max(b - a, 1)
    return fit


def change_detection(y, data_type, seasonality, first, second, dur,
                     bp_no, alpha):
    y = np.asarray(y, dtype=float)
    if data_type == "cyclical" and len(y) >= 2 * seasonality:
        trend, _, _ = decompose(y, seasonality)
    else:
        trend = y.copy()
    n = len(trend)
    thr = default_distance(trend)
    shifts = sorted(level_shifts(trend, first, second, dur))
    runs = []
    for t in shifts:
        if runs and t <= runs[-1][1] + 1:
            runs[-1] = (runs[-1][0], t)
        else:
            runs.append((max(t - 1, 0), t))
    abrupt = set(runs)
    keep = {i for ab in runs for i in ab if 0 <= i < n}
    raw = sorted({v for v in (set(generalize(trend, thr)) | keep)
                  if not any(a < v < b for a, b in runs)})
    vertices = turning_points(trend, raw, keep)
    fit = pl_fit(trend, vertices)

    segs = []
    for k in range(len(vertices) - 1):
        a, b = vertices[k], vertices[k + 1]
        is_ab = (a, b) in abrupt
        seg_len = b - a + 1
        if seg_len >= 4:
            p = ols_slope_p(trend[a:b + 1])
            # knife-edge guard: a p-value within 1e-3 of alpha would
            # make the integer significance fragile across engines
            assert abs(p - alpha) > 1e-3, (a, b, p)
            sig = 1 if p < alpha else -1
        elif is_ab:
            sig = 1
        else:
            sig = -1
        segs.append((a, b, float(trend[b] - trend[a]),
                     1 if is_ab else 0, sig))
    ranked = sorted(segs, key=lambda c: (-abs(c[2]), c[0]))[:max(bp_no, 0)]
    # r13: the per-series summary ints the polygon decode carries
    # (graft.ts.Dbest.Result semantics: breakpointNo = interior vertex
    # count capped by the segment count; segmentNo = all consecutive
    # vertex pairs, BEFORE the top-N ranking cut)
    bp_actual = min(len(vertices) - 2, max(len(segs), 0))
    return trend, fit, ranked, bp_actual, len(segs)


def generalization(y, data_type, seasonality):
    """DBEST Generalization mode: trend -> DP vertices at the default
    threshold -> turning-point reduction (no level-shift keeps) ->
    piecewise-linear fit; stats against the RAW series."""
    y = np.asarray(y, dtype=float)
    if data_type == "cyclical" and len(y) >= 2 * seasonality:
        trend, _, _ = decompose(y, seasonality)
    else:
        trend = y.copy()
    thr = default_distance(trend)
    vertices = turning_points(trend, generalize(trend, thr), set())
    fit = pl_fit(trend, vertices)
    res = fit - y
    rmse = math.sqrt(float((res * res).sum()) / max(len(y), 1))
    mad = float(np.median(np.abs(res)))
    f_local = np.zeros(len(y))
    f_local[1:] = np.diff(fit)
    return len(vertices) - 1, rmse, mad, fit, f_local


# ---- fixture series (deterministic; no RNG) ------------------------
def series():
    t120 = np.arange(120, dtype=float)
    # 1: cyclical monthly series, slope + 1.5 level step at t=60 —
    #    exercises the STL trend path, a merged shift run, and DP on a
    #    smoothed step
    s1 = (np.sin(2 * np.pi * t120 / 12) + 0.005 * t120 +
          np.where(t120 >= 60, 1.5, 0.0) + 0.05 * np.sin(t120 * 0.7321))
    # 2: non-cyclical piecewise-linear slopes +0.05 / -0.03 / +0.08
    #    with an incommensurate wobble — exercises DP + turning points
    #    with NO level shifts
    t80 = np.arange(80, dtype=float)
    s2 = (np.where(t80 < 30, 0.05 * t80,
          np.where(t80 < 60, 1.5 - 0.03 * (t80 - 30),
                   0.6 + 0.08 * (t80 - 60))) + 0.01 * np.sin(t80 * 0.9173))
    # 3: non-cyclical 2.0 step at t=30 over a mild slope — exercises
    #    the single-shift abrupt run and short-segment significance
    #    inheritance
    t60 = np.arange(60, dtype=float)
    s3 = 0.002 * t60 + np.where(t60 >= 30, 2.0, 0.0) + \
        0.01 * np.sin(t60 * 1.1173)
    #      (sid, dtype,         seas, first, second, dur, bp, alpha, y)
    return [(1, "cyclical", 12, 0.1, 0.2, 12, 3, 0.05, s1),
            (2, "non-cyclical", 12, 0.1, 0.2, 12, 3, 0.05, s2),
            (3, "non-cyclical", 12, 0.1, 0.2, 10, 3, 0.05, s3)]


def gen_extra_series():
    """K4-only fixture series (r12): the shared K3 series 1/3 carry a
    level step that inflates the DP threshold (3*sd(diff)) and
    generalize to a single chord — valid, but they exercise little of
    the piecewise fit. This one is cyclical with three gentle slope
    regimes and NO step, so the STL-trend path AND a multi-segment
    DP/turning-point fit are both exercised. K4-only so the committed
    K3 fixtures stay byte-identical."""
    t96 = np.arange(96, dtype=float)
    s4 = (np.sin(2 * np.pi * t96 / 12) * 0.8 +
          np.where(t96 < 32, 0.05 * t96,
                   np.where(t96 < 64, 1.6 - 0.03 * (t96 - 32),
                            0.64 + 0.07 * (t96 - 64))) +
          0.02 * np.sin(t96 * 0.8317))
    # 5 (r13): NON-CYCLICAL K4-only series — the generalization branch
    # that skips STL and fits the RAW series directly (the mode the
    # reference crashes on, calculations/dbest.py:94-95 / Appendix
    # A.4). Shared series 2/3 are also non-cyclical, but this one is
    # built FOR the branch: four slope regimes and no level step, so
    # the 3*sd(diff) DP threshold stays tight and the fixture pins a
    # genuine multi-segment raw-branch fit (not a single chord).
    t72 = np.arange(72, dtype=float)
    s5 = (np.where(t72 < 18, 0.06 * t72,
          np.where(t72 < 36, 1.08 - 0.04 * (t72 - 18),
          np.where(t72 < 54, 0.36 + 0.09 * (t72 - 36),
                   1.98 - 0.02 * (t72 - 54)))) +
          0.008 * np.sin(t72 * 1.2937))
    #      (sid, dtype,        seas, y)
    return [(4, "cyclical", 12, s4),
            (5, "non-cyclical", 12, s5)]


def main():
    ser_rows = {k: [] for k in
                ("series_id", "idx", "y", "fit_g", "data_type",
                 "seasonality", "duration", "first_shift", "second_shift",
                 "breakpoints_no", "alpha")}
    chg_rows = {k: [] for k in
                ("series_id", "rank", "start_g", "end_g", "change_g",
                 "change_type_g", "significance_g",
                 "breakpoint_no_g", "segment_no_g")}
    gen_rows = {k: [] for k in
                ("series_id", "idx", "y", "fit_g", "flocal_g",
                 "data_type", "seasonality", "segment_no_g",
                 "rmse_g", "mad_g")}
    for (sid, dtype, seas, first, second, dur, bp, alpha, y) in series():
        trend, fit, ranked, bp_actual, seg_no = change_detection(
            y, dtype, seas, first, second, dur, bp, alpha)
        assert ranked, f"series {sid} produced no changes"
        for i in range(len(y)):
            ser_rows["series_id"].append(sid)
            ser_rows["idx"].append(i)
            ser_rows["y"].append(float(y[i]))
            ser_rows["fit_g"].append(float(fit[i]))
            ser_rows["data_type"].append(dtype)
            ser_rows["seasonality"].append(seas)
            ser_rows["duration"].append(dur)
            ser_rows["first_shift"].append(first)
            ser_rows["second_shift"].append(second)
            ser_rows["breakpoints_no"].append(bp)
            ser_rows["alpha"].append(alpha)
        for r, (a, b, ch, ty, sg) in enumerate(ranked, start=1):
            chg_rows["series_id"].append(sid)
            chg_rows["rank"].append(r)
            chg_rows["start_g"].append(a)
            chg_rows["end_g"].append(b)
            chg_rows["change_g"].append(ch)
            chg_rows["change_type_g"].append(ty)
            chg_rows["significance_g"].append(sg)
            chg_rows["breakpoint_no_g"].append(bp_actual)
            chg_rows["segment_no_g"].append(seg_no)
        print(f"series {sid}: n={len(y)} vertices->changes "
              f"{[(a, b, round(ch, 4), ty, sg) for a, b, ch, ty, sg in ranked]}")
        seg_no, rmse, mad, gfit, flocal = generalization(y, dtype, seas)
        for i in range(len(y)):
            gen_rows["series_id"].append(sid)
            gen_rows["idx"].append(i)
            gen_rows["y"].append(float(y[i]))
            gen_rows["fit_g"].append(float(gfit[i]))
            gen_rows["flocal_g"].append(float(flocal[i]))
            gen_rows["data_type"].append(dtype)
            gen_rows["seasonality"].append(seas)
            gen_rows["segment_no_g"].append(seg_no)
            gen_rows["rmse_g"].append(rmse)
            gen_rows["mad_g"].append(mad)
        print(f"series {sid} generalization: segments={seg_no} "
              f"rmse={rmse:.6f} mad={mad:.6f}")
    for (sid, dtype, seas, y) in gen_extra_series():
        seg_no, rmse, mad, gfit, flocal = generalization(y, dtype, seas)
        for i in range(len(y)):
            gen_rows["series_id"].append(sid)
            gen_rows["idx"].append(i)
            gen_rows["y"].append(float(y[i]))
            gen_rows["fit_g"].append(float(gfit[i]))
            gen_rows["flocal_g"].append(float(flocal[i]))
            gen_rows["data_type"].append(dtype)
            gen_rows["seasonality"].append(seas)
            gen_rows["segment_no_g"].append(seg_no)
            gen_rows["rmse_g"].append(rmse)
            gen_rows["mad_g"].append(mad)
        print(f"series {sid} generalization (K4-only): segments={seg_no} "
              f"rmse={rmse:.6f} mad={mad:.6f}")

    schema_s = pa.schema([
        ("series_id", pa.int32()), ("idx", pa.int32()),
        ("y", pa.float64()), ("fit_g", pa.float64()),
        ("data_type", pa.string()), ("seasonality", pa.int32()),
        ("duration", pa.int32()), ("first_shift", pa.float64()),
        ("second_shift", pa.float64()), ("breakpoints_no", pa.int32()),
        ("alpha", pa.float64())])
    schema_c = pa.schema([
        ("series_id", pa.int32()), ("rank", pa.int32()),
        ("start_g", pa.int32()), ("end_g", pa.int32()),
        ("change_g", pa.float64()), ("change_type_g", pa.int32()),
        ("significance_g", pa.int32()),
        ("breakpoint_no_g", pa.int32()), ("segment_no_g", pa.int32())])
    schema_g = pa.schema([
        ("series_id", pa.int32()), ("idx", pa.int32()),
        ("y", pa.float64()), ("fit_g", pa.float64()),
        ("flocal_g", pa.float64()), ("data_type", pa.string()),
        ("seasonality", pa.int32()), ("segment_no_g", pa.int32()),
        ("rmse_g", pa.float64()), ("mad_g", pa.float64())])
    pq.write_table(pa.table(ser_rows, schema=schema_s),
                   "fixtures/dbest_golden_series.parquet")
    pq.write_table(pa.table(chg_rows, schema=schema_c),
                   "fixtures/dbest_golden.parquet")
    pq.write_table(pa.table(gen_rows, schema=schema_g),
                   "fixtures/dbest_golden_gen.parquet")
    print("wrote fixtures/dbest_golden_series.parquet, "
          "fixtures/dbest_golden.parquet and "
          "fixtures/dbest_golden_gen.parquet")


if __name__ == "__main__":
    main()
