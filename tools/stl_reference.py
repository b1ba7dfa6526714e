#!/usr/bin/env python3
"""Independent STL reference for the k5_stl_golden fixture.

An INDEPENDENT numpy implementation of the periodic-seasonal STL
variant (Cleveland, Cleveland, McRae & Terpenning 1990, "STL: A
Seasonal-Trend Decomposition Procedure Based on Loess"; the
s.window="periodic" simplification: one seasonal value per cycle
position), written from the published procedure — NOT a port of the
engine's Scala code. The engine (graft.ts.Stl) is verified against
these goldens at 1e-6 absolute tolerance by the k5_stl_golden driver
entry and StlGoldenSpec: an error in either implementation's loess
weights, neighborhoods, or loop structure would not be replicated by
the other, which is the verification value R's stl() would have
provided (R is not available in this sandbox).

Algorithm spec shared by both implementations:
  - loess: tricube-weighted LOCAL LINEAR fit over the q nearest
    indices (window clipped at the boundaries, h = max distance to a
    window end), evaluated at the target point; singular fits fall
    back to the weighted mean.
  - decompose(y, period, inner=2, outer): repeat inner times
    {detrend; per-cycle-position (robust-)weighted means; center to
    zero mean over one period; deseasonalize; trend = loess(deseason,
    nextOdd(1.5*period))}; each outer iteration recomputes bisquare
    robustness weights from |residual| / (6*median|residual|).
  - remainder = y - trend - seasonal.

INDEPENDENCE SCOPE (r10 advisory): the two implementations share the
spec above BY DESIGN — including its discretionary choices (boundary
window clipping, h = max distance to a window end, singular-fit
fallback to the weighted mean, nextOdd(1.5*period) trend span,
6*median bisquare scale). The cross-check therefore catches
IMPLEMENTATION bugs (weights, neighborhoods, loop structure) but NOT
an error in those shared spec-level choices; validating one series
against statsmodels/R STL offline remains the stronger check when
those tools are available.

Run from the repo root: python3 tools/stl_reference.py
Writes fixtures/stl_golden.parquet (committed; FIXTURES.md row A4).
"""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def loess(y, q, rw=None):
    n = len(y)
    span = min(max(q, 3), max(n, 3))
    out = np.empty(n)
    for i in range(n):
        lo = i - (span - 1) // 2
        hi = lo + span - 1
        if lo < 0:
            hi = min(n - 1, hi - lo)
            lo = 0
        if hi > n - 1:
            lo = max(0, lo - (hi - (n - 1)))
            hi = n - 1
        idx = np.arange(lo, hi + 1)
        h = max(i - lo, hi - i, 1)
        u = np.abs(idx - i) / h
        w = np.where(u < 1.0, (1.0 - u ** 3) ** 3, 0.0)
        if rw is not None:
            w = w * rw[lo:hi + 1]
        sw = w.sum()
        if sw == 0.0:
            out[i] = y[i]
            continue
        x = (idx - i).astype(float)
        yy = y[lo:hi + 1]
        swx = (w * x).sum()
        swxx = (w * x * x).sum()
        swy = (w * yy).sum()
        swxy = (w * x * yy).sum()
        det = sw * swxx - swx * swx
        if abs(det) < 1e-12 * max(sw * swxx, 1.0):
            out[i] = swy / sw
        else:
            b = (sw * swxy - swx * swy) / det
            out[i] = (swy - b * swx) / sw  # a + b*0
    return out


def next_odd(x):
    c = int(np.ceil(x))
    return c + 1 if c % 2 == 0 else c


def decompose(y, period, inner_iters=2, outer_iters=0):
    y = np.asarray(y, dtype=float)
    n = len(y)
    assert period >= 2 and n >= 2 * period
    trend_span = next_odd(1.5 * period)
    trend = np.zeros(n)
    seasonal = np.zeros(n)
    rw = None
    phases = np.arange(n) % period
    for outer in range(outer_iters + 1):
        for _ in range(inner_iters):
            detr = y - trend
            w = np.ones(n) if rw is None else rw
            phase_mean = np.array([
                (w[phases == p] * detr[phases == p]).sum() / w[phases == p].sum()
                if w[phases == p].sum() > 0 else 0.0
                for p in range(period)])
            phase_mean = phase_mean - phase_mean.sum() / period
            seasonal = phase_mean[phases]
            trend = loess(y - seasonal, trend_span, rw)
        if outer < outer_iters:
            abs_res = np.abs(y - trend - seasonal)
            h = 6.0 * np.median(abs_res)
            if h <= 0:
                rw = np.ones(n)
            else:
                u = abs_res / h
                rw = np.where(u < 1.0, (1.0 - u ** 2) ** 2, 0.0)
    remainder = y - trend - seasonal
    return trend, seasonal, remainder


def series():
    """Three fixed, fully deterministic series (no RNG — 'noise' is an
    incommensurate-frequency sine, so regeneration is bit-stable)."""
    t120 = np.arange(120, dtype=float)
    # 1: monthly sine + linear ramp + deterministic pseudo-noise
    s1 = np.sin(2 * np.pi * t120 / 12) + 0.01 * t120 + \
        0.05 * np.sin(t120 * 0.7321)
    # 2: monthly sine + level step at t=60 (the sine12-step fixture)
    s2 = np.sin(2 * np.pi * t120 / 12) + np.where(t120 >= 60, 1.5, 0.0) + \
        0.05 * np.sin(t120 * 1.1173)
    # 3: period-4 cycle (K3's seasonality) + mild quadratic, robust
    #    variant (outer=1) with two planted outliers
    t48 = np.arange(48, dtype=float)
    s3 = np.array([0.5, -0.2, -0.6, 0.3] * 12) + 0.0005 * (t48 - 24) ** 2
    s3[10] += 4.0
    s3[33] -= 3.5
    return [
        (1, 12, 0, s1),
        (2, 12, 0, s2),
        (3, 4, 1, s3),
    ]


def main():
    rows = {k: [] for k in ["series_id", "period", "outer_iters", "idx",
                            "y", "trend_g", "seasonal_g", "remainder_g"]}
    for sid, period, outer, y in series():
        tr, se, re = decompose(y, period, inner_iters=2, outer_iters=outer)
        for i in range(len(y)):
            rows["series_id"].append(sid)
            rows["period"].append(period)
            rows["outer_iters"].append(outer)
            rows["idx"].append(i)
            rows["y"].append(float(y[i]))
            rows["trend_g"].append(float(tr[i]))
            rows["seasonal_g"].append(float(se[i]))
            rows["remainder_g"].append(float(re[i]))
    table = pa.table({
        "series_id": pa.array(rows["series_id"], pa.int32()),
        "period": pa.array(rows["period"], pa.int32()),
        "outer_iters": pa.array(rows["outer_iters"], pa.int32()),
        "idx": pa.array(rows["idx"], pa.int32()),
        "y": pa.array(rows["y"], pa.float64()),
        "trend_g": pa.array(rows["trend_g"], pa.float64()),
        "seasonal_g": pa.array(rows["seasonal_g"], pa.float64()),
        "remainder_g": pa.array(rows["remainder_g"], pa.float64()),
    })
    import os
    os.makedirs("fixtures", exist_ok=True)
    pq.write_table(table, "fixtures/stl_golden.parquet")
    print(f"wrote fixtures/stl_golden.parquet: {table.num_rows} rows, "
          f"{len(series())} series")


if __name__ == "__main__":
    main()
