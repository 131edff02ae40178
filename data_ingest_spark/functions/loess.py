"""Local polynomial regression (loess) in plain numpy.

Seurat's FindVariableFeatures(vst) fits ``loess(log10(var) ~
log10(mean), span=0.3, degree=2)`` over the per-gene moments —
~10⁴–10⁵ points regardless of cell count, so the fit is a driver-side
step (the distributed pass consumes its predictions as a broadcast
table). This container has no scipy/statsmodels, so the classic
tricube-weighted local fit is implemented directly: for each target
point take the ``ceil(span·n)`` nearest neighbors in x, weight by
tricube of scaled distance, solve the degree-2 weighted least squares
via normal equations.

Reference semantics: R stats::loess with surface="direct"
(exact fit at every point, no interpolation kd-tree), degree=2,
family="gaussian" — the configuration Seurat v4 uses
(/root/reference/src/QC_helpers/dataIntegration.r:93,102 via
Seurat::FindVariableFeatures).
"""

from __future__ import annotations

import math

import numpy as np


def loess_fit(x: np.ndarray, y: np.ndarray, span: float = 0.3,
              degree: int = 2) -> np.ndarray:
    """Fitted values of a loess regression at every input point.

    O(n · q) with q = ceil(span·n): ~10⁸ flops at 30k points — a
    sub-second driver-side cost, deliberately NOT distributed (the
    points already fit on the driver and the fit needs global sorted
    neighborhoods).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = x.size
    if n == 0:
        return np.empty(0)
    if n == 1:
        return y.copy()
    q = max(degree + 1, int(math.ceil(span * n)))
    q = min(q, n)
    order = np.argsort(x, kind="stable")
    xs, ys = x[order], y[order]
    fitted_sorted = np.empty(n)
    for i in range(n):
        # nearest-q window in sorted x: slide [lo, lo+q) to minimize
        # max distance to xs[i]
        lo = min(max(i - q // 2, 0), n - q)
        while lo > 0 and xs[i] - xs[lo - 1] < xs[lo + q - 1] - xs[i]:
            lo -= 1
        while lo + q < n and xs[lo + q] - xs[i] < xs[i] - xs[lo]:
            lo += 1
        xi = xs[lo:lo + q] - xs[i]
        yi = ys[lo:lo + q]
        d = np.abs(xi)
        dmax = d.max()
        if dmax <= 0.0:
            fitted_sorted[i] = yi.mean()
            continue
        w = (1.0 - (d / dmax) ** 3) ** 3
        w[w < 0] = 0.0
        # design matrix in centered x: [1, xi, xi^2, ...]
        a = np.vander(xi, degree + 1, increasing=True)
        aw = a * w[:, None]
        beta, *_ = np.linalg.lstsq(aw.T @ a, aw.T @ yi, rcond=None)
        fitted_sorted[i] = beta[0]  # prediction at centered x = 0
    fitted = np.empty(n)
    fitted[order] = fitted_sorted
    return fitted
