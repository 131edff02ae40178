"""Driver-materialization guards for the sanctioned small-data
fallbacks.

A handful of science operators keep a driver-side variant (collect the
reduced matrix / edge list, run numpy) because at reference scale that
is exactly the object Seurat holds in memory (the reference pipeline is
single-node R: /root/reference/src/QC_helpers/dataIntegration.r,
configureEmbedding.r). Those variants must never silently run on a
cluster-sized input: every one of them calls
:func:`assert_driver_ceiling` BEFORE collecting, so a too-large input
fails fast with a pointer at the distributed sibling instead of OOMing
the driver — the same posture as ``knn_auto``'s staging ceiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Default ceiling for driver-side materialization: 1M rows of a
#: ~50-dim reduced matrix is ~400 MB on the driver — the documented
#: upper bound for the sanctioned fallbacks. Override per-call.
DRIVER_ROWS_CEILING = 1_000_000


#: Default ceiling for broadcast-cartesian pair enumeration (exact MNN
#: anchor search): 100M pairs ≈ a few GB of shuffled (ids, int64) rows
#: — comfortably within one stage locally, catastrophically wrong at
#: 10⁶ × 10⁶. Override per-call.
PAIR_CEILING = 100_000_000


def assert_pair_ceiling(n_a: int, n_b: int, what: str, alternative: str,
                        ceiling: int | None = None) -> int:
    """Raise if an all-pairs step would enumerate more than ``ceiling``
    pairs. Takes the two side counts (callers usually have them from
    cheap aggregates); returns the pair count."""
    lim = PAIR_CEILING if ceiling is None else ceiling
    n = n_a * n_b
    if n > lim:
        raise ValueError(
            f"{what}: {n_a:,} x {n_b:,} = {n:,} candidate pairs, above "
            f"the broadcast-cartesian ceiling of {lim:,}. This is the "
            f"exact correctness anchor; for inputs this size use "
            f"{alternative}.")
    return n


def assert_driver_ceiling(df: DataFrame, what: str, alternative: str,
                          ceiling: int | None = None) -> int:
    """Count ``df`` (bounded) and raise if it exceeds the driver-side
    ceiling.

    Returns the row count, saturated at ceiling+1: the count runs
    under a ``limit(ceiling + 1)`` so the guard's cost is bounded even
    when the input plan is expensive — an over-limit input is rejected
    after producing just enough rows to prove it, not after a full
    evaluation (no caller uses the exact count; they collect right
    after, which is the real evaluation)."""
    lim = DRIVER_ROWS_CEILING if ceiling is None else ceiling
    n = df.limit(lim + 1).count()
    if n > lim:
        raise ValueError(
            f"{what}: input has more than {lim:,} rows, above the "
            f"driver-side ceiling. This is the sanctioned small-data "
            f"fallback; for inputs this size use {alternative}.")
    return n
