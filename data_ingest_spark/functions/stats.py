"""Portable statistical scalar expressions.

The driver checks correctness by running each Spark query next to a
DuckDB oracle, so any math used inside an oracle-checked operator must
be expressible with functions BOTH engines evaluate identically
(IEEE-754 double arithmetic + exp/ln). The normal CDF below is the
Abramowitz–Stegun 7.1.26 rational approximation of erf (|err| < 1.5e-7)
written as one SQL expression string: the same text is compiled by
Spark (`F.expr`) and by DuckDB, guaranteeing structural parity.

Used by operators/emptydrops.py (M1) to replace DropletUtils'
Monte-Carlo null with a deterministic normal approximation
(reference: /root/reference/src/2-1_Compute-metrics_emptyDrops.r:32-60).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Abramowitz & Stegun 7.1.26 constants.
_P = 0.3275911
_A1, _A2, _A3, _A4, _A5 = (0.254829592, -0.284496736, 1.421413741,
                           -1.453152027, 1.061405429)


def normal_cdf_sql(z_expr: str) -> str:
    """Return a SQL expression string for Phi(z) = P(Z <= z), portable
    across Spark SQL and DuckDB. ``z_expr`` must be a SQL expression
    (column reference or arithmetic)."""
    x = f"(abs({z_expr}) / sqrt(2.0))"
    t = f"(1.0 / (1.0 + {_P} * {x}))"
    poly = (f"((((({_A5} * {t} + {_A4}) * {t} + {_A3}) * {t} "
            f"+ {_A2}) * {t} + {_A1}) * {t})")
    erf = f"(1.0 - {poly} * exp(-({x}) * ({x})))"
    sign = f"(CASE WHEN ({z_expr}) < 0 THEN -1.0 WHEN ({z_expr}) > 0 THEN 1.0 ELSE 0.0 END)"
    return f"(0.5 * (1.0 + {sign} * {erf}))"


def normal_cdf(z_col: str) -> Column:
    """Spark Column form of :func:`normal_cdf_sql` over a column name."""
    return F.expr(normal_cdf_sql(z_col))


def epoch_seconds(c: Column | str) -> Column:
    """Seconds since the epoch as a double (microsecond precision).

    Safe for TIMESTAMP and TIMESTAMP_NTZ inputs alike: Spark refuses a
    direct NTZ→double cast, so the column goes through TIMESTAMP_LTZ
    first. With the session timezone pinned to UTC (session.py) the NTZ
    reading matches DuckDB's ``epoch(ts)`` naive-as-UTC semantics.
    Numeric inputs round-trip unchanged, so callers may pass columns
    that are already epoch seconds."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("timestamp_ltz").cast("double")
