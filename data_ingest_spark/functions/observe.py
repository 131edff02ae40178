"""Zero-cost pipeline metrics via Spark's Observation API.

``df.observe`` attaches aggregate metrics to a plan that are computed
DURING the action that materializes it — no second scan, no extra job.
This is the audit mechanism for long curation chains: row counts in/out
of each stage, null rates, redaction totals, all collected from the one
pass that writes the output. (A separate ``.count()`` per stage would
re-run the lineage — the eager-action anti-pattern this repo bans.)

Usage:
    stage, df = observe_stage(df, "after_dedup")
    df.write.parquet(out)           # metrics computed during the write
    audit = stage.get                # {'n_rows': ..., 'n_null_text': ...}
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, functions as F


def observe_stage(df: DataFrame, name: str,
                  extra: dict[str, Column] | None = None
                  ) -> tuple[Observation, DataFrame]:
    """Attach a named observation (row count + caller metrics) to the
    plan. Returns (observation, observed_df); read ``observation.get``
    AFTER an action has materialized the frame."""
    metrics = {"n_rows": F.count(F.lit(1)), **(extra or {})}
    obs = Observation(name)
    out = df.observe(obs, *[m.alias(k) for k, m in metrics.items()])
    return obs, out
