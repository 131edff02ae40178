"""Bench harness contract: every HEADLINE name resolves in the
registry (a typo would silently drop it from the driver's per-round
record), and the emitted JSON line stays inside the driver's ~2 KB
tail capture (the r4 record was lost to an oversized line)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_headline_names_resolve():
    import bench
    from data_ingest_spark.harness import registry
    missing = [n for n in bench.HEADLINE if n not in registry.REGISTRY]
    assert missing == [], f"HEADLINE names not in registry: {missing}"


def test_emitted_line_fits_tail_capture():
    """Worst case: every query 99.99 s, all three canary slots, and a
    FULL 4-entry spread dict of the longest names (the r9 cap) — the
    line must still fit the driver's ~2 KB tail capture."""
    import bench
    fake = {n: 99.99 for n in bench.HEADLINE}
    longest = sorted(bench.HEADLINE, key=len)[-4:]
    line = json.dumps({
        "metric": "headline_queries_total",
        "value": round(sum(fake.values()), 2),
        "unit": "sec",
        "queries": fake,
        "sf": 0.1,
        "canary": {"start": 99.99, "mid": 99.99, "end": 99.99},
        "spread": {n: 99.9 for n in longest},
    }, separators=(",", ":"))
    assert len(line) < 2000, len(line)


def test_canary_is_headline_member():
    import bench
    assert bench.CANARY in bench.HEADLINE
    assert bench.SPREAD_TRIGGER > 1.0
