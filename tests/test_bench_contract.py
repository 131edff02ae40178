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
    import bench
    fake = {n: 99.99 for n in bench.HEADLINE}
    line = json.dumps({
        "metric": "headline_queries_total",
        "value": round(sum(fake.values()), 2),
        "unit": "sec",
        "queries": fake,
        "sf": 0.1,
    }, separators=(",", ":"))
    assert len(line) < 2048, len(line)
