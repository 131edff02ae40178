"""Driver-contract guard: __spark_entry__ must keep the exact surface
the harness calls — entry(spark) with rows and a stable schema,
queries()/oracle_sql() as dicts with matching keys and aligned column
names (the driver hashes values under sorted column names, so a
Spark/oracle column-name drift breaks the gate even when values
match)."""

import importlib.util
import os

import pytest


@pytest.fixture(scope="module")
def entry_mod():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows_with_stable_schema(spark, entry_mod):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["sample", "barcode", "ncount", "nfeature",
                          "mean_normalized"]


def test_registry_contract_shapes(entry_mod):
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    assert len(q) >= 130 and len(o) >= 125
    assert set(o) <= set(q)
    rows_only = set(q) - set(o)
    # Round 7 closed the rows-only list entirely (round-6 verdict ask
    # #4, the m6_vst pattern): every registry query carries a full
    # DuckDB value oracle. The retired declarations' operators stay
    # under tests/test_ml_pipeline.py property tests; their oracled
    # twins (x99_power_pc1, m9_integrate_exact, m13_louvain_dist)
    # remain registered.
    assert rows_only == set()
    assert all(callable(fn) for fn in q.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper()
               for s in o.values())


def test_rotation_priority_names_resolve(spark):
    """Every name in the driver-sample priority list must exist in the
    registry (a typo would silently drop it from the rotation), and
    the newest oracled additions must lead the prefix the bounded
    driver sample reads."""
    from data_ingest_spark.harness import registry
    missing = [n for n in registry._ROUND4_PRIORITY
               if n not in registry.REGISTRY]
    assert missing == []
    front = list(registry.queries())[:50]
    assert front == list(registry._ROUND7_PRIORITY)
    assert len(registry._ROUND7_PRIORITY) == 50
    # every fronted name is oracle-paired
    oracles = registry.oracle_sql()
    assert all(n in oracles for n in registry._ROUND7_PRIORITY)
    # Round-7 discipline (round-6 verdict ask #1, extended to the
    # round-7 additions): the first 22 slots are EXACTLY the round-6
    # verdict's never-driver-verified tail IN ITS ORDER; every oracled
    # query with no driver verdict across CORRECTNESS_r02-r06
    # (including queries added in round 7 itself) must be somewhere in
    # the front-50, so a green r07 leaves the never-sampled backlog at
    # ZERO; every remaining slot re-samples a query already
    # driver-green in round 2 (regression re-confirmation — never a
    # query that would displace the backlog).
    import json as _json
    import os as _os
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    seen = set()
    r2 = set()
    for rnd in (2, 3, 4, 5, 6):
        p = _os.path.join(repo, f"CORRECTNESS_r0{rnd}.json")
        if _os.path.exists(p):
            with open(p) as fh:
                keys = set(_json.load(fh))
            seen |= keys
            if rnd == 2:
                r2 = keys
    if seen:
        r6_tail = [
            "e30_peak_concurrency", "e31_pattern_negation",
            "e32_decay_attribution", "e33_hourly_xcorr",
            "e34_cusum_changepoint", "e35_kaplan_meier",
            "e36_seasonal_backtest", "p5_gopher_gate",
            "x141_fellegi_sunter", "x142_lsh_precision",
            "x143_sorted_neighborhood", "x144_bot_regularity",
            "x145_token_fertility", "x146_gini_source",
            "x147_js_divergence", "x148_winnowing",
            "x149_rbo", "x150_kendall_tau", "x151_term_dispersion",
            "x152_k_anonymity", "x153_srm_check",
            "x154_stratified_uplift"]
        assert list(registry._ROUND7_PRIORITY[:22]) == r6_tail
        never = {n for n, (fn, sql) in registry.REGISTRY.items()
                 if sql is not None and n not in seen}
        fronted = set(registry._ROUND7_PRIORITY)
        assert never <= fronted, (
            f"never-driver-verified queries missing from the front-50: "
            f"{never - fronted}")
        resample = fronted - never
        assert resample <= r2, (
            f"re-sample slots must hold r2-verified queries only: "
            f"{resample - r2}")
