"""LogNormalize / moments / scaling and join-operator tests."""

import math

import pyspark.sql.functions as F

from data_ingest_spark.operators import joins as jn, metrics as mx, normalize as nz


def test_log_normalize_value(expr):
    out = nz.log_normalize(expr)
    m = {(r["sample"], r["barcode"], r["gene"]): r["normalized"]
         for r in out.collect()}
    # b1 total = 10; ENSG1 count 5 -> log1p(5/10*1e4)
    assert abs(m[("s1", "b1", "ENSG1")] - math.log1p(5 / 10 * 1e4)) < 1e-9
    assert out.count() == expr.count()


def test_gene_moments_zero_inclusive(expr):
    """Variance must count the implicit zeros: 4 cells total."""
    m = {r["gene"]: (r["mean"], r["variance"])
         for r in nz.gene_moments(expr).collect()}
    # ENSG1 counts across 4 cells: 5, 50, 1, 0
    xs = [5.0, 50.0, 1.0, 0.0]
    mu = sum(xs) / 4
    var = sum((x - mu) ** 2 for x in xs) / 3
    assert abs(m["ENSG1"][0] - mu) < 1e-9
    assert abs(m["ENSG1"][1] - var) < 1e-9


def test_scale_data_clip_and_zero_variance(spark):
    norm = spark.createDataFrame(
        [("s", f"b{i}", "G1", float(i)) for i in range(4)]
        + [("s", f"b{i}", "G2", 7.0) for i in range(4)],
        "sample string, barcode string, gene string, normalized double")
    out = nz.scale_data(norm, clip_max=10.0)
    g2 = [r["scaled"] for r in out.filter(F.col("gene") == "G2").collect()]
    assert g2 == [0.0] * 4  # zero variance -> 0.0, not NULL (Seurat semantics)
    assert all(r["scaled"] <= 10.0 for r in out.collect())


def test_hvg_ranking(expr):
    top1 = nz.highly_variable_genes(expr, 1).collect()
    assert top1[0]["gene"] == "ENSG1"  # dominated by the 50-count cell


def test_loess_fit_reproduces_exact_quadratic():
    """A degree-2 local fit must reproduce data that IS a quadratic."""
    import numpy as np

    from data_ingest_spark.functions.loess import loess_fit

    rng = np.random.default_rng(7)
    x = np.sort(rng.uniform(-3, 3, 200))
    y = 2.0 + 3.0 * x + 0.5 * x * x
    fitted = loess_fit(x, y, span=0.3, degree=2)
    assert np.max(np.abs(fitted - y)) < 1e-8


def test_vst_standardized_variance_matches_numpy(spark):
    """Spark vst == independent numpy recomputation of the Seurat
    definition (zero-inclusive moments, loess-expected sd, upper-clip
    at sqrt(N))."""
    import numpy as np

    from data_ingest_spark.functions.loess import loess_fit

    rng = np.random.default_rng(42)
    n_cells, n_genes = 40, 12
    dense = rng.poisson(3.0, size=(n_genes, n_cells)).astype(float)
    dense[5, :] = 0.0
    dense[5, :4] = [60.0, 55.0, 70.0, 65.0]  # overdispersed gene
    rows = [("s", f"b{c}", f"G{g:02d}", float(dense[g, c]))
            for g in range(n_genes) for c in range(n_cells)
            if dense[g, c] > 0]
    # every barcode appears (Poisson(3) never yields an all-zero cell
    # across 12 genes at this seed) -> N is the full 40
    df = spark.createDataFrame(
        rows, "sample string, barcode string, gene string, count double")
    out = {r["gene"]: r for r in nz.vst_standardized_variance(df).collect()}

    mu = dense.mean(axis=1)
    var = dense.var(axis=1, ddof=1)
    fitted = loess_fit(np.log10(mu[var > 0]), np.log10(var[var > 0]),
                       span=0.3)
    sd_exp = np.sqrt(10.0 ** fitted)
    clip = np.sqrt(n_cells)
    refs = {}
    for i, g in enumerate(np.nonzero(var > 0)[0]):
        z = np.minimum(clip, (dense[g] - mu[g]) / sd_exp[i])
        ref = (z ** 2).sum() / (n_cells - 1)
        refs[f"G{g:02d}"] = ref
        got = out[f"G{g:02d}"]
        assert abs(got["sd_exp"] - sd_exp[i]) < 1e-9
        assert abs(got["std_variance"] - ref) < 1e-9
    top = nz.find_variable_features_vst(df, 1).collect()[0]
    assert top["gene"] == max(refs, key=refs.get)


def test_join_emptydrops_prefixes_columns(spark, expr):
    cells = mx.cell_counts(expr)
    edt = spark.createDataFrame(
        [("s1", "b2", 0.001)], "sample string, barcode string, FDR double")
    out = jn.join_emptydrops(cells, edt)
    assert "emptyDrops_FDR" in out.columns
    vals = {r["barcode"]: r["emptyDrops_FDR"] for r in out.collect()}
    assert vals["b2"] == 0.001 and vals["b1"] is None  # left join, NA elsewhere


def test_group_membership_sorted_ids(spark):
    cells = spark.createDataFrame(
        [("a", 3), ("a", 1), ("b", 2)], "grp string, cells_id int")
    out = {r["grp"]: r["cell_ids"] for r in
           jn.group_membership(cells, "grp").collect()}
    assert out["a"] == [1, 3]  # sorted, deterministic
    assert out["b"] == [2]

def test_vst_quadfit_matches_numpy(spark):
    """vst_quadfit_variance == numpy recomputation with a global
    quadratic OLS smoother (centered normal equations) in place of the
    loess — same zero-inclusive standardization contract."""
    import numpy as np

    rng = np.random.default_rng(7)
    n_cells, n_genes = 30, 10
    dense = rng.poisson(2.0, size=(n_genes, n_cells)).astype(float)
    dense[3, :6] = [40.0, 35.0, 50.0, 45.0, 38.0, 42.0]
    rows = [("s", f"b{c}", f"G{g:02d}", float(dense[g, c]))
            for g in range(n_genes) for c in range(n_cells)
            if dense[g, c] > 0]
    df = spark.createDataFrame(
        rows, "sample string, barcode string, gene string, count double")
    # N in the operator is distinct observed cells; drop all-zero cells
    observed = sorted({c for g in range(n_genes) for c in range(n_cells)
                       if dense[g, c] > 0})
    dense = dense[:, observed]
    n_obs = len(observed)

    out = {r["gene"]: r for r in nz.vst_quadfit_variance(df).collect()}

    mu = dense.mean(axis=1)
    var = dense.var(axis=1, ddof=1)
    keep = var > 0
    x = np.log10(mu[keep]); y = np.log10(var[keep])
    u = x - x.mean()
    X = np.column_stack([np.ones_like(u), u, u * u])
    beta = np.linalg.solve(X.T @ X, X.T @ y)
    sd_exp = np.sqrt(10.0 ** (X @ beta))
    clip = np.sqrt(n_obs)
    for i, g in enumerate(np.nonzero(keep)[0]):
        z = np.minimum(clip, (dense[g] - mu[g]) / sd_exp[i])
        ref = (z ** 2).sum() / (n_obs - 1)
        got = out[f"G{g:02d}"]
        assert abs(got["sd_exp"] - sd_exp[i]) < 1e-8
        assert abs(got["std_variance"] - ref) < 1e-8
