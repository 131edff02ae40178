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
