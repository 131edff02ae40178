"""Unit tests for metric aggregations and QC filters on tiny frames.

Expected values hand-computed from the conftest fixture; semantics per
the reference citations in each operator's docstring.
"""

import pyspark.sql.functions as F

from data_ingest_spark.operators import filters as fl, metrics as mx


def as_map(df, key, val):
    return {r[key]: r[val] for r in df.collect()}


def test_cell_counts(expr):
    out = mx.cell_counts(expr)
    m = {(r["sample"], r["barcode"]): (r["nCount_RNA"], r["nFeature_RNA"])
         for r in out.collect()}
    assert m[("s1", "b1")] == (10, 3)
    assert m[("s1", "b2")] == (100, 3)
    assert m[("s1", "b3")] == (1, 1)
    assert m[("s2", "b4")] == (10, 2)


def test_gene_stats(expr):
    m = {r["gene"]: (r["total_umi"], r["n_cells"])
         for r in mx.gene_stats(expr).collect()}
    assert m["ENSG1"] == (56, 3)
    assert m["MT-1"] == (24, 3)


def test_percent_mt_range_and_value(expr, spark):
    mt = spark.createDataFrame([("MT-1",)], "gene string")
    out = mx.percent_mt(expr, mt)
    m = {(r["sample"], r["barcode"]): r["percent_mt"] for r in out.collect()}
    assert abs(m[("s1", "b1")] - 20.0) < 1e-9
    assert m[("s1", "b3")] == 0.0
    # test_object.r:31-36 invariant: percent, not fraction, in [0, 100]
    assert all(0.0 <= v <= 100.0 for v in m.values())
    f = {(r["sample"], r["barcode"]): r["fraction_mt"] for r in out.collect()}
    assert abs(f[("s1", "b1")] - 0.2) < 1e-9


def test_ambient_census(expr):
    m = {r["sample"]: r["n_ambient"]
         for r in mx.ambient_census(expr, lower=100.0).collect()}
    assert m == {"s1": 2, "s2": 1}  # b2 has total 100, not < 100


def test_filter_min_cell_size(expr):
    cells = mx.cell_counts(expr)
    kept = fl.filter_min_cell_size(cells, 10.0)
    assert {r["barcode"] for r in kept.collect()} == {"b1", "b2", "b4"}


def test_filter_min_features(expr):
    kept = fl.filter_min_features(expr, 2)
    assert {r["barcode"] for r in kept.select("barcode").distinct().collect()} \
        == {"b1", "b2", "b4"}


def test_prune_genes_and_cells(expr):
    # genes in >= 3 cells: ENSG1 (b1,b2,b3), MT-1 (b1,b2,b4), ENSG2 (b1,b2,b4)
    out = fl.prune_genes_and_cells(expr, min_cells=3, min_features=2)
    kept_barcodes = {r["barcode"] for r in out.select("barcode").distinct().collect()}
    assert "b3" not in kept_barcodes  # only 1 gene after prune


def test_filter_classifier_fdr_null_semantics(spark):
    # R subset(x <= t) drops NA rows; Spark filter does too (SURVEY §1.3)
    cells = spark.createDataFrame(
        [("b1", 0.001), ("b2", 0.5), ("b3", None)],
        "barcode string, emptyDrops_FDR double")
    kept = fl.filter_classifier_fdr(cells, 0.01, "emptyDrops_FDR")
    assert [r["barcode"] for r in kept.collect()] == ["b1"]


def test_mt_gene_predicate_case_insensitive(spark):
    genes = spark.createDataFrame(
        [("g1", "MT-CO1"), ("g2", "mt-nd1"), ("g3", "ACTB")],
        "gene string, name string")
    out = fl.mt_gene_predicate(genes, "^MT-")
    assert {r["gene"] for r in out.collect()} == {"g1", "g2"}


def test_remove_outliers_anti_join(expr, spark):
    cells = mx.cell_counts(expr)
    outliers = spark.createDataFrame([("s1", "b2")], "sample string, barcode string")
    kept = fl.remove_outliers(cells, outliers)
    assert ("b2" not in {r["barcode"] for r in kept.collect()})


def test_histogram(spark):
    df = spark.createDataFrame([(v,) for v in [5.0, 15.0, 17.0, 25.0]], "x double")
    m = {r["bin"]: r["n"] for r in mx.histogram(df, "x", 10.0).collect()}
    assert m == {0: 1, 1: 2, 2: 1}
