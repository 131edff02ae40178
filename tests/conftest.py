import pytest

from data_ingest_spark.session import get_spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=4)
    yield s


@pytest.fixture(scope="session")
def expr(spark):
    """Tiny in-memory long expression table: 2 samples, 4 barcodes,
    3 genes (one mitochondrial)."""
    rows = [
        # sample, barcode, gene, count
        ("s1", "b1", "ENSG1", 5), ("s1", "b1", "ENSG2", 3), ("s1", "b1", "MT-1", 2),
        ("s1", "b2", "ENSG1", 50), ("s1", "b2", "ENSG2", 30), ("s1", "b2", "MT-1", 20),
        ("s1", "b3", "ENSG1", 1),
        ("s2", "b4", "ENSG2", 8), ("s2", "b4", "MT-1", 2),
    ]
    return spark.createDataFrame(rows, "sample string, barcode string, gene string, count int")


@pytest.fixture(scope="session")
def sf_expr(spark):
    from data_ingest_spark.harness import registry
    return registry.expr_df(spark, SF)
