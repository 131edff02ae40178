"""data_ingest_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of biomage-ltd/data-ingest.

The reference is a 6-stage single-node batch pipeline over sparse
gene×cell matrices (see SURVEY.md). Here the canonical data model is a
long/tall DataFrame ``expression(sample, barcode, gene, count)`` and
every matrix operation is a declarative DataFrame plan optimized by
Catalyst: per-cell/per-gene stats are groupBy aggregations, subsetting
is filters/semi-joins, sample merge is unionByName, and the scientific
kernels (emptyDrops, robust regression, normalization, PCA, kNN,
Louvain) are compositions of DataFrame ops + Spark ML, with
``applyInPandas`` only where genuinely iterative.
"""

__version__ = "0.1.0"

EXPR_COLS = ("sample", "barcode", "gene", "count")
