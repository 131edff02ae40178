"""LLM-data-pipeline extension operators (SURVEY.md §7 step 12).

Beyond reference parity: deduplication (exact / MinHash-LSH / SimHash /
blocked n-gram Jaccard), similarity search over embeddings (brute-force
cosine top-k, label-partitioned IVF, hyperplane LSH), text analysis
(quality scoring, language ID, token counting, fingerprinting), and
multimodal binary-column plumbing. All deterministic and — except the
Pandas-UDF multimodal path — DuckDB-oracle-checkable.
"""
