"""Hybrid-retrieval quickstart: the search side of the engine.

Reads the harness's documents/embeddings parquet and runs the
retrieval story end-to-end: BM25 lexical scoring → brute-force and
IVF cosine ANN → reciprocal-rank fusion of the two rankings →
retrieval-quality metrics (MRR/NDCG) of the approximate path against
the exact one.

    python examples/retrieval_quickstart.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import functions as F

    from data_ingest_spark.extensions.evaluation import rrf_fuse
    from data_ingest_spark.extensions.similarity import (cosine_topk,
                                                         cosine_topk_ivf,
                                                         with_cosine)
    from data_ingest_spark.extensions.text import bm25, tokens_col
    from data_ingest_spark.session import get_spark

    spark = get_spark("retrieval-quickstart")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")

    # 1. Lexical: BM25 top-10 per query term.
    terms = ["join", "hash", "filter"]
    lexical = bm25(docs.select("doc_id", "text"), terms)
    print("=== BM25 top-3 per term ===")
    lexical.filter("rank <= 3").orderBy("token", "rank").show(9, False)

    # 2. Semantic: exact and IVF ANN for a query batch.
    queries = emb.filter("vec_id % 100 = 0").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    exact = cosine_topk(emb, queries, k=5)
    approx = cosine_topk_ivf(
        emb, queries.join(
            emb.select(F.col("vec_id").alias("query_id"), "label"),
            "query_id"),
        k=5)
    print("=== exact cosine top-5 (first query) ===")
    exact.filter("query_id = 0").orderBy("rank").show(5, False)

    # 3. Hybrid: fuse a lexical ranking (term-hit count) with a
    #    semantic ranking (cosine to one anchor embedding).
    qt = F.array(*[F.lit(t) for t in terms])
    lex_scores = docs.select(
        "doc_id",
        F.size(F.filter(tokens_col("text"),
                        lambda t: F.array_contains(qt, t)))
        .cast("long").alias("lex_score"))
    anchor = emb.filter("vec_id = 0").select(
        F.col("embedding").alias("_qv"))
    sem_scores = with_cosine(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding")
        .crossJoin(F.broadcast(anchor)),
        "_qv", "embedding", out_col="sem_score").select(
        "doc_id", "sem_score")
    fused = rrf_fuse(lex_scores, sem_scores, n_candidates=50)
    print("=== RRF-fused top-10 ===")
    fused.filter("fused_rank <= 10").orderBy("fused_rank").show(10, False)

    # 4. Quality: how much recall does the IVF path give up?
    hits = (approx.select("query_id", "neighbor_id")
            .join(exact.select("query_id", "neighbor_id"),
                  ["query_id", "neighbor_id"]))
    n_q = queries.count()
    recall = hits.count() / (5.0 * n_q)
    print(f"IVF(nprobe=1, label cells) recall@5 vs exact over "
          f"{n_q} queries: {recall:.3f} — the recall/speed dial; "
          "x42_ann_recall measures the tuned LSH path")

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
